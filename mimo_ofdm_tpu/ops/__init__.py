"""Numeric kernel layer (L0/L1): bits, QAM, OFDM, PA models, noise, metrics."""

from mimo_ofdm_tpu.ops import bits, metrics, noise, ofdm, pa, qam  # noqa: F401
