"""mimo_ofdm_tpu — TPU-native massive-MIMO OFDM nonlinear-PA link simulator.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``MarcinWachowiak/m-mimo-ofdm-with-nonlinear-pa-sim`` (mounted read-only at
``/root/reference``; cited throughout as ``reference/<file>:<line>``).

Design stance (vs the reference's object-per-antenna NumPy code):

* All numerics are **pure jittable functions over stacked arrays** —
  signals ``[batch, n_ant, n_fft]`` complex64, channels ``[n_ant, n_fft]``,
  precoders ``[n_ant, (n_usr,) n_sc]`` — instead of Python loops over
  deep-copied per-antenna objects (``reference/antenna_array.py:110-140``).
* FFTs are batched ``jnp.fft`` calls (MXU/VPU friendly), replacing
  per-symbol torch round trips (``reference/modulation.py:269-290``).
* Monte-Carlo trials are a ``vmap`` batch axis, shardable over a
  ``jax.sharding.Mesh``; BER counters reduce with ``psum`` instead of
  ``multiprocessing.Array`` (``reference/mp_model.py:89-222``).
* Randomness uses ``jax.random`` keys folded per role (bits/noise/
  fade/location/CSI), mirroring the reference's four RNG streams
  (``reference/mp_model.py:74-77``).

Layers (mirrors SURVEY.md section 1):

* :mod:`mimo_ofdm_tpu.ops` — L0/L1 numeric kernels: bits, QAM, OFDM, PA
  nonlinearities, AWGN, metrics.
* :mod:`mimo_ofdm_tpu.models` — L2/L3 system composition: geometry,
  channels, precoding, AGC, TX chain, CNC/MCNC receivers, link model.
* :mod:`mimo_ofdm_tpu.parallel` — L4 sharded Monte-Carlo driver and
  sweep runner.
* :mod:`mimo_ofdm_tpu.utils` — L6 config presets, CSV result I/O
  (reference-compatible schema), plotting style.
* :mod:`mimo_ofdm_tpu.experiments` — L5 experiment entry points.
* :mod:`mimo_ofdm_tpu.kernels` — Pallas TPU kernels for hot fused ops.
"""

__version__ = "0.1.0"

from mimo_ofdm_tpu.utils import config  # noqa: F401
