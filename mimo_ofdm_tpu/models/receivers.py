"""CNC / MCNC clipping-noise-cancellation receivers as scanned loops.

Re-designs ``reference/corrector.py`` as a single generic iteration loop
(``lax.scan``) parameterized by a *replica function* — the model of the TX
chain whose output, minus the detected symbols, is the distortion estimate:

* CNC  (``CncReceiver.receive``,   ``reference/corrector.py:52-112``):
  replica = upsampled IFFT -> clip -> FFT -> / alpha  (single nominal PA).
* MCNC (``McncReceiver.receive``,  ``reference/corrector.py:165-207``):
  replica = full K-antenna precoded TX + channel + AGC divide.
* CNC-MU / MCNC-MU (``reference/corrector.py:248-489``): two-user variants
  where the other user's symbols/bits are known side information.

All loops run a *fixed* ``n_iters`` (the reference iterates to
``max(n_iters_lst)`` and taps intermediate results,
``reference/corrector.py:71,80``); here every iteration's hard bits are
stacked into ``[n_iters+1, ..., n_bits]`` and the caller gathers the taps
it needs. Detection inside the loop uses the O(1) Gray-snake quantizer
(see ``mimo_ofdm_tpu.ops.qam``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import Array

from mimo_ofdm_tpu.ops import ofdm, pa, qam
from mimo_ofdm_tpu.models import channels, transmit


def equalize(rx_fd: Array, agc_nfft: Array) -> Array:
    """Divide the received FD frame by the AGC vector
    (``reference/mp_model.py:165,214``)."""
    return rx_fd / agc_nfft


def standard_receive(rx_fd: Array, n_sc: int, constel_size: int,
                     alpha: Array | float = 1.0) -> Array:
    """Plain OFDM demodulation to hard bits. Equivalent to the reference's
    clean-run path (AGC divide -> to_time_domain -> +CP -> demodulate,
    ``reference/mp_model.py:165-169``; the CP round trip is an identity so
    the FD frame is demapped directly)."""
    sc = ofdm.extract_subcarriers(rx_fd, n_sc)
    return qam.demodulate_bits(sc, constel_size, alpha)


def standard_receive_sc(rx_sc: Array, constel_size: int,
                        alpha: Array | float = 1.0) -> Array:
    """Subcarrier-domain standard receive (data bins already extracted)."""
    return qam.demodulate_bits(rx_sc, constel_size, alpha)


def cnc_iterate(rx_sc: Array, n_iters: int, constel_size: int,
                replica_fn: Callable[[Array], Array],
                detect_alpha: Array | float = 1.0) -> tuple[Array, Array]:
    """Generic clipping-noise-cancellation loop.

    ``rx_sc``: AGC-equalized data subcarriers ``[..., n_sc]``.
    Runs ``n_iters + 1`` detection passes (pass 0 = no cancellation,
    matching ``iter_idx == 0`` skipping the subtraction,
    ``reference/corrector.py:72-76``). Returns
    ``(bits [n_iters+1, ..., n_bits], symbols [n_iters+1, ..., n_sc])``.
    Use :func:`cnc_iterate_soft` when the per-iteration *corrected signal*
    (pre-detection) is needed, e.g. for soft demodulation into an LDPC
    decoder (the reference's ``return_bits=False`` path,
    ``reference/corrector.py:83-84``).
    """
    d0 = jnp.zeros_like(rx_sc)

    def body(d_est, _):
        corr = rx_sc - d_est
        det_sym, det_bits = qam.detect_symbols_and_bits(corr, constel_size,
                                                        detect_alpha,
                                                        dtype=rx_sc.dtype)
        est = replica_fn(det_sym)
        return est - det_sym, (det_bits, det_sym)

    _, (bits_all, sym_all) = jax.lax.scan(body, d0, None, length=n_iters + 1)
    return bits_all, sym_all


def cnc_iterate_soft(rx_sc: Array, n_iters: int, constel_size: int,
                     replica_fn: Callable[[Array], Array],
                     detect_alpha: Array | float = 1.0) -> Array:
    """CNC loop returning the per-iteration *corrected* (distortion-
    subtracted, pre-detection) signal ``[n_iters+1, ..., n_sc]`` —
    the symbols fed to the soft demapper + LDPC decoder in the coded link
    (``reference/corrector.py:83-84`` with ``return_bits=False``,
    ``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:232-239``)."""
    d0 = jnp.zeros_like(rx_sc)

    def body(d_est, _):
        corr = rx_sc - d_est
        det_sym, _ = qam.detect_symbols_and_bits(corr, constel_size,
                                                 detect_alpha,
                                                 dtype=rx_sc.dtype)
        est = replica_fn(det_sym)
        return est - det_sym, corr

    _, corr_all = jax.lax.scan(body, d0, None, length=n_iters + 1)
    return corr_all


def make_cnc_replica(constel_size: int, n_fft: int, n_sc: int, ibo_db: float,
                     pa_model: str = "softlim", alpha: Array | float | None = None,
                     rapp_p: float = 1.1, toi_db: float | None = None,
                     use_mxu_fft: bool = False, mxu_storage: str = "float32"):
    """Replica of a single nominal PA at the receiver
    (``reference/corrector.py:87-110``): the CNC impairment's average
    sample power is ``avg_symbol_power / upsample_factor``
    (``reference/corrector.py:34-35``) and the result is divided by the
    analytic Bussgang alpha (``reference/corrector.py:104-107``)."""
    avg_sym_pow = qam.avg_symbol_power(constel_size)
    upsample = n_fft / n_sc
    avg_samp_pow = avg_sym_pow / upsample
    if pa_model == "toi":
        coeff = pa.toi_to_cubic_coeff(toi_db if toi_db is not None else ibo_db,
                                      avg_samp_pow)
        sat = 1.0
        a = 1.0 if alpha is None else alpha
    else:
        coeff = 0.0
        sat = pa.ibo_to_sat_power(ibo_db, avg_samp_pow)
        a = pa.bussgang_alpha(ibo_db) if alpha is None else alpha

    def replica(det_sym: Array) -> Array:
        est = transmit.ifft_pa_fft_sc(det_sym, n_fft, pa_model, sat, rapp_p,
                                      coeff, use_mxu_fft=use_mxu_fft,
                                      mxu_storage=mxu_storage)
        return est / jnp.asarray(a).astype(est.dtype)

    return replica


def make_mcnc_replica(h_sc: Array, v: Array, agc_corr_sc: Array, *,
                      constel_size: int, n_fft: int, n_sc: int,
                      pa_model: str = "softlim", sat_power: Array | float,
                      rapp_p: float = 1.1, toi_coeff: Array | float = 0.0,
                      ant_axis_name: str | None = None,
                      use_mxu_fft: bool = False, mxu_storage: str = "float32"):
    """Replica of the full TX array + channel + AGC
    (``reference/corrector.py:198-205``): detected symbols are re-precoded,
    re-clipped per antenna, propagated through the channel and divided by
    the ``sum_k a_k H_k V_k`` AGC vector.

    Works in the subcarrier domain: the reference propagates the full-band
    frame and immediately strips out-of-band bins
    (``reference/corrector.py:199-203``), so multiplying the extracted
    data bins by ``h_sc`` is identical and halves the propagate work. The
    redundant symbols->bits->symbols round trip
    (``reference/corrector.py:191-198``) is also skipped.
    ``h_sc``: ``[n_ant, n_sc]``; ``agc_corr_sc``: ``[n_sc]``."""
    def replica(det_sym: Array) -> Array:
        per_ant_sc = transmit.precode_symbols(det_sym, v)
        fd_dist_sc = transmit.ifft_pa_fft_sc(per_ant_sc, n_fft, pa_model,
                                             sat_power, rapp_p, toi_coeff,
                                             use_mxu_fft=use_mxu_fft,
                                             mxu_storage=mxu_storage)
        rx = channels.propagate(h_sc, fd_dist_sc, ant_axis_name=ant_axis_name)
        return rx / agc_corr_sc

    return replica


def make_cnc_mu_replica(other_usr_symbols: Array, *, constel_size: int,
                        n_fft: int, n_sc: int, ibo_db: float,
                        pa_model: str = "softlim", alpha: Array | float | None = None,
                        rapp_p: float = 1.1, use_mxu_fft: bool = False,
                        mxu_storage: str = "float32"):
    """Two-user CNC replica with known other-user symbols
    (``CncMuReceiver.receive``, ``reference/corrector.py:288-345``):
    equal-power combine ``sqrt(2)/2 (own + other)`` before the clip."""
    base = make_cnc_replica(constel_size, n_fft, n_sc, ibo_db, pa_model,
                            alpha, rapp_p, use_mxu_fft=use_mxu_fft,
                            mxu_storage=mxu_storage)
    w = jnp.sqrt(2.0) / 2.0

    def replica(det_sym: Array) -> Array:
        combined = w * det_sym + w * other_usr_symbols
        return base(combined)

    return replica


def make_mcnc_mu_replica(other_usr_symbols: Array, usr_idx: int, h_sc: Array,
                         v: Array, agc_corr_sc: Array, *, constel_size: int,
                         n_fft: int, n_sc: int, pa_model: str = "softlim",
                         sat_power: Array | float, rapp_p: float = 1.1,
                         use_mxu_fft: bool = False,
                         mxu_storage: str = "float32",
                         ant_axis_name: str | None = None):
    """Two-user MCNC replica (``McncMuReceiver.receive``,
    ``reference/corrector.py:405-451``): the replica transmit stacks the
    detected own-user symbols with the known other-user symbols in original
    user order and runs the full MU precoded TX + channel + own-user AGC.
    Subcarrier-domain channel/AGC (see :func:`make_mcnc_replica`)."""
    def replica(det_sym: Array) -> Array:
        if usr_idx == 0:
            sym_mu = jnp.stack([det_sym, other_usr_symbols], axis=-2)
        else:
            sym_mu = jnp.stack([other_usr_symbols, det_sym], axis=-2)
        per_ant_sc = transmit.precode_symbols(sym_mu, v, sum_users=True)
        fd_dist_sc = transmit.ifft_pa_fft_sc(per_ant_sc, n_fft, pa_model,
                                             sat_power, rapp_p,
                                             use_mxu_fft=use_mxu_fft,
                                             mxu_storage=mxu_storage)
        rx = channels.propagate(h_sc, fd_dist_sc, ant_axis_name=ant_axis_name)
        return rx / agc_corr_sc

    return replica


def cnc_receive(rx_fd: Array, n_iters: int, *, constel_size: int, n_sc: int,
                ibo_db: float, pa_model: str = "softlim",
                alpha: Array | float | None = None) -> Array:
    """End-to-end CNC receive: extract data SCs and iterate. Returns hard
    bits ``[n_iters+1, ..., n_bits]`` (``reference/corrector.py:52-112``)."""
    n_fft = rx_fd.shape[-1]
    rx_sc = ofdm.extract_subcarriers(rx_fd, n_sc)
    replica = make_cnc_replica(constel_size, n_fft, n_sc, ibo_db, pa_model, alpha)
    bits_all, _ = cnc_iterate(rx_sc, n_iters, constel_size, replica)
    return bits_all


def mcnc_receive(rx_fd: Array, n_iters: int, h_fd: Array, v: Array,
                 agc_corr_nfft: Array, *, constel_size: int, n_sc: int,
                 pa_model: str = "softlim", sat_power: Array | float) -> Array:
    """End-to-end MCNC receive from a full-band frame
    (``reference/corrector.py:165-207``)."""
    n_fft = rx_fd.shape[-1]
    rx_sc = ofdm.extract_subcarriers(rx_fd, n_sc)
    h_sc = ofdm.extract_subcarriers(h_fd, n_sc)
    agc_sc = ofdm.extract_subcarriers(agc_corr_nfft, n_sc)
    replica = make_mcnc_replica(h_sc, v, agc_sc, constel_size=constel_size,
                                n_fft=n_fft, n_sc=n_sc, pa_model=pa_model,
                                sat_power=sat_power)
    bits_all, _ = cnc_iterate(rx_sc, n_iters, constel_size, replica)
    return bits_all
