"""Batched multi-antenna OFDM transmit chain.

Replaces the reference's per-antenna Python loop over deep-copied
``Transceiver`` objects (``reference/antenna_array.py:110-140`` calling
``reference/transceiver.py:98-174``) with one fused pipeline over an
``[n_ant, n_fft]`` stack:

    bits -> QAM symbols [n_sc]
         -> precode:   per-antenna symbols = V o s        (SU)
                       or sum_u V[:,u,:] o s_u            (MU summed)
         -> embed subcarriers -> batched ortho IFFT [n_ant, n_fft]
         -> per-antenna PA nonlinearity (time domain)
         -> batched ortho FFT  -> frequency-domain output

In frequency-domain output mode the CP add+strip is skipped (identity; see
``mimo_ofdm_tpu.ops.ofdm``). All functions broadcast over leading batch
dims and are jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from mimo_ofdm_tpu.ops import mxu_fft, ofdm, pa, qam


def modulate_users(bits: Array, constel_size: int, dtype=jnp.complex64) -> Array:
    """bits ``[..., n_bits]`` (SU) or ``[..., n_usr, n_bits]`` (MU) ->
    symbols ``[..., n_sc]`` / ``[..., n_usr, n_sc]``
    (``reference/modulation.py:346-367``)."""
    return qam.modulate_bits(bits, constel_size, dtype)


def precode_symbols(symbols: Array, v: Array, sum_users: bool = True) -> Array:
    """Apply the frequency-domain precoder.

    SU:  ``symbols [..., n_sc]``, ``v [n_ant, n_sc]`` -> ``[..., n_ant, n_sc]``.
    MU:  ``symbols [..., n_usr, n_sc]``, ``v [n_ant, n_usr, n_sc]`` ->
    summed ``[..., n_ant, n_sc]`` (``reference/modulation.py:373``) or
    per-user ``[..., n_usr, n_ant, n_sc]`` when ``sum_users=False``
    (``reference/modulation.py:376-382``).
    """
    if v.ndim == 2:  # single user
        return symbols[..., None, :] * v
    vt = jnp.swapaxes(v, 0, 1)                     # [n_usr, n_ant, n_sc]
    per_usr = symbols[..., :, None, :] * vt        # [..., n_usr, n_ant, n_sc]
    if sum_users:
        return jnp.sum(per_usr, axis=-3)           # [..., n_ant, n_sc]
    return per_usr


def pa_transfer(td_sig: Array, pa_model: str, sat_power: Array | float,
                rapp_p: float = 1.1, toi_coeff: Array | float = 0.0) -> Array:
    """Apply the per-antenna PA in time domain. ``sat_power`` may be a
    scalar or ``[n_ant]`` (broadcast against the last/sample axis)."""
    sat = jnp.asarray(sat_power)
    if sat.ndim == 1:
        sat = sat[:, None]
    coeff = jnp.asarray(toi_coeff)
    if coeff.ndim == 1:
        coeff = coeff[:, None]
    return pa.apply_pa(td_sig, pa_model, sat, rapp_p, coeff)


def make_pa_fn(pa_model: str, sat_power: Array | float, rapp_p: float = 1.1,
               toi_coeff: Array | float = 0.0, sample_ndim: int = 1):
    """Closure applying the per-antenna PA to time samples whose trailing
    ``sample_ndim`` axes are the (possibly split) sample axis — used by the
    MXU-matmul fused transform path, where samples arrive as ``[.., R, R]``
    digit-swapped blocks (memoryless PA => ordering irrelevant,
    ``reference/distortion.py:9,102,202``)."""
    def expand(v):
        v = jnp.asarray(v)
        if v.ndim == 1:   # per-antenna [n_ant] -> broadcast over sample axes
            return v.reshape(v.shape[0], *([1] * sample_ndim))
        return v

    sat = expand(sat_power)
    coeff = expand(toi_coeff)

    def pa_fn(td_sig: Array) -> Array:
        return pa.apply_pa(td_sig, pa_model, sat, rapp_p, coeff)

    return pa_fn


def ifft_pa_fft(fd_clean: Array, pa_model: str, sat_power: Array | float,
                rapp_p: float = 1.1, toi_coeff: Array | float = 0.0,
                use_mxu_fft: bool = False,
                mxu_storage: str = "float32") -> Array:
    """The distorted-TX core: ortho IFFT -> per-antenna PA -> ortho FFT.

    With ``use_mxu_fft`` (and a square ``n_fft``) both transforms run as
    planar MXU matmuls with the PA fused on the digit-swapped intermediate
    (:mod:`mimo_ofdm_tpu.ops.mxu_fft`); otherwise the stock ``jnp.fft``
    path is used. Both orderings are exactly equivalent observables.
    ``mxu_storage="bfloat16"`` trades ~-40 dB quantization error for half
    the HBM traffic (see ``mxu_fft.fused_ifft_pa_fft_planar``)."""
    if use_mxu_fft and mxu_fft.square_radix(fd_clean.shape[-1]):
        def expand(v):
            v = jnp.asarray(v)
            return v.reshape(v.shape[0], 1, 1) if v.ndim == 1 else v

        sat = expand(sat_power)
        coeff = expand(toi_coeff)

        def pa_planar(pr, pi):
            return pa.apply_pa_planar(pr, pi, pa_model, sat, rapp_p, coeff)

        return mxu_fft.fused_ifft_pa_fft_planar(fd_clean, pa_planar,
                                                storage=mxu_storage)
    td = ofdm.fd_to_td(fd_clean)
    td_dist = pa_transfer(td, pa_model, sat_power, rapp_p, toi_coeff)
    return ofdm.td_to_fd(td_dist)


def ifft_pa_fft_sc(per_ant_sc: Array, n_fft: int, pa_model: str,
                   sat_power: Array | float, rapp_p: float = 1.1,
                   toi_coeff: Array | float = 0.0, use_mxu_fft: bool = False,
                   mxu_storage: str = "float32") -> Array:
    """Subcarrier-domain distorted-TX core:
    ``extract_sc(FFT(PA(IFFT(map_sc(x)))))`` for ``[..., n_sc]`` data bins.

    On the MXU path the guard band is pruned out of the transform matmuls
    entirely (:func:`mimo_ofdm_tpu.ops.mxu_fft.fused_sc_ifft_pa_fft_planar`)
    — the ``[..., n_fft]`` frames on either side of the chain are never
    materialized. Exactly equivalent to the full-band composition the
    reference computes (``reference/antenna_array.py:110-140`` then strip,
    ``reference/corrector.py:66``)."""
    n_sc = per_ant_sc.shape[-1]
    if use_mxu_fft and mxu_fft.sc_prune_eligible(n_fft, n_sc):
        def expand(val):
            val = jnp.asarray(val)
            return val.reshape(val.shape[0], 1, 1) if val.ndim == 1 else val

        sat = expand(sat_power)
        coeff = expand(toi_coeff)

        def pa_planar(pr, pi):
            return pa.apply_pa_planar(pr, pi, pa_model, sat, rapp_p, coeff)

        return mxu_fft.fused_sc_ifft_pa_fft_planar(per_ant_sc, pa_planar,
                                                   n_fft, storage=mxu_storage)
    fd_clean = ofdm.map_subcarriers(per_ant_sc, n_fft)
    fd_dist = ifft_pa_fft(fd_clean, pa_model, sat_power, rapp_p, toi_coeff,
                          use_mxu_fft=use_mxu_fft, mxu_storage=mxu_storage)
    return ofdm.extract_subcarriers(fd_dist, n_sc)


def array_transmit_fd(bits: Array, *, constel_size: int, n_fft: int, v: Array,
                      pa_model: str = "softlim", sat_power: Array | float = 1.0,
                      rapp_p: float = 1.1, toi_coeff: Array | float = 0.0,
                      skip_dist: bool = False, return_clean: bool = False,
                      sum_users: bool = True, use_mxu_fft: bool = False,
                      mxu_storage: str = "float32", dtype=jnp.complex64):
    """Full array transmit to frequency domain
    (``AntennaArray.transmit(out_domain_fd=True)``,
    ``reference/antenna_array.py:58-140``).

    Returns ``[.., n_ant, n_fft]`` distorted FD signal (or
    ``(distorted, clean)`` when ``return_clean``;
    clean only when ``skip_dist``). With ``sum_users=False`` the user axis
    is kept: ``[.., n_usr, n_ant, n_fft]``.
    """
    symbols = modulate_users(bits, constel_size, dtype)
    per_ant_sc = precode_symbols(symbols, v, sum_users=sum_users)
    fd_clean = ofdm.map_subcarriers(per_ant_sc, n_fft)
    if skip_dist:
        return fd_clean
    fd_dist = ifft_pa_fft(fd_clean, pa_model, sat_power, rapp_p, toi_coeff,
                          use_mxu_fft=use_mxu_fft, mxu_storage=mxu_storage)
    if return_clean:
        return fd_dist, fd_clean
    return fd_dist


def array_transmit_sc(bits: Array, *, constel_size: int, n_fft: int, v: Array,
                      pa_model: str = "softlim", sat_power: Array | float = 1.0,
                      rapp_p: float = 1.1, toi_coeff: Array | float = 0.0,
                      sum_users: bool = True, use_mxu_fft: bool = False,
                      mxu_storage: str = "float32", dtype=jnp.complex64) -> Array:
    """Array transmit straight to the ``[.., n_ant, n_sc]`` data bins —
    ``extract_subcarriers(array_transmit_fd(...))`` with the guard band
    pruned out of the MXU transforms (:func:`ifft_pa_fft_sc`). This is the
    fast path for every link driver: the receivers only ever observe the
    data bins (``reference/corrector.py:66``, ``reference/mp_model.py:299``)."""
    symbols = modulate_users(bits, constel_size, dtype)
    per_ant_sc = precode_symbols(symbols, v, sum_users=sum_users)
    return ifft_pa_fft_sc(per_ant_sc, n_fft, pa_model, sat_power, rapp_p,
                          toi_coeff, use_mxu_fft=use_mxu_fft,
                          mxu_storage=mxu_storage)


def array_transmit_td(bits: Array, *, constel_size: int, n_fft: int, cp_len: int,
                      v: Array, pa_model: str = "softlim",
                      sat_power: Array | float = 1.0, rapp_p: float = 1.1,
                      toi_coeff: Array | float = 0.0, skip_dist: bool = False,
                      sum_users: bool = True, dtype=jnp.complex64) -> Array:
    """Time-domain output variant with cyclic prefix
    (``out_domain_fd=False`` path, ``reference/transceiver.py:123-129,167-174``)."""
    symbols = modulate_users(bits, constel_size, dtype)
    per_ant_sc = precode_symbols(symbols, v, sum_users=sum_users)
    td = ofdm.fd_to_td(ofdm.map_subcarriers(per_ant_sc, n_fft))
    if not skip_dist:
        td = pa_transfer(td, pa_model, sat_power, rapp_p, toi_coeff)
    return ofdm.add_cyclic_prefix(td, cp_len)
