"""Receiver AGC / equalization vectors and noise scalers.

Implements the interlocking constant-IBO bookkeeping of
``reference/mp_model.py:290-329`` (and the per-receiver copies in
``reference/corrector.py:138-163,372-403``):

* ``hk_vk``      = per-antenna ``H o V`` on the data subcarriers
* ``hk_vk_agc``  = sum over antennas (the effective SISO channel for the
  clean signal)
* ``ak_hk_vk_agc`` = same with per-antenna Bussgang gain ``a_k`` applied
  (the effective channel for the *distorted* signal's linear part)
* ``*_noise_scaler`` = mean |.|^2 over subcarriers, used to set the AWGN
  power so that the post-AGC SNR equals the requested SNR
  (``reference/mp_model.py:163,212``)
* ``*_nfft``     = the n_sc-length vector embedded into the n_fft grid
  with ONES in the unused bins (``reference/mp_model.py:307-309,324-326``)
  so out-of-band noise passes through the divide unscaled.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from mimo_ofdm_tpu.ops.ofdm import map_subcarriers
from mimo_ofdm_tpu.models.precoding import (per_antenna_alpha,
                                            precoding_power_per_antenna)


class AgcState(NamedTuple):
    """All equalizer vectors needed by the link simulation."""
    hk_vk_agc_nfft: Array        # [n_fft] clean-signal equalizer
    hk_vk_noise_scaler: Array    # scalar
    ak_hk_vk_agc_nfft: Array     # [n_fft] distorted-signal equalizer
    ak_hk_vk_noise_scaler: Array  # scalar
    ak_vect: Array               # [n_ant] per-antenna Bussgang gains


class AgcStateSc(NamedTuple):
    """Subcarrier-domain AGC state — the performance path.

    The receive chain only ever observes the data subcarriers (the
    reference's CNC/standard receivers immediately strip out-of-band bins,
    ``reference/corrector.py:66``), so the equalizers need not be embedded
    into the n_fft grid at all; the unused bins' divide-by-one
    (``reference/mp_model.py:307``) is an identity on discarded values.
    """
    hk_vk_agc_sc: Array          # [n_sc] clean-signal equalizer
    hk_vk_noise_scaler: Array    # scalar
    ak_hk_vk_agc_sc: Array       # [n_sc] distorted-signal equalizer
    ak_hk_vk_noise_scaler: Array  # scalar
    ak_vect: Array               # [n_ant] per-antenna Bussgang gains


def compute_agc(h_sc: Array, v: Array, ibo_db: float, n_ant: int, n_fft: int,
                usr_idx: int | None = None,
                ant_axis_name: str | None = None) -> AgcState:
    """Compute AGC state from the data-subcarrier channel ``h_sc``
    ``[n_ant, n_sc]`` (for MU: the *served user's* channel) and precoder
    ``v`` (``[n_ant, n_sc]`` SU or ``[n_ant, n_usr, n_sc]`` MU).

    Mirrors ``Link.recalculate_agc`` (``reference/mp_model.py:290-329``);
    for MU the ``H o V`` product uses the user's precoder slice
    ``v[:, usr_idx, :]`` while the per-antenna power (hence IBO/alpha)
    sums over all users (``reference/corrector.py:379-384``).
    """
    n_sc = h_sc.shape[-1]
    if v.ndim == 3:
        if usr_idx is None:
            raise ValueError("usr_idx required for multi-user precoder")
        v_usr = v[:, usr_idx, :]
    else:
        v_usr = v

    def ant_sum(x):
        s = jnp.sum(x, axis=0)
        if ant_axis_name is not None:
            s = jax.lax.psum(s, ant_axis_name)
        return s

    vk_pow_vec = precoding_power_per_antenna(v)               # [n_ant(_local)]
    hk_vk = h_sc * v_usr                                      # [n_ant, n_sc]
    hk_vk_avg = ant_sum(hk_vk)                                # [n_sc]
    hk_vk_noise_scaler = jnp.mean(jnp.abs(hk_vk_avg) ** 2)

    # per-antenna alpha uses the *global* antenna count but only the local
    # precoder power (reference/mp_model.py:315-317)
    ak_vect = per_antenna_alpha(ibo_db, vk_pow_vec, n_sc, n_ant)
    ak_hk_vk_avg = ant_sum(ak_vect[:, None].astype(hk_vk.dtype) * hk_vk)
    ak_hk_vk_noise_scaler = jnp.mean(jnp.abs(ak_hk_vk_avg) ** 2)

    return AgcState(
        hk_vk_agc_nfft=_embed_ones(hk_vk_avg, n_fft),
        hk_vk_noise_scaler=hk_vk_noise_scaler,
        ak_hk_vk_agc_nfft=_embed_ones(ak_hk_vk_avg, n_fft),
        ak_hk_vk_noise_scaler=ak_hk_vk_noise_scaler,
        ak_vect=ak_vect,
    )


def _embed_ones(vec_sc: Array, n_fft: int) -> Array:
    """Embed an n_sc vector into the n_fft grid with ones elsewhere
    (``reference/mp_model.py:307-309``)."""
    return map_subcarriers(vec_sc, n_fft, fill_value=1.0)


def compute_agc_sc(h_sc: Array, v: Array, ibo_db: float, n_ant: int,
                   usr_idx: int | None = None,
                   ant_axis_name: str | None = None,
                   alpha_override: float | None = None) -> AgcStateSc:
    """Subcarrier-domain variant of :func:`compute_agc` (no n_fft embed);
    numerically identical on the observed data bins.

    ``alpha_override`` replaces the per-antenna Bussgang closed form with a
    caller-supplied constant — the reference's path for PA models without
    an analytic alpha (TOI: ``reference/corrector.py:146-147``,
    ``reference/antenna_array.py:353-355``)."""
    n_sc = h_sc.shape[-1]
    if v.ndim == 3:
        if usr_idx is None:
            raise ValueError("usr_idx required for multi-user precoder")
        v_usr = v[:, usr_idx, :]
    else:
        v_usr = v

    def ant_sum(x):
        s = jnp.sum(x, axis=0)
        if ant_axis_name is not None:
            s = jax.lax.psum(s, ant_axis_name)
        return s

    vk_pow_vec = precoding_power_per_antenna(v)
    hk_vk = h_sc * v_usr
    hk_vk_avg = ant_sum(hk_vk)
    if alpha_override is None:
        ak_vect = per_antenna_alpha(ibo_db, vk_pow_vec, n_sc, n_ant)
    else:
        ak_vect = jnp.full(vk_pow_vec.shape, alpha_override)
    ak_hk_vk_avg = ant_sum(ak_vect[:, None].astype(hk_vk.dtype) * hk_vk)
    return AgcStateSc(
        hk_vk_agc_sc=hk_vk_avg,
        hk_vk_noise_scaler=jnp.mean(jnp.abs(hk_vk_avg) ** 2),
        ak_hk_vk_agc_sc=ak_hk_vk_avg,
        ak_hk_vk_noise_scaler=jnp.mean(jnp.abs(ak_hk_vk_avg) ** 2),
        ak_vect=ak_vect,
    )
