"""MRT / phase-only / ZF precoders and constant-IBO power recalibration.

Replaces ``AntennaArray.set_precoding_matrix`` / ``update_distortion``
(``reference/antenna_array.py:142-382``) with pure batched functions. The
per-subcarrier ZF inverse loop over 2048 subcarriers
(``reference/antenna_array.py:236-257``) becomes a single batched
``pinv``-based solve (the pinv also covers the reference's singular-matrix
fallback at :246-251).

Conventions:

* single-user precoder:  ``V [n_ant, n_sc]``
* multi-user precoder:   ``V [n_ant, n_usr, n_sc]`` (matches the
  per-transceiver slice layout ``vk_mat[:, usr_idx, :]`` used in
  ``reference/corrector.py:384``)
* channels enter as data-subcarrier matrices ``H_sc [n_ant, n_sc]``
  (single user) or ``[n_usr, n_ant, n_sc]`` (multi-user), i.e. after
  ``extract_subcarriers``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from mimo_ofdm_tpu.ops.pa import bussgang_alpha


def _ant_sum(x: Array, axis, ant_axis_name: str | None):
    """Sum over the (possibly mesh-sharded) antenna axis: local sum plus a
    ``psum`` over the antenna mesh axis when the model is antenna-parallel
    (SPMD over ICI; SURVEY.md section 2.3 P2)."""
    s = jnp.sum(x, axis=axis)
    if ant_axis_name is not None:
        s = jax.lax.psum(s, ant_axis_name)
    return s


def mrt_precoder(h_sc: Array, ant_axis_name: str | None = None) -> Array:
    """Maximum-ratio transmission with equal-total-TX-power normalization:
    ``V = conj(H) / sqrt(sum_ant |H|^2)`` per subcarrier
    (``reference/antenna_array.py:167-171``). ``h_sc``: ``[n_ant, n_sc]``
    (the local antenna shard under antenna parallelism)."""
    norm2 = _ant_sum(jnp.abs(h_sc) ** 2, -2, ant_axis_name)
    norm = jnp.sqrt(norm2)[..., None, :]
    return jnp.conj(h_sc) / norm.astype(h_sc.dtype)


def phase_precoder(h_sc: Array) -> Array:
    """Phase-only conjugate precoding ``V = e^{j angle(conj H)}``
    (``reference/antenna_array.py:176-178``)."""
    return jnp.exp(1j * jnp.angle(jnp.conj(h_sc))).astype(h_sc.dtype)


def mu_mrt_precoder(h_sc_mu: Array, ant_axis_name: str | None = None) -> Array:
    """Multi-user MRT with joint normalization over users
    (``reference/antenna_array.py:201-220``): the per-subcarrier norm is
    ``sqrt(sum_usr sum_ant |H_u|^2)``. ``h_sc_mu``: ``[n_usr, n_ant, n_sc]``
    (local antenna shard under antenna parallelism) ->
    ``V [n_ant, n_usr, n_sc]``."""
    norm2 = _ant_sum(jnp.abs(h_sc_mu) ** 2, (0, 1), ant_axis_name)  # [n_sc]
    norm = jnp.sqrt(norm2)
    v = jnp.conj(h_sc_mu) / norm.astype(h_sc_mu.dtype)            # [n_usr, n_ant, n_sc]
    return jnp.transpose(v, (1, 0, 2))


def mu_phase_precoder(h_sc_mu: Array, ant_axis_name: str | None = None) -> Array:
    """Multi-user phase-only precoding (``reference/antenna_array.py:259-267``;
    purely per-antenna, so antenna sharding needs no collective)."""
    v = jnp.exp(1j * jnp.angle(jnp.conj(h_sc_mu))).astype(h_sc_mu.dtype)
    return jnp.transpose(v, (1, 0, 2))


def zf_precoder(h_sc_mu: Array, ant_axis_name: str | None = None,
                n_ant_global: int | None = None) -> Array:
    """Zero-forcing precoding, batched over subcarriers
    (``reference/antenna_array.py:222-257``):

    per subcarrier with user-channel matrix ``Hm [n_usr, n_ant]``:
    ``V = sqrt(K - U) * conj(Hm^T) (Hm conj(Hm)^T)^{-1}`` (pinv fallback),
    then normalized to unit total power per subcarrier (:254-257).

    ``h_sc_mu``: ``[n_usr, n_ant, n_sc]`` -> ``V [n_ant, n_usr, n_sc]``.

    Under antenna sharding the per-subcarrier Gram matrix
    ``Hm conj(Hm)^T`` is the psum of local ``[n_usr, n_usr]`` outer
    products (each shard then solves the same replicated small system and
    keeps its own rows of ``V``), and the unit-power normalization psums
    the local power (SURVEY.md section 2.3 P2).
    """
    n_usr, n_ant, n_sc = h_sc_mu.shape
    k_total = n_ant if ant_axis_name is None else n_ant_global
    hm = jnp.transpose(h_sc_mu, (2, 0, 1))                # [n_sc, n_usr, n_ant]
    gram = hm @ jnp.conj(jnp.transpose(hm, (0, 2, 1)))    # [n_sc, n_usr, n_usr]
    if ant_axis_name is not None:
        gram = jax.lax.psum(gram, ant_axis_name)
    inv = jnp.linalg.pinv(gram)
    v = jnp.sqrt(float(k_total - n_usr)) * (jnp.conj(jnp.transpose(hm, (0, 2, 1))) @ inv)
    # unit total power per subcarrier
    pw2 = jnp.sum(jnp.abs(v) ** 2, axis=(1, 2), keepdims=True)
    if ant_axis_name is not None:
        pw2 = jax.lax.psum(pw2, ant_axis_name)
    v = v / jnp.sqrt(pw2).astype(v.dtype)                 # [n_sc, n_ant, n_usr]
    return jnp.transpose(v, (1, 2, 0))


def mu_sep_carrier_precoder(h_sc_mu: Array, mr_precoding: bool = True,
                            ant_axis_name: str | None = None) -> Array:
    """Separate-subcarriers-per-user precoding
    (``reference/antenna_array.py:275-305``): user ``u`` owns the ``u``-th
    of ``n_usr`` contiguous subcarrier blocks; the composed channel takes
    each user's own block and precodes it as single-user MRT/phase.
    Returns a single-user-shaped ``V [n_ant, n_sc]``."""
    n_usr, n_ant, n_sc = h_sc_mu.shape
    blk = n_sc // n_usr
    blocks = [h_sc_mu[u, :, u * blk:(u + 1) * blk] for u in range(n_usr)]
    composed = jnp.concatenate(blocks, axis=-1)           # [n_ant, n_sc]
    if mr_precoding:
        return mrt_precoder(composed, ant_axis_name)
    return phase_precoder(composed)


def make_precoder(kind: str, n_users: int = 1,
                  ant_axis_name: str | None = None,
                  n_ant_global: int | None = None):
    """Dispatch used by the link models. ``kind``: mrt | phase | zf | none.
    Every precoder supports antenna-axis sharding (``ant_axis_name``):
    the cross-antenna reductions (MRT norm, ZF Gram + power norm) ride a
    ``psum`` while everything else stays shard-local."""
    if kind == "none":
        return lambda h_sc: jnp.ones_like(h_sc)
    if n_users == 1:
        if kind == "mrt":
            return lambda h: mrt_precoder(h, ant_axis_name)
        if kind == "phase":
            return lambda h: phase_precoder(h)
        raise ValueError(f"unknown single-user precoder {kind!r}")
    if kind == "mrt":
        return lambda h: mu_mrt_precoder(h, ant_axis_name)
    if kind == "phase":
        return lambda h: mu_phase_precoder(h, ant_axis_name)
    if kind == "zf":
        return lambda h: zf_precoder(h, ant_axis_name, n_ant_global)
    raise ValueError(f"unknown multi-user precoder {kind!r}")


# --- constant-IBO bookkeeping ---------------------------------------------

def precoding_power_per_antenna(v: Array) -> Array:
    """``vk_pow_vec[a] = sum_sc (sum_usr) |V|^2`` (``reference/corrector.py:143``,
    ``reference/mp_model.py:302``; MU variant ``reference/corrector.py:383``)."""
    if v.ndim == 2:
        return jnp.sum(jnp.abs(v) ** 2, axis=-1)
    return jnp.sum(jnp.abs(v) ** 2, axis=(-2, -1))


def avg_precoding_gain(v: Array, ant_axis_name: str | None = None,
                       n_ant_global: int | None = None) -> Array:
    """Mean precoding power gain over antennas x subcarriers
    (``reference/antenna_array.py:328-341``): single-user mean |V|^2; for
    multi-user the per-(ant,sc) power summed over users, then averaged.
    Under antenna parallelism pass the mesh axis name and the *global*
    antenna count."""
    pw = jnp.abs(v) ** 2 if v.ndim == 2 else jnp.sum(jnp.abs(v) ** 2, axis=-2)
    if ant_axis_name is None:
        return jnp.mean(pw)
    total = jax.lax.psum(jnp.sum(pw), ant_axis_name)
    return total / (n_ant_global * v.shape[-1])


def per_antenna_ibo_db(ibo_db: float, vk_pow_vec: Array, n_sub_carr: int,
                       n_ant: int) -> Array:
    """Effective per-antenna IBO after precoding redistributes power:
    ``10 log10( 10^(ibo/10) n_sc / (vk_pow_vec * n_ant) )``
    (``reference/mp_model.py:315-316``, ``reference/corrector.py:149-152``)."""
    return 10.0 * jnp.log10(10.0 ** (ibo_db / 10.0) * n_sub_carr
                            / (vk_pow_vec * n_ant))


def per_antenna_alpha(ibo_db: float, vk_pow_vec: Array, n_sub_carr: int,
                      n_ant: int) -> Array:
    """``ak_vect`` — per-antenna Bussgang gain at the effective IBO
    (``reference/mp_model.py:315-317``)."""
    return bussgang_alpha(per_antenna_ibo_db(ibo_db, vk_pow_vec, n_sub_carr, n_ant))


def pa_sat_power(ibo_db: float, avg_sample_power: float, v: Array,
                 ant_axis_name: str | None = None,
                 n_ant_global: int | None = None) -> Array:
    """Per-array PA saturation power under constant IBO: the reference
    rescales every PA's expected average power by the mean precoding gain
    (``reference/antenna_array.py:313-360``):
    ``sat = 10^(ibo/10) * avg_sample_power * avg_precoding_gain``."""
    return (10.0 ** (ibo_db / 10.0) * avg_sample_power
            * avg_precoding_gain(v, ant_axis_name, n_ant_global))
