"""Multi-user link frame simulator.

TPU-native analogue of the multi-user experiment family
(``reference/main_multiuser/main_multiuser_cnc_ber_vs_ebn0.py``): per-user
channels at distinct positions, joint MRT/ZF precoding over users, one
summed MU transmit, then per-user propagation, AWGN (per-user noise
scaler), AGC and reception with per-user BER counters.

Receiver algorithms:

* ``cnc``     — plain single-user CNC per user (the reference's "CNC"
  MU curves, ``main_multiuser_cnc_ber_vs_ebn0.py:600-601``)
* ``cnc_mu``  — CNC with known other-user symbols ("CNCWI",
  ``reference/corrector.py:248-345``)
* ``mcnc_mu`` — MCNC with known other-user bits ("MCNCWI",
  ``reference/corrector.py:348-489``)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from mimo_ofdm_tpu.ops import bits as bits_ops
from mimo_ofdm_tpu.ops import noise as noise_ops
from mimo_ofdm_tpu.ops import ofdm, qam
from mimo_ofdm_tpu.models import agc as agc_mod
from mimo_ofdm_tpu.models import channels, precoding, receivers, transmit
from mimo_ofdm_tpu.models.link import link_static, make_channel_fn
from mimo_ofdm_tpu.utils.config import LinkConfig


def default_user_positions(angles_deg=(-30.0, 30.0), distances=(100.0, 316.3),
                           cord_z: float = 1.5) -> np.ndarray:
    """Canonical 2-user geometry: ±30° at 100 / 316.3 m
    (``reference/main_multiuser/main_multiuser_cnc_ber_vs_ebn0.py:37-46``)."""
    out = []
    for ang, dist in zip(angles_deg, distances):
        a = np.deg2rad(ang + 90.0)
        out.append((np.cos(a) * dist, np.sin(a) * dist, cord_z))
    return np.asarray(out)


def spread_user_positions(n_users: int, distance: float = 200.0,
                          span_deg: float = 120.0,
                          cord_z: float = 1.5) -> np.ndarray:
    """``n_users`` users spread uniformly over ``span_deg`` around
    broadside at a common distance — for larger MU scenarios (e.g. 8
    users x 128 antennas)."""
    angles = np.linspace(-span_deg / 2, span_deg / 2, n_users)
    return default_user_positions(tuple(angles), tuple([distance] * n_users),
                                  cord_z)


class MuFrameCounters(NamedTuple):
    clean_err: Array   # [n_usr] int32
    dist_err: Array    # [n_usr, n_iters + 1] int32


def make_mu_frame_fn(cfg: LinkConfig, n_iters: int, user_positions: np.ndarray,
                     *, incl_clean: bool = True, reroll: bool = True,
                     dtype=jnp.complex64, ant_axis_name: str | None = None):
    """Per-frame MU simulator (shared subcarriers)
    ``frame_fn(key, snr_db, tx_pos) -> MuFrameCounters``. For the
    separate-subcarriers-per-user variant see
    :func:`make_mu_sep_frame_fn`.

    With ``ant_axis_name`` the frame runs antenna-sharded inside
    ``shard_map``: ``tx_pos`` is the local antenna shard, precoder norms /
    ZF Grams / AGC sums / channel combines psum over the axis."""
    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements
    n_usr = len(user_positions)
    n_bits = cfg.modem.n_bits_per_ofdm_sym
    ibo_db = cfg.pa.ibo_db
    avg_sym_pow = cfg.modem.avg_symbol_power
    avg_samp_pow = cfg.modem.avg_sample_power
    pa_model = cfg.pa.model
    algorithm = cfg.rx.algorithm

    _, freqs, _ = link_static(cfg, dtype)
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)
    precoder = precoding.make_precoder(cfg.precoding, n_users=n_usr,
                                       ant_axis_name=ant_axis_name,
                                       n_ant_global=n_ant)

    # one channel generator per user position (rebasing rx_base per user);
    # generated on the data-subcarrier grid only (see models/link.py)
    user_channel_fns = []
    for u in range(n_usr):
        chan_fn = make_channel_fn(cfg, freqs_sc,
                                  jnp.asarray(user_positions[u], jnp.float32),
                                  reroll, dtype, ant_axis_name)
        user_channel_fns.append(chan_fn)

    def frame_fn(key: Array, snr_db: Array, tx_pos: Array) -> MuFrameCounters:
        keys = jax.random.split(key, 4 + n_usr)
        k_bits_c, k_bits_d, k_noise_c, k_noise_d = keys[:4]

        h_sc_usr = jnp.stack([user_channel_fns[u](keys[4 + u], tx_pos)
                              for u in range(n_usr)])      # [n_usr, n_ant, n_sc]

        v = precoder(h_sc_usr)                              # [n_ant, n_usr, n_sc]
        sat_pow = precoding.pa_sat_power(ibo_db, avg_samp_pow, v,
                                         ant_axis_name, n_ant)
        agc_usr = [agc_mod.compute_agc_sc(h_sc_usr[u], v, ibo_db, n_ant,
                                          usr_idx=u,
                                          ant_axis_name=ant_axis_name)
                   for u in range(n_usr)]

        # --- clean run ---
        if incl_clean:
            bits_c = jax.random.bernoulli(k_bits_c, 0.5,
                                          (n_usr, n_bits)).astype(jnp.int8)
            # clean TX (I)FFT round trip is the identity on the data bins
            sym_c = qam.modulate_bits(bits_c, m, dtype)
            tx_sc = transmit.precode_symbols(sym_c, v)       # [n_ant, n_sc]
            clean_errs = []
            for u in range(n_usr):
                rx = channels.propagate(h_sc_usr[u], tx_sc,
                                        ant_axis_name=ant_axis_name)
                rx = noise_ops.awgn(jax.random.fold_in(k_noise_c, u), rx, snr_db,
                                    avg_sym_pow * agc_usr[u].hk_vk_noise_scaler)
                rx = rx / agc_usr[u].hk_vk_agc_sc
                rx_bits = receivers.standard_receive_sc(rx, m)
                clean_errs.append(bits_ops.count_bit_errors(bits_c[u], rx_bits))
            clean_err = jnp.stack(clean_errs)
        else:
            clean_err = jnp.zeros((n_usr,), jnp.int32)

        # --- distorted run ---
        bits_d = jax.random.bernoulli(k_bits_d, 0.5,
                                      (n_usr, n_bits)).astype(jnp.int8)
        tx_sym = qam.modulate_bits(bits_d, m, dtype)        # [n_usr, n_sc]
        fd_dist_sc = transmit.array_transmit_sc(
            bits_d, constel_size=m, n_fft=n_fft, v=v, pa_model=pa_model,
            sat_power=sat_pow, rapp_p=cfg.pa.rapp_p_hardness,
            use_mxu_fft=cfg.use_mxu_fft,
            mxu_storage=cfg.mxu_fft_storage, dtype=dtype)

        dist_errs = []
        for u in range(n_usr):
            rx = channels.propagate(h_sc_usr[u], fd_dist_sc,
                                    ant_axis_name=ant_axis_name)
            rx = noise_ops.awgn(jax.random.fold_in(k_noise_d, u), rx, snr_db,
                                avg_sym_pow * agc_usr[u].ak_hk_vk_noise_scaler)
            rx_sc = rx / agc_usr[u].ak_hk_vk_agc_sc

            other = tx_sym[1 - u] if n_usr == 2 else None
            if algorithm == "cnc":
                replica = receivers.make_cnc_replica(m, n_fft, n_sc, ibo_db,
                                                     pa_model,
                                                     use_mxu_fft=cfg.use_mxu_fft,
                mxu_storage=cfg.mxu_fft_storage)
            elif n_usr != 2:
                raise ValueError(
                    "cnc_mu/mcnc_mu are 2-user prototypes, matching the "
                    "reference (reference/corrector.py:248-251)")
            elif algorithm == "cnc_mu":
                replica = receivers.make_cnc_mu_replica(
                    other, constel_size=m, n_fft=n_fft, n_sc=n_sc,
                    ibo_db=ibo_db, pa_model=pa_model,
                    use_mxu_fft=cfg.use_mxu_fft,
                mxu_storage=cfg.mxu_fft_storage)
            elif algorithm == "mcnc_mu":
                replica = receivers.make_mcnc_mu_replica(
                    other, u, h_sc_usr[u], v, agc_usr[u].ak_hk_vk_agc_sc,
                    constel_size=m, n_fft=n_fft, n_sc=n_sc, pa_model=pa_model,
                    sat_power=sat_pow, use_mxu_fft=cfg.use_mxu_fft,
                    mxu_storage=cfg.mxu_fft_storage,
                    ant_axis_name=ant_axis_name)
            else:
                raise ValueError(f"unsupported MU rx algorithm {algorithm!r}")
            bits_all, _ = receivers.cnc_iterate(rx_sc, n_iters, m, replica)
            dist_errs.append(bits_ops.count_bit_errors(bits_d[u], bits_all,
                                                       axis=-1))
        return MuFrameCounters(clean_err=clean_err,
                               dist_err=jnp.stack(dist_errs))

    return frame_fn


def make_mu_sep_frame_fn(cfg: LinkConfig, n_iters: int,
                         user_positions: np.ndarray, *, incl_clean: bool = True,
                         reroll: bool = True, dtype=jnp.complex64):
    """Separate-subcarriers-per-user MU frame
    (``reference/main_multiuser/main_multiuser_cnc_sep_sc_ber_vs_ebn0.py``):
    user ``u`` owns the ``u``-th contiguous block of ``n_sc/n_usr``
    subcarriers; the composed channel takes each user's own block and the
    precoder is single-user MRT of that composed channel
    (``reference/antenna_array.py:275-305``). Each user's receiver
    equalizes with the composed AGC, runs CNC over the whole frame and
    counts errors only on its own block's bits."""
    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements
    n_usr = len(user_positions)
    if n_sc % n_usr:
        raise ValueError("n_sub_carr must divide by n_users for sep carriers")
    blk = n_sc // n_usr
    bps = cfg.modem.bits_per_symbol
    n_bits_usr = blk * bps
    ibo_db = cfg.pa.ibo_db
    avg_sym_pow = cfg.modem.avg_symbol_power
    avg_samp_pow = cfg.modem.avg_sample_power
    pa_model = cfg.pa.model

    _, freqs, _ = link_static(cfg, dtype)
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)
    user_channel_fns = [
        make_channel_fn(cfg, freqs_sc,
                        jnp.asarray(user_positions[u], jnp.float32),
                        reroll, dtype)
        for u in range(n_usr)]

    def frame_fn(key: Array, snr_db: Array, tx_pos: Array) -> MuFrameCounters:
        keys = jax.random.split(key, 4 + n_usr)
        k_bits_c, k_bits_d, k_noise_c, k_noise_d = keys[:4]
        h_usr = jnp.stack([user_channel_fns[u](keys[4 + u], tx_pos)
                           for u in range(n_usr)])       # [n_usr, n_ant, n_sc]
        comp_h = jnp.concatenate(
            [h_usr[u, :, u * blk:(u + 1) * blk] for u in range(n_usr)], axis=-1)
        v = precoding.mrt_precoder(comp_h)               # [n_ant, n_sc]
        sat_pow = precoding.pa_sat_power(ibo_db, avg_samp_pow, v)
        agc = agc_mod.compute_agc_sc(comp_h, v, ibo_db, n_ant)

        def per_user_errs(bits, rx_bits_all):
            return jnp.stack([
                bits_ops.count_bit_errors(
                    bits[..., u * n_bits_usr:(u + 1) * n_bits_usr],
                    rx_bits_all[..., u * n_bits_usr:(u + 1) * n_bits_usr],
                    axis=-1)
                for u in range(n_usr)])

        # --- clean run ---
        if incl_clean:
            bits_c = jax.random.bernoulli(
                k_bits_c, 0.5, (n_sc * bps,)).astype(jnp.int8)
            sym_c = qam.modulate_bits(bits_c, m, dtype)
            tx_sc = transmit.precode_symbols(sym_c, v)
            clean_errs = []
            for u in range(n_usr):
                rx = channels.propagate(h_usr[u], tx_sc)
                rx = noise_ops.awgn(jax.random.fold_in(k_noise_c, u), rx,
                                    snr_db,
                                    avg_sym_pow * agc.hk_vk_noise_scaler)
                rx = rx / agc.hk_vk_agc_sc
                rx_bits = receivers.standard_receive_sc(rx, m)
                clean_errs.append(bits_ops.count_bit_errors(
                    bits_c[u * n_bits_usr:(u + 1) * n_bits_usr],
                    rx_bits[u * n_bits_usr:(u + 1) * n_bits_usr]))
            clean_err = jnp.stack(clean_errs)
        else:
            clean_err = jnp.zeros((n_usr,), jnp.int32)

        # --- distorted run ---
        bits_d = jax.random.bernoulli(
            k_bits_d, 0.5, (n_sc * bps,)).astype(jnp.int8)
        fd_dist_sc = transmit.array_transmit_sc(
            bits_d, constel_size=m, n_fft=n_fft, v=v, pa_model=pa_model,
            sat_power=sat_pow, rapp_p=cfg.pa.rapp_p_hardness,
            use_mxu_fft=cfg.use_mxu_fft,
            mxu_storage=cfg.mxu_fft_storage, dtype=dtype)
        dist_errs = []
        for u in range(n_usr):
            rx = channels.propagate(h_usr[u], fd_dist_sc)
            rx = noise_ops.awgn(jax.random.fold_in(k_noise_d, u), rx, snr_db,
                                avg_sym_pow * agc.ak_hk_vk_noise_scaler)
            rx_sc = rx / agc.ak_hk_vk_agc_sc
            replica = receivers.make_cnc_replica(m, n_fft, n_sc, ibo_db,
                                                 pa_model,
                                                 use_mxu_fft=cfg.use_mxu_fft,
                mxu_storage=cfg.mxu_fft_storage)
            bits_all, _ = receivers.cnc_iterate(rx_sc, n_iters, m, replica)
            dist_errs.append(bits_ops.count_bit_errors(
                bits_d[u * n_bits_usr:(u + 1) * n_bits_usr],
                bits_all[:, u * n_bits_usr:(u + 1) * n_bits_usr], axis=-1))
        return MuFrameCounters(clean_err=clean_err,
                               dist_err=jnp.stack(dist_errs))

    return frame_fn


def make_mu_round_fn(cfg: LinkConfig, n_iters: int, batch: int,
                     user_positions: np.ndarray | None = None, *,
                     incl_clean: bool = True, reroll: bool = True,
                     sep_carriers: bool = False, dtype=jnp.complex64):
    """Jitted MU Monte-Carlo round summed over ``batch`` frames."""
    if user_positions is None:
        user_positions = default_user_positions()
    builder = make_mu_sep_frame_fn if sep_carriers else make_mu_frame_fn
    frame_fn = builder(cfg, n_iters, user_positions,
                       incl_clean=incl_clean, reroll=reroll, dtype=dtype)
    tx_pos = link_static(cfg, dtype)[0]

    @jax.jit
    def round_fn(key: Array, snr_db: Array) -> MuFrameCounters:
        keys = jax.random.split(key, batch)
        counters = jax.vmap(frame_fn, in_axes=(0, None, None))(keys, snr_db, tx_pos)
        return jax.tree.map(lambda x: jnp.sum(x, axis=0, dtype=jnp.int32), counters)

    return round_fn
