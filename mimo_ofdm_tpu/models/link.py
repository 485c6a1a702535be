"""End-to-end link frame simulator — the TPU-native analogue of
``reference/mp_model.py`` (``Link.simulate``).

``make_frame_fn`` builds one pure, jittable function that simulates a
single OFDM frame end to end — channel (re)roll, precoding, constant-IBO
recalibration, AGC, TX array with per-antenna PA, propagation, AWGN,
equalization and CNC/MCNC reception — returning per-iteration bit-error
counts. ``vmap`` it over a key batch for Monte-Carlo trials; shard the
batch over a device mesh for multi-chip scaling (see
``mimo_ofdm_tpu.parallel``).

RNG roles mirror the reference's four independent streams
(``reference/mp_model.py:74-77,121-125``): bits / noise / location(fade) /
CSI, here derived by folding a single frame key.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from mimo_ofdm_tpu.ops import bits as bits_ops
from mimo_ofdm_tpu.ops import noise as noise_ops
from mimo_ofdm_tpu.ops import ofdm, pa, qam
from mimo_ofdm_tpu.models import agc as agc_mod
from mimo_ofdm_tpu.models import channels, geometry, precoding, receivers, transmit
from mimo_ofdm_tpu.utils.config import LinkConfig


class FrameCounters(NamedTuple):
    """Bit-error counts for one simulated frame."""
    clean_err: Array     # scalar int32 (clean run, counter [0] in the reference)
    dist_err: Array      # [n_iters + 1] int32, CNC iterations 0..n_iters


def link_static(cfg: LinkConfig, dtype=jnp.complex64):
    """Precompute static geometry/frequency arrays for a link config."""
    n_ant = cfg.array.n_elements
    tx_pos = geometry.array_positions(
        cfg.array.geometry, n_ant, cfg.center_freq, cfg.array.wav_len_spacing,
        cord_z=cfg.array.cord_z, n_rows=cfg.array.n_rows, n_cols=cfg.array.n_cols)
    freqs = np.asarray(ofdm.fft_bin_frequencies(cfg.modem.n_fft, cfg.carrier_spacing,
                                                cfg.center_freq))
    rx_base = np.array([cfg.rx.cord_x, cfg.rx.cord_y, cfg.rx.cord_z])
    return jnp.asarray(tx_pos, jnp.float32), jnp.asarray(freqs, jnp.float32), \
        jnp.asarray(rx_base, jnp.float32)


def make_channel_fn(cfg: LinkConfig, freqs: Array, rx_base: Array,
                    reroll: bool, dtype=jnp.complex64,
                    ant_axis_name: str | None = None):
    """Channel generator keyed per frame. For geometric channels the
    reroll perturbs the RX position uniformly in ``+-loc_var/2``
    (``reference/mp_model.py:140-150``; note the reference derives *both*
    offsets from ``rx_loc_x`` — a quirk that is irrelevant for the
    canonical symmetric RX position; here each axis uses its own base).
    For stochastic channels the reroll is a fresh fade draw
    (``reference/mp_model.py:154``)."""
    model = cfg.channel.model
    skip_att = cfg.channel.skip_attenuation

    def rx_position(key):
        if not reroll:
            return rx_base
        off = jax.random.uniform(key, (2,), minval=-cfg.rx.loc_var / 2.0,
                                 maxval=cfg.rx.loc_var / 2.0)
        return rx_base + jnp.concatenate([off, jnp.zeros(1)])

    def channel_fn(key, tx_pos):
        k_loc, k_fade = jax.random.split(key)
        if model == "awgn":
            return jnp.ones((tx_pos.shape[0], freqs.shape[0]), dtype)
        if model == "los":
            return channels.los_channel(tx_pos, rx_position(k_loc), freqs,
                                        skip_att, dtype=dtype)
        if model == "two_path":
            return channels.two_path_channel(tx_pos, rx_position(k_loc), freqs,
                                             skip_att, dtype=dtype)
        if model == "rayleigh":
            if ant_axis_name is not None:
                # per-antenna fades are IID, so each antenna shard must draw
                # from an independent stream; geometric/path-based models are
                # deterministic in tx_pos (or share path draws across
                # antennas) and need no decorrelation.
                k_fade = jax.random.fold_in(k_fade,
                                            jax.lax.axis_index(ant_axis_name))
            return channels.rayleigh_channel(k_fade, tx_pos, rx_base, freqs,
                                             skip_att, dtype=dtype)
        if model == "rician":
            if ant_axis_name is not None:
                k_fade = jax.random.fold_in(k_fade,
                                            jax.lax.axis_index(ant_axis_name))
            return channels.rician_channel(k_fade, tx_pos, rx_position(k_loc),
                                           freqs, cfg.channel.rician_k_db,
                                           skip_att, dtype=dtype)
        if model == "random_paths":
            return channels.random_paths_channel(k_fade, tx_pos, freqs,
                                                 cfg.channel.n_paths,
                                                 cfg.channel.max_delay_spread,
                                                 dtype=dtype)
        if model == "tdl_3gpp":
            return channels.tdl_channel(k_fade, tx_pos, rx_position(k_loc), freqs,
                                        cfg.channel.tdl_profile,
                                        skip_attenuation=skip_att,
                                        n_subpaths=cfg.channel.tdl_subpaths,
                                        asd_deg=cfg.channel.tdl_asd_deg,
                                        k_db=cfg.channel.tdl_k_db,
                                        k_std_db=cfg.channel.tdl_k_std_db,
                                        ds_log10_std=cfg.channel.tdl_ds_log10_std,
                                        dtype=dtype)
        if model == "gscm":
            from mimo_ofdm_tpu.models import gscm
            return gscm.gscm_channel(
                k_fade, tx_pos, rx_position(k_loc), freqs,
                scenario=cfg.channel.gscm_scenario,
                skip_attenuation=skip_att,
                element_pattern=cfg.channel.gscm_element_pattern,
                dtype=dtype)
        raise ValueError(f"unknown channel model {model!r}")

    return channel_fn


def make_frame_fn(cfg: LinkConfig, n_iters: int, *, incl_clean: bool = True,
                  reroll: bool = True, dtype=jnp.complex64,
                  ant_axis_name: str | None = None,
                  ibo_as_arg: bool = False):
    """Build the per-frame simulator
    ``frame_fn(key, snr_db, tx_pos) -> FrameCounters``.

    One call reproduces one pass of the reference's clean + distorted
    while-loop bodies (``reference/mp_model.py:136-222``): both runs use
    independent bit/noise draws, the distorted run feeds the CNC/MCNC
    receiver and errors are counted per iteration tap.

    ``tx_pos`` is the ``[n_ant, 3]`` element-position array — or the local
    ``[n_ant/tp, 3]`` shard when ``ant_axis_name`` names an antenna mesh
    axis inside ``shard_map``; every antenna-axis reduction then rides a
    ``psum`` over ICI (SURVEY.md section 2.3 P2).

    With ``ibo_as_arg=True`` the signature gains a trailing traced
    ``ibo_db`` scalar (``frame_fn(key, snr_db, tx_pos, ibo_db)``) so IBO
    sweeps (``ber_vs_ibo``, the fixed-BER grids) reuse ONE compiled
    executable across all IBO points instead of recompiling per value —
    every IBO-dependent quantity (saturation power, Bussgang alpha/erfc,
    AGC scalers) is already computed with jnp ops.
    """
    if (cfg.channel_storage != "complex64" and ant_axis_name is None
            and dtype == jnp.complex64):
        from mimo_ofdm_tpu.models import link_planar
        if link_planar.planar_eligible(cfg):
            # bf16 planar channel-block fast path (same counters within
            # Monte-Carlo noise; see models/link_planar.py)
            return link_planar.make_planar_frame_fn(
                cfg, n_iters, incl_clean=incl_clean, reroll=reroll,
                storage=cfg.channel_storage, ibo_as_arg=ibo_as_arg)
    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements   # global count (alpha/IBO formulas use it)
    n_bits = cfg.modem.n_bits_per_ofdm_sym
    avg_sym_pow = cfg.modem.avg_symbol_power
    avg_samp_pow = cfg.modem.avg_sample_power
    pa_model = cfg.pa.model

    _, freqs, rx_base = link_static(cfg, dtype)
    # Everything downstream of the TX FFT only observes the data
    # subcarriers (the receivers strip out-of-band bins immediately,
    # reference/corrector.py:66, reference/mp_model.py:299), so the
    # channel, noise and AGC are generated/applied on the n_sc grid only —
    # identical observable statistics at half the bandwidth-bound work.
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)
    channel_fn = make_channel_fn(cfg, freqs_sc, rx_base, reroll, dtype,
                                 ant_axis_name)
    precoder = precoding.make_precoder(cfg.precoding, cfg.modem.n_users,
                                       ant_axis_name, n_ant)

    def _frame(key: Array, snr_db: Array, tx_pos: Array,
               ibo_db) -> FrameCounters:
        k_chan, k_csi, k_bits_c, k_bits_d, k_noise_c, k_noise_d = \
            jax.random.split(key, 6)

        h_sc = channel_fn(k_chan, tx_pos)               # [n_ant, n_sc] true channel
        if cfg.csi_epsilon:
            if ant_axis_name is not None:
                k_csi = jax.random.fold_in(k_csi,
                                           jax.lax.axis_index(ant_axis_name))
            # CSI error on the data bins (reference/mp_model.py:264-284)
            p = jnp.mean(jnp.abs(h_sc) ** 2, axis=-1, keepdims=True)
            csi_noise = noise_ops.complex_normal(k_csi, h_sc.shape, dtype)
            h_pre_sc = (jnp.sqrt(1.0 - cfg.csi_epsilon ** 2) * h_sc
                        + csi_noise * jnp.sqrt(p).astype(dtype) * cfg.csi_epsilon)
        elif cfg.csi_snr_db is not None:
            # legacy additive CSI-noise model (the committed
            # ber_vs_ebn0_*_csi_noise_dbN_* family): noisy estimate at a
            # fixed CSI SNR against the global mean per-bin channel power
            if ant_axis_name is not None:
                k_csi = jax.random.fold_in(k_csi,
                                           jax.lax.axis_index(ant_axis_name))
                p = jax.lax.pmean(jnp.mean(jnp.abs(h_sc) ** 2),
                                  ant_axis_name)
            else:
                p = jnp.mean(jnp.abs(h_sc) ** 2)
            sigma2 = p / (10.0 ** (cfg.csi_snr_db / 10.0))
            csi_noise = noise_ops.complex_normal(k_csi, h_sc.shape, dtype)
            h_pre_sc = h_sc + csi_noise * jnp.sqrt(sigma2).astype(dtype)
        else:
            h_pre_sc = h_sc

        v = precoder(h_pre_sc)                          # [n_ant, n_sc]
        sat_pow = precoding.pa_sat_power(ibo_db, avg_samp_pow, v,
                                         ant_axis_name, n_ant)
        if pa_model == "toi":
            # for TOI, `ibo_db` is the intercept point vs the precoded
            # average power (reference/distortion.py:222-228 with
            # antenna_array.update_distortion's power rescale)
            toi_coeff = pa.toi_to_cubic_coeff(
                ibo_db, avg_samp_pow * precoding.avg_precoding_gain(
                    v, ant_axis_name, n_ant))
        else:
            toi_coeff = 0.0
        if pa_model == "toi":
            alpha_override = cfg.pa.alpha_estimate
        elif pa_model == "none":
            alpha_override = 1.0   # linear PA: no Bussgang shrink
        else:
            alpha_override = None
        agc = agc_mod.compute_agc_sc(
            h_pre_sc, v, ibo_db, n_ant, ant_axis_name=ant_axis_name,
            alpha_override=alpha_override)

        # --- clean run (reference/mp_model.py:136-175) ---
        if incl_clean:
            bits_c = bits_ops.random_payload_bits(k_bits_c, n_bits)
            # Without PA distortion the TX (I)FFT round trip is an identity
            # and propagation commutes with the per-subcarrier symbol
            # multiply: sum_ant h (v s) = s * sum_ant(h v). The combined
            # [n_sc] vector is the AGC's hk_vk when CSI is perfect (h_pre =
            # h), so the [n_ant, n_sc] precoded array is never materialized
            # (and under antenna sharding the propagate psum is saved too).
            sym_c = transmit.modulate_users(bits_c, m, dtype)
            if cfg.csi_epsilon or cfg.csi_snr_db is not None:
                # propagation uses the TRUE channel; the AGC vector is built
                # from the noisy h_pre, so combine h o v separately here
                # (both CSI-error models; the committed csi_noise_db
                # clean rows exposed this — reference/mp_model.py:136-175
                # propagates the clean run through the true channel while
                # equalizing with the noisy-CSI AGC)
                hv_true = channels.propagate(h_sc, v,
                                             ant_axis_name=ant_axis_name)
            else:
                hv_true = agc.hk_vk_agc_sc
            rx_c = sym_c * hv_true
            rx_c = noise_ops.awgn(k_noise_c, rx_c, snr_db,
                                  avg_sym_pow * agc.hk_vk_noise_scaler)
            rx_c = rx_c / agc.hk_vk_agc_sc
            rx_bits_c = receivers.standard_receive_sc(rx_c, m)
            clean_err = bits_ops.count_bit_errors(bits_c, rx_bits_c)
        else:
            clean_err = jnp.zeros((), jnp.int32)

        # --- distorted run (reference/mp_model.py:180-222) ---
        bits_d = bits_ops.random_payload_bits(k_bits_d, n_bits)
        sym_d = transmit.modulate_users(bits_d, m, dtype)
        per_ant_sc = transmit.precode_symbols(sym_d, v)
        fd_dist_sc = transmit.ifft_pa_fft_sc(
            per_ant_sc, n_fft, pa_model, sat_pow,
            rapp_p=cfg.pa.rapp_p_hardness, toi_coeff=toi_coeff,
            use_mxu_fft=cfg.use_mxu_fft, mxu_storage=cfg.mxu_fft_storage)
        rx_d = channels.propagate(h_sc, fd_dist_sc, ant_axis_name=ant_axis_name)
        rx_d = noise_ops.awgn(k_noise_d, rx_d, snr_db,
                              avg_sym_pow * agc.ak_hk_vk_noise_scaler)
        rx_sc = rx_d / agc.ak_hk_vk_agc_sc

        if cfg.rx.algorithm == "cnc":
            replica = receivers.make_cnc_replica(
                m, n_fft, n_sc, ibo_db, pa_model,
                alpha=alpha_override, rapp_p=cfg.pa.rapp_p_hardness,
                use_mxu_fft=cfg.use_mxu_fft,
                mxu_storage=cfg.mxu_fft_storage)
            bits_all, _ = receivers.cnc_iterate(rx_sc, n_iters, m, replica)
        elif cfg.rx.algorithm == "mcnc":
            # MCNC replica uses the *precoding* channel (noisy under CSI
            # error, reference/mp_model.py:115-119) and the ak AGC vector.
            replica = receivers.make_mcnc_replica(
                h_pre_sc, v, agc.ak_hk_vk_agc_sc, constel_size=m,
                n_fft=n_fft, n_sc=n_sc, pa_model=pa_model, sat_power=sat_pow,
                rapp_p=cfg.pa.rapp_p_hardness, toi_coeff=toi_coeff,
                ant_axis_name=ant_axis_name, use_mxu_fft=cfg.use_mxu_fft,
                mxu_storage=cfg.mxu_fft_storage)
            bits_all, _ = receivers.cnc_iterate(rx_sc, n_iters, m, replica)
        elif cfg.rx.algorithm == "none":
            one = receivers.standard_receive_sc(rx_sc, m)
            bits_all = jnp.broadcast_to(one, (n_iters + 1, n_bits))
        else:
            raise ValueError(f"unsupported rx algorithm {cfg.rx.algorithm!r}")

        dist_err = bits_ops.count_bit_errors(bits_d, bits_all, axis=-1)
        return FrameCounters(clean_err=clean_err, dist_err=dist_err)

    if ibo_as_arg:
        return _frame

    def frame_fn(key: Array, snr_db: Array, tx_pos: Array) -> FrameCounters:
        return _frame(key, snr_db, tx_pos, cfg.pa.ibo_db)

    return frame_fn


def make_round_fn(cfg: LinkConfig, n_iters: int, batch: int, *,
                  incl_clean: bool = True, reroll: bool = True,
                  ibo_as_arg: bool = False, flat: bool = False,
                  idx_arg: bool = False, dtype=jnp.complex64):
    """Jitted Monte-Carlo round: ``round_fn(key, snr_db) -> FrameCounters``
    summed over a ``batch`` of independent frames (vmapped). This is the
    unit of work the host stop-criterion loop schedules — the batched
    replacement for the reference's per-frame shared-counter polling
    (``reference/mp_model.py:137,181``). With ``ibo_as_arg=True`` the
    round is ``round_fn(key, snr_db, ibo_db)`` with a traced IBO — one
    compile for a whole IBO sweep (see :func:`make_frame_fn`).

    With ``flat=True`` the round returns ONE int32 vector
    ``[clean_err, dist_err[0..n_iters]]`` (the reference's shared-array
    layout, ``reference/mp_model.py:132-134``) instead of the named
    tuple. On the axon-tunneled TPU every separate host fetch is a
    tunnel round-trip, and an extra eager packing dispatch costs about
    one more — pre-packing *inside* the round executable makes the
    driver's consume a single round-trip (measured at batch 768:
    16,380 vs 15,237 vs 10,455 frames/s for one fetch / two fetches /
    extra-dispatch packing, ``figs/profiling/consume_ab.json``).

    With ``idx_arg=True`` the signature gains a traced round index
    after the key — ``round_fn(key, idx, snr_db[, ibo_db])`` computes
    ``fold_in(key, idx)`` INSIDE the executable, replacing the driver's
    per-launch eager ``fold_in`` dispatch (each eager dispatch costs
    host time on the tunnel transport; interleaved A/B at batch 512:
    +5% — ``figs/profiling/foldin_ab.json``). Key derivation is
    bit-identical to the host-side ``fold_in(key, idx)``."""
    frame_fn = make_frame_fn(cfg, n_iters, incl_clean=incl_clean,
                             reroll=reroll, dtype=dtype,
                             ibo_as_arg=ibo_as_arg)
    tx_pos = link_static(cfg, dtype)[0]

    def _sum(counters):
        # int32 is ample for one round's error counts; the host accumulates
        # across rounds in Python ints (TPU has no native int64).
        c = jax.tree.map(lambda x: jnp.sum(x, axis=0, dtype=jnp.int32),
                         counters)
        if flat:
            return jnp.concatenate([jnp.atleast_1d(c.clean_err),
                                    jnp.ravel(c.dist_err)])
        return c

    if ibo_as_arg:
        @jax.jit
        def round_fn_ibo(key: Array, snr_db: Array, ibo_db: Array):
            keys = jax.random.split(key, batch)
            counters = jax.vmap(frame_fn, in_axes=(0, None, None, None))(
                keys, snr_db, tx_pos, ibo_db)
            return _sum(counters)

        if idx_arg:
            @jax.jit
            def round_fn_ibo_idx(key: Array, idx: Array, snr_db: Array,
                                 ibo_db: Array):
                return round_fn_ibo(jax.random.fold_in(key, idx), snr_db,
                                    ibo_db)

            return round_fn_ibo_idx
        return round_fn_ibo

    @jax.jit
    def round_fn(key: Array, snr_db: Array):
        keys = jax.random.split(key, batch)
        counters = jax.vmap(frame_fn, in_axes=(0, None, None))(keys, snr_db, tx_pos)
        return _sum(counters)

    if idx_arg:
        @jax.jit
        def round_fn_idx(key: Array, idx: Array, snr_db: Array):
            return round_fn(jax.random.fold_in(key, idx), snr_db)

        return round_fn_idx
    return round_fn
