"""Planar (split real/imag) channel-block fast path for the link frame.

The canonical Monte-Carlo round is HBM-bandwidth-bound (docs/PERF.md
roofline), and after the transform chain moved to bf16-planar MXU matmuls
the remaining traffic is the *channel block*: the per-frame fade draw, the
precoder, the ``H o V`` AGC products and the ``sum_ant H o X`` propagation
combine — ~32% of round time, all streaming elementwise passes over
``[n_ant, n_sc]`` complex64 tensors (measured ablation in docs/PERF.md).

This module re-expresses that block on **bfloat16 real/imag planes**:

* the Rayleigh fade normals are *drawn* in bf16 (half the threefry bits and
  half the write traffic — 16-bit dtypes consume 16 random bits/value),
* channel, precoder and per-antenna TX tensors live as bf16 planes,
* every cross-antenna reduction (MRT norm, ``H o V`` AGC sums, propagation
  combine) accumulates in float32 (``jnp.sum(..., dtype=float32)``), and
* the per-antenna planes feed the pruned MXU transform chain through its
  planar I/O entry (:func:`mimo_ofdm_tpu.ops.mxu_fft.fused_sc_ifft_pa_fft_planar_io`)
  so the ``[.., n_ant, n_sc]`` complex frames on either side of the PA are
  never materialized at all.

Quantization error is ~2^-8 relative per stored value (-42 dB power), far
below both the PA distortion and thermal noise at every operating point
the reference sweeps; per-frame error counters agree with the complex64
path within Monte-Carlo noise (tests/test_link_planar.py).

Scope: the path covers the configurations whose statistics it has been
equivalence-tested on — single-user MRT with LOS, two-path or Rayleigh channels,
perfect CSI, any memoryless PA, CNC/MCNC/none receivers (the MCNC replica
reuses the planar TX+propagate chain per iteration), MXU-eligible shapes,
no antenna-axis sharding. :func:`mimo_ofdm_tpu.models.link.make_frame_fn`
falls back to the complex64 path for everything else, so enabling
``LinkConfig.channel_storage="bfloat16"`` is always safe.

Reference semantics mirrored: fade/reroll per frame
(``reference/mp_model.py:140-154``), AGC/noise scalers
(``reference/mp_model.py:290-329``), constant-IBO PA recalibration
(``reference/antenna_array.py:313-360``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from mimo_ofdm_tpu.ops import bits as bits_ops
from mimo_ofdm_tpu.ops import noise as noise_ops
from mimo_ofdm_tpu.ops import mxu_fft, ofdm, pa
from mimo_ofdm_tpu.models import channels, receivers, transmit
from mimo_ofdm_tpu.models.geometry import C_LIGHT
from mimo_ofdm_tpu.models.precoding import per_antenna_alpha
from mimo_ofdm_tpu.utils.config import LinkConfig


def planar_eligible(cfg: LinkConfig) -> bool:
    """True when the planar channel-block path covers this config."""
    return (cfg.modem.n_users == 1
            and not cfg.csi_epsilon
            and cfg.csi_snr_db is None
            and cfg.precoding == "mrt"
            and cfg.channel.model in ("rayleigh", "los", "two_path")
            and cfg.rx.algorithm in ("cnc", "mcnc", "none")
            and cfg.use_mxu_fft
            and mxu_fft.sc_prune_eligible(cfg.modem.n_fft, cfg.modem.n_sub_carr))


def _factored_cos_sin(w: Array, center_freq: float, df: float, n_sc: int):
    """``cos/sin(w[:,None] * freqs_sc)`` on the data-subcarrier grid with
    O(n_ant * (Q + R)) transcendentals instead of O(n_ant * n_sc).

    The SC grid is ``f_k = fc + df*k`` for integer ``k`` in
    ``[-n_sc/2..-1, 1..n_sc/2]`` (``reference/modulation.py:264-267``
    layout after ``ofdm.extract_subcarriers``). Factor the contiguous part
    ``k = R*q + r - n_sc/2`` (``q in [0..Q)``, ``r in [0..R)``) so the
    phase splits as ``theta = A[a,q] + B[a,r]`` and the big planes become
    angle-addition products of two small cos/sin tables — one broadcast
    multiply-add pass over ``[n_ant, Q, R]`` instead of 2*n_ant*n_sc
    ``sin``/``cos`` evaluations (the measured hot spot of the geometric
    per-frame reroll, docs/PERF.md "LOS is the slow channel"). The
    straggler bin ``k = +n_sc/2`` is computed directly and the DC column
    of the contiguous block is dropped in the final reorder.

    Rounding: the split A+B argument carries the same f32
    magnitude-representation error (~ulp(2e4 rad)) as the direct product
    ``w*f`` that both the complex64 path and the previous planar path
    compute, so agreement with the complex path stays at the same few-
    detector-flip level (tests/test_link_planar.py).
    """
    n_ant = w.shape[0]
    half = n_sc // 2
    R = 64
    if n_sc % R or n_sc < 2 * R:
        theta_neg = w[:, None] * (center_freq
                                  + df * jnp.arange(-half, 0, dtype=jnp.float32))
        theta_pos = w[:, None] * (center_freq
                                  + df * jnp.arange(1, half + 1, dtype=jnp.float32))
        theta = jnp.concatenate([theta_neg, theta_pos], axis=-1)
        return jnp.cos(theta), jnp.sin(theta)
    q_grid = df * (R * jnp.arange(n_sc // R, dtype=jnp.float32) - half)
    th_a = w[:, None] * (center_freq + q_grid)                 # [n_ant, Q]
    th_b = (w * df)[:, None] * jnp.arange(R, dtype=jnp.float32)  # [n_ant, R]
    th_x = w * (center_freq + df * half)                       # [n_ant]
    ca, sa = jnp.cos(th_a)[:, :, None], jnp.sin(th_a)[:, :, None]
    cb, sb = jnp.cos(th_b)[:, None, :], jnp.sin(th_b)[:, None, :]
    cos_c = (ca * cb - sa * sb).reshape(n_ant, n_sc)
    sin_c = (sa * cb + ca * sb).reshape(n_ant, n_sc)
    # contiguous k order -> SC layout [k=-half..-1 | k=1..half-1 | k=half]
    cos_sc = jnp.concatenate([cos_c[:, :half], cos_c[:, half + 1:],
                              jnp.cos(th_x)[:, None]], axis=-1)
    sin_sc = jnp.concatenate([sin_c[:, :half], sin_c[:, half + 1:],
                              jnp.sin(th_x)[:, None]], axis=-1)
    return cos_sc, sin_sc


def _channel_planes_fn(cfg: LinkConfig, freqs_sc: Array, rx_base: Array,
                       reroll: bool, st):
    """Planar channel generator ``(key, tx_pos) -> (hr, hi)`` in ``st``.

    Mirrors :func:`mimo_ofdm_tpu.models.link.make_channel_fn` for the
    covered models: Rayleigh = IID CN(0,1) x free-space attenuation at the
    *base* RX position (``reference/channel.py:234-251``); LOS = phase at
    the (rerolled) RX position x attenuation (``reference/channel.py:35-72``).
    The attenuation factor does not depend on the frame key for Rayleigh,
    so XLA hoists it out of the vmapped frame batch."""
    model = cfg.channel.model
    skip_att = cfg.channel.skip_attenuation
    inv_freqs = 1.0 / freqs_sc
    fc, df = cfg.center_freq, cfg.carrier_spacing
    n_sc = cfg.modem.n_sub_carr

    def rx_position(key):
        if not reroll:
            return rx_base
        off = jax.random.uniform(key, (2,), minval=-cfg.rx.loc_var / 2.0,
                                 maxval=cfg.rx.loc_var / 2.0)
        return rx_base + jnp.concatenate([off, jnp.zeros(1)])

    def path_planes(d):
        """Factored-phase cos/sin planes x free-space attenuation for one
        geometric path at per-antenna distances ``d`` (the phase/att math
        of ``reference/channel.py:61-67``). The attenuation
        ``c/(4 pi d f)`` splits as ``(c/(4 pi d)) * (1/f)``: the static
        1/f row hoists out of the frame batch and the per-element divide
        becomes a multiply (measured 1.24x on the plane microbench)."""
        cos_sc, sin_sc = _factored_cos_sin((2.0 * jnp.pi / C_LIGHT) * d,
                                           fc, df, n_sc)
        if skip_att:
            return cos_sc, sin_sc
        att = ((C_LIGHT / (4.0 * jnp.pi)) / d[:, None]) * inv_freqs
        return cos_sc * att, sin_sc * att

    def planes(key, tx_pos):
        k_loc, k_fade = jax.random.split(key)
        n_ant = tx_pos.shape[0]
        if model == "rayleigh":
            # scale = sqrt(0.5) x attenuation — per-value variance 0.5 per
            # real dim, exactly complex_normal's convention
            if skip_att:
                scale = jnp.full((), np.sqrt(0.5), jnp.float32)
            else:
                d = channels._distances(tx_pos, rx_base)
                scale = (channels._fs_attenuation(d, freqs_sc)
                         * np.sqrt(0.5))
            nr, ni = jax.random.normal(k_fade, (2, n_ant, freqs_sc.shape[-1]),
                                       st)
            scale = scale.astype(st)
            return nr * scale, ni * scale
        if model == "los":
            d = channels._distances(tx_pos, rx_position(k_loc))
            hr, hi = path_planes(d)
            return hr.astype(st), hi.astype(st)
        if model == "two_path":
            # LOS + ground reflection with coefficient -1
            # (``reference/channel.py:116-167``): same per-path phase/att
            # math at the LOS and mirror-image distances
            rx_pos = rx_position(k_loc)
            d_los = channels._distances(tx_pos, rx_pos)
            tz = tx_pos[:, 2]
            rz = rx_pos[2]
            horiz = jnp.sqrt((tx_pos[:, 0] - rx_pos[0]) ** 2
                             + (tx_pos[:, 1] - rx_pos[1]) ** 2)
            sin_elev = jnp.sin(jnp.arctan((tz + rz) / horiz))
            d_sec = tz / sin_elev + rz / sin_elev
            lr, li = path_planes(d_los)
            sr, si = path_planes(d_sec)
            return (lr - sr).astype(st), (li - si).astype(st)
        raise ValueError(f"planar path does not cover channel {model!r}")

    return planes


def make_planar_frame_fn(cfg: LinkConfig, n_iters: int, *,
                         incl_clean: bool = True, reroll: bool = True,
                         storage: str = "bfloat16", ibo_as_arg: bool = False):
    """Planar-storage twin of :func:`mimo_ofdm_tpu.models.link.make_frame_fn`
    (same signature, same :class:`FrameCounters` result). ``storage`` is
    the plane dtype: ``"bfloat16"`` (the point of this path) or
    ``"float32"`` (validation: matches the complex path to f32 rounding).
    ``ibo_as_arg=True`` appends a traced ``ibo_db`` argument (see
    :func:`mimo_ofdm_tpu.models.link.make_frame_fn`)."""
    from mimo_ofdm_tpu.models.link import FrameCounters, link_static

    assert planar_eligible(cfg), cfg
    if storage not in ("bfloat16", "float32"):
        raise ValueError(f"unknown planar storage {storage!r} "
                         "(expected 'bfloat16' or 'float32')")
    st = jnp.bfloat16 if storage == "bfloat16" else jnp.float32
    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements
    n_bits = cfg.modem.n_bits_per_ofdm_sym
    avg_sym_pow = cfg.modem.avg_symbol_power
    avg_samp_pow = cfg.modem.avg_sample_power
    pa_model = cfg.pa.model
    if pa_model == "toi":
        alpha_override = cfg.pa.alpha_estimate
    elif pa_model == "none":
        alpha_override = 1.0
    else:
        alpha_override = None

    _, freqs, rx_base = link_static(cfg)
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)
    channel_planes = _channel_planes_fn(cfg, freqs_sc, rx_base, reroll, st)

    def f32sum(x, axis):
        return jnp.sum(x, axis=axis, dtype=jnp.float32)

    def _frame(key: Array, snr_db: Array, tx_pos: Array,
               ibo_db) -> FrameCounters:
        # same 6-way role split as link.make_frame_fn (k_csi unused here —
        # perfect CSI is an eligibility condition) so the bit/noise/fade
        # streams are identical to the complex64 path's for the same key
        k_chan, _k_csi, k_bits_c, k_bits_d, k_noise_c, k_noise_d = \
            jax.random.split(key, 6)

        hr, hi = channel_planes(k_chan, tx_pos)          # [n_ant, n_sc] st

        # MRT precoder V = conj(H) / sqrt(sum_ant |H|^2)
        # (reference/antenna_array.py:167-171), f32 norm accumulation
        norm2 = f32sum(hr * hr + hi * hi, axis=-2)       # [n_sc] f32
        rsn = jax.lax.rsqrt(norm2)
        vr = (hr * rsn).astype(st)
        vi = (-hi * rsn).astype(st)

        # constant-IBO bookkeeping (reference/mp_model.py:290-329):
        # per-antenna precoder power, Bussgang gains, AGC sums
        vk_pow = f32sum(vr * vr + vi * vi, axis=-1)      # [n_ant] f32
        ak = (jnp.full((n_ant,), alpha_override, jnp.float32)
              if alpha_override is not None
              else per_antenna_alpha(ibo_db, vk_pow, n_sc, n_ant))
        hvr_t = hr * vr - hi * vi                        # H o V terms, st
        hvi_t = hr * vi + hi * vr
        hv_r = f32sum(hvr_t, axis=-2)                    # [n_sc] f32
        hv_i = f32sum(hvi_t, axis=-2)
        akhv_r = f32sum(ak[:, None] * hvr_t, axis=-2)
        akhv_i = f32sum(ak[:, None] * hvi_t, axis=-2)
        hv = jax.lax.complex(hv_r, hv_i)
        akhv = jax.lax.complex(akhv_r, akhv_i)
        hv_noise_scaler = jnp.mean(hv_r * hv_r + hv_i * hv_i)
        akhv_noise_scaler = jnp.mean(akhv_r * akhv_r + akhv_i * akhv_i)

        # PA saturation power under constant IBO
        # (reference/antenna_array.py:313-360)
        avg_gain = jnp.sum(vk_pow) / (n_ant * n_sc)
        sat_pow = 10.0 ** (ibo_db / 10.0) * avg_samp_pow * avg_gain
        toi_coeff = (pa.toi_to_cubic_coeff(ibo_db, avg_samp_pow * avg_gain)
                     if pa_model == "toi" else 0.0)

        # --- clean run (reference/mp_model.py:136-175): the TX (I)FFT
        # round-trip is an identity without the PA, so propagation reduces
        # to the combined H o V vector (see link.make_frame_fn) ---
        if incl_clean:
            bits_c = bits_ops.random_payload_bits(k_bits_c, n_bits)
            sym_c = transmit.modulate_users(bits_c, m)
            rx_c = sym_c * hv
            rx_c = noise_ops.awgn(k_noise_c, rx_c, snr_db,
                                  avg_sym_pow * hv_noise_scaler)
            rx_c = rx_c / hv
            rx_bits_c = receivers.standard_receive_sc(rx_c, m)
            clean_err = bits_ops.count_bit_errors(bits_c, rx_bits_c)
        else:
            clean_err = jnp.zeros((), jnp.int32)

        # --- distorted run (reference/mp_model.py:180-222), all planar ---
        def pa_planar(tr, ti):
            return pa.apply_pa_planar(tr, ti, pa_model, sat_pow,
                                      cfg.pa.rapp_p_hardness, toi_coeff)

        def tx_propagate(sym):
            """Planar precode -> fused IFFT/PA/FFT -> channel combine for
            ``[n_sc]`` complex symbols -> ``[n_sc]`` complex received signal
            (pre-noise, pre-AGC). Shared by the distorted TX and the MCNC
            replica, which re-runs the whole chain per iteration
            (``reference/corrector.py:198-205``)."""
            sr = jnp.real(sym).astype(st)
            si = jnp.imag(sym).astype(st)
            pr = sr * vr - si * vi                       # precode, [n_ant, n_sc] st
            pi_ = sr * vi + si * vr
            fr, fi = mxu_fft.fused_sc_ifft_pa_fft_planar_io(
                pr, pi_, pa_planar, n_fft, storage=storage)
            # propagate: sum_ant H o X (reference/channel.py:74-89), f32 accum
            rx_r = f32sum(hr * fr - hi * fi, axis=-2)
            rx_i = f32sum(hr * fi + hi * fr, axis=-2)
            return jax.lax.complex(rx_r, rx_i)

        bits_d = bits_ops.random_payload_bits(k_bits_d, n_bits)
        sym_d = transmit.modulate_users(bits_d, m)
        rx_d = noise_ops.awgn(k_noise_d, tx_propagate(sym_d), snr_db,
                              avg_sym_pow * akhv_noise_scaler)
        rx_sc = rx_d / akhv

        if cfg.rx.algorithm == "cnc":
            replica = receivers.make_cnc_replica(
                m, n_fft, n_sc, ibo_db, pa_model,
                alpha=alpha_override, rapp_p=cfg.pa.rapp_p_hardness,
                use_mxu_fft=cfg.use_mxu_fft, mxu_storage=cfg.mxu_fft_storage)
            bits_all, _ = receivers.cnc_iterate(rx_sc, n_iters, m, replica)
        elif cfg.rx.algorithm == "mcnc":
            # MCNC replica = the same planar TX chain + AGC divide
            replica = lambda det_sym: tx_propagate(det_sym) / akhv
            bits_all, _ = receivers.cnc_iterate(rx_sc, n_iters, m, replica)
        else:  # "none"
            one = receivers.standard_receive_sc(rx_sc, m)
            bits_all = jnp.broadcast_to(one, (n_iters + 1, n_bits))

        dist_err = bits_ops.count_bit_errors(bits_d, bits_all, axis=-1)
        return FrameCounters(clean_err=clean_err, dist_err=dist_err)

    if ibo_as_arg:
        return _frame

    def frame_fn(key: Array, snr_db: Array, tx_pos: Array) -> FrameCounters:
        return _frame(key, snr_db, tx_pos, cfg.pa.ibo_db)

    return frame_fn
