"""LDPC-coded link — the TPU-native ``LinkLdpc``
(``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py``).

One OFDM frame carries exactly one codeword: ``N = n_sub_carr *
bits_per_symbol`` coded bits, ``K = N * rate`` info bits (the reference
sizes the transport block as ``n_bits_per_ofdm_sym * code_rate``,
``mp_ldpc_model.py:99-100``). The RX chain per CNC iteration tap: soft
LLR demap of the corrected symbols with
``noise_var = 2 * avg_symbol_power / snr_lin``
(``mp_ldpc_model.py:121``), negate (``mp_ldpc_model.py:168-169``:
demapper positive = bit 1, decoder positive = bit 0), min-sum LDPC
decode, count info-bit errors.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from mimo_ofdm_tpu.ops import bits as bits_ops
from mimo_ofdm_tpu.ops import ldpc, noise as noise_ops, ofdm, pa, qam
from mimo_ofdm_tpu.models import agc as agc_mod
from mimo_ofdm_tpu.models import channels, precoding, receivers, transmit
from mimo_ofdm_tpu.models.link import link_static, make_channel_fn
from mimo_ofdm_tpu.utils.config import LinkConfig


class CodedFrameCounters(NamedTuple):
    clean_err: Array    # scalar int32 — coded clean run
    dist_err: Array     # [n_iters + 1] int32 — per CNC iteration tap


def code_for_modem(cfg: LinkConfig, code_rate: float = 0.5,
                   m_b: int = 12) -> ldpc.QcLdpcCode:
    """Build a QC-LDPC code whose codeword fills one OFDM frame."""
    n_coded = cfg.modem.n_bits_per_ofdm_sym
    k_b = round(m_b * code_rate / (1.0 - code_rate))
    n_b = k_b + m_b
    if n_coded % n_b:
        raise ValueError(f"n_bits_per_ofdm_sym={n_coded} not divisible by "
                         f"n_b={n_b}; adjust m_b or modem size")
    z = n_coded // n_b
    return ldpc.make_default_code(k_b=k_b, m_b=m_b, z=z)


def make_coded_frame_fn(cfg: LinkConfig, n_iters: int,
                        code: ldpc.QcLdpcCode | None = None,
                        ldpc_iters: int = 25, *, incl_clean: bool = True,
                        reroll: bool = True, dtype=jnp.complex64):
    """Per-frame coded simulator
    ``frame_fn(key, snr_db, tx_pos) -> CodedFrameCounters``."""
    if code is None:
        code = code_for_modem(cfg)
    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements
    ibo_db = cfg.pa.ibo_db
    avg_sym_pow = cfg.modem.avg_symbol_power
    avg_samp_pow = cfg.modem.avg_sample_power
    pa_model = cfg.pa.model
    assert code.n == cfg.modem.n_bits_per_ofdm_sym

    _, freqs, rx_base = link_static(cfg, dtype)
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)
    channel_fn = make_channel_fn(cfg, freqs_sc, rx_base, reroll, dtype)
    precoder = precoding.make_precoder(cfg.precoding, cfg.modem.n_users)

    def decode_count(sym, info_bits, snr_db):
        # noise_var = 2 * avg_sym_pow / snr_lin (mp_ldpc_model.py:121)
        nv = 2.0 * avg_sym_pow / (10.0 ** (snr_db / 10.0))
        llr = qam.soft_llr(sym, m, nv)
        hard = ldpc.decode(code, -llr, n_iters=ldpc_iters)
        return bits_ops.count_bit_errors(info_bits, hard)

    def frame_fn(key: Array, snr_db: Array, tx_pos: Array) -> CodedFrameCounters:
        k_chan, k_info_c, k_info_d, k_noise_c, k_noise_d = jax.random.split(key, 5)

        h_sc = channel_fn(k_chan, tx_pos)
        v = precoder(h_sc)
        sat_pow = precoding.pa_sat_power(ibo_db, avg_samp_pow, v)
        agc = agc_mod.compute_agc_sc(h_sc, v, ibo_db, n_ant)

        # --- clean coded run ---
        if incl_clean:
            info_c = jax.random.bernoulli(k_info_c, 0.5,
                                          (code.k,)).astype(jnp.int8)
            coded_c = ldpc.encode(code, info_c)
            sym_c = qam.modulate_bits(coded_c, m, dtype)
            tx_sc = transmit.precode_symbols(sym_c, v)
            rx = channels.propagate(h_sc, tx_sc)
            rx = noise_ops.awgn(k_noise_c, rx, snr_db,
                                avg_sym_pow * agc.hk_vk_noise_scaler)
            rx = rx / agc.hk_vk_agc_sc
            clean_err = decode_count(rx, info_c, snr_db)
        else:
            clean_err = jnp.zeros((), jnp.int32)

        # --- distorted coded run with CNC/MCNC symbol taps ---
        info_d = jax.random.bernoulli(k_info_d, 0.5, (code.k,)).astype(jnp.int8)
        coded_d = ldpc.encode(code, info_d)
        fd_dist_sc = transmit.array_transmit_sc(
            coded_d, constel_size=m, n_fft=n_fft, v=v, pa_model=pa_model,
            sat_power=sat_pow, rapp_p=cfg.pa.rapp_p_hardness,
            use_mxu_fft=cfg.use_mxu_fft,
            mxu_storage=cfg.mxu_fft_storage, dtype=dtype)
        rx_d = channels.propagate(h_sc, fd_dist_sc)
        rx_d = noise_ops.awgn(k_noise_d, rx_d, snr_db,
                              avg_sym_pow * agc.ak_hk_vk_noise_scaler)
        rx_sc = rx_d / agc.ak_hk_vk_agc_sc

        if cfg.rx.algorithm == "mcnc":
            replica = receivers.make_mcnc_replica(
                h_sc, v, agc.ak_hk_vk_agc_sc, constel_size=m, n_fft=n_fft,
                n_sc=n_sc, pa_model=pa_model, sat_power=sat_pow,
                rapp_p=cfg.pa.rapp_p_hardness, use_mxu_fft=cfg.use_mxu_fft,
                mxu_storage=cfg.mxu_fft_storage)
        else:
            replica = receivers.make_cnc_replica(m, n_fft, n_sc, ibo_db,
                                                 pa_model,
                                                 use_mxu_fft=cfg.use_mxu_fft,
                mxu_storage=cfg.mxu_fft_storage)
        corr_all = receivers.cnc_iterate_soft(rx_sc, n_iters, m, replica)

        def per_tap(sym):
            return decode_count(sym, info_d, snr_db)

        dist_err = jax.lax.map(per_tap, corr_all)
        return CodedFrameCounters(clean_err=clean_err, dist_err=dist_err)

    return frame_fn


def select_base_graph(a: int, rate: float) -> int:
    """38.212 §7.2.2 base-graph selection: BG2 for small/low-rate blocks,
    BG1 otherwise (mirrors ``nrDLSCHInfo``'s bgn,
    ``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:104``)."""
    if a <= 292 or rate <= 0.25 or (a <= 3824 and rate <= 0.67):
        return 2
    return 1


def transport_chain_for_modem(cfg: LinkConfig, code_rate: float = 0.5,
                              n_blocks: int = 4, rv: int = 0,
                              family: str = "nr", bg: int | None = None):
    """Build a transport chain whose rate-matched output fills one OFDM
    frame (the reference sizes its transport block from the frame bit
    budget, ``mp_ldpc_model.py:99-104``).

    ``family="nr"`` (default): 5G-NR LDPC per TS 38.212 — base graph
    selected by §7.2.2 (override with ``bg``), Kcb segmentation, lifting-
    set Zc selection, 2Zc puncturing and rv k0 offsets
    (:mod:`mimo_ofdm_tpu.ops.nr_ldpc`). ``family="ira"``: the
    self-contained accumulator QC code sized so roughly ``n_blocks`` code
    blocks segment the transport block."""
    from mimo_ofdm_tpu.ops import transport as tp
    e_total = cfg.modem.n_bits_per_ofdm_sym
    if family == "nr":
        if bg is None:
            a_est = int(np.floor(code_rate * e_total)) - 24
            bg = select_base_graph(a_est, code_rate)
        return tp.make_nr_transport_chain(e_total, bg=bg,
                                          target_rate=code_rate, rv=rv)
    z = max(4, int(round(e_total * code_rate / n_blocks / 12)))
    code = ldpc.make_default_code(k_b=12, m_b=12, z=z)
    return tp.make_transport_chain(code, e_total=e_total,
                                   target_rate=code_rate, rv=rv)


class TransportFrameCounters(NamedTuple):
    clean_err: Array    # scalar int32 — payload bit errors, clean run
    clean_blk: Array    # scalar int32 — transport blocks in error (CRC fail)
    dist_err: Array     # [n_iters + 1] int32 per CNC iteration tap
    dist_blk: Array     # [n_iters + 1] int32 per CNC iteration tap


def make_transport_frame_fn(cfg: LinkConfig, n_iters: int,
                            chain, ldpc_iters: int = 25, *,
                            ldpc_algorithm: str = "minsum",
                            incl_clean: bool = True, reroll: bool = True,
                            return_llrs: bool = False,
                            nv_adjust: bool = False,
                            dtype=jnp.complex64):
    """Coded frame with the full transport chain — CRC24A attach, code-block
    segmentation (+CRC24B), QC-LDPC encode per block and circular-buffer
    rate matching filling the OFDM frame exactly — the native equivalent of
    the reference's MATLAB DL-SCH pipeline
    (``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:149-179``). Counts
    payload bit errors and transport-block errors (via the TB CRC) per CNC
    iteration tap.

    With ``return_llrs=True`` the frame skips the LDPC decode and instead
    returns ``(payload_clean, llr_clean, payload_dist, llr_taps)`` in the
    decoder's sign convention — used by the ``serial_decode`` round, which
    runs the decode outside the batch vmap (see
    :func:`make_transport_round_fn`)."""
    from mimo_ofdm_tpu.ops import transport as tp

    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements
    ibo_db = cfg.pa.ibo_db
    avg_sym_pow = cfg.modem.avg_symbol_power
    avg_samp_pow = cfg.modem.avg_sample_power
    pa_model = cfg.pa.model
    assert chain.e_total == cfg.modem.n_bits_per_ofdm_sym

    _, freqs, rx_base = link_static(cfg, dtype)
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)
    channel_fn = make_channel_fn(cfg, freqs_sc, rx_base, reroll, dtype)
    precoder = precoding.make_precoder(cfg.precoding, cfg.modem.n_users)

    def decoder_llr(sym, snr_db):
        """Demapper LLRs in the decoder's sign convention (the reference
        negates before ``nrLDPCDecode``, ``mp_ldpc_model.py:168-169``)."""
        nv = 2.0 * avg_sym_pow / (10.0 ** (snr_db / 10.0))
        return -qam.soft_llr(sym, m, nv)

    def decoder_llr_nvadj(sym, snr_db):
        """Noise-variance-**adjusted** demapper LLRs — the ``nvadj_ldpc``
        result variant (committed
        ``figs/csv_results/nvadj_ldpc_3_4_ber_vs_ebn0_{cnc,mcnc}_quadriga_*``;
        generator script lost). Instead of the fixed thermal
        ``2 * avg_sym_pow / snr_lin`` (``mp_ldpc_model.py:121``), the
        demapper variance is the *measured* per-tap error power
        ``mean |sym - harddet(sym)|^2`` over the frame's data subcarriers
        — a data-aided estimate of thermal noise **plus the residual
        (uncancelled) PA distortion** at that CNC tap, floored by the
        thermal term so deep-cliff taps never under-weight the noise.
        Both arms of the floor use the reference's deliberate 2x noise
        scale (``mp_ldpc_model.py:121`` doubles the true post-AGC noise
        power), so the LLR scaling is continuous across the floor and
        the thermal-limited limit matches the non-adjusted decoder."""
        det, _ = qam.detect_symbols_and_bits(sym, m, dtype=sym.dtype)
        measured = 2.0 * jnp.mean(jnp.abs(sym - det) ** 2)
        nv_thermal = 2.0 * avg_sym_pow / (10.0 ** (snr_db / 10.0))
        return -qam.soft_llr(sym, m, jnp.maximum(measured, nv_thermal))

    def decode_count(sym, payload, snr_db, adjust=False):
        llr = (decoder_llr_nvadj(sym, snr_db) if adjust
               else decoder_llr(sym, snr_db))
        rx, ok = tp.transport_decode(chain, llr,
                                     n_iters=ldpc_iters,
                                     algorithm=ldpc_algorithm)
        bit_err = bits_ops.count_bit_errors(payload, rx)
        blk_err = (~ok).astype(jnp.int32)
        return bit_err, blk_err

    def frame_fn(key: Array, snr_db: Array, tx_pos: Array) -> TransportFrameCounters:
        k_chan, k_info_c, k_info_d, k_noise_c, k_noise_d = jax.random.split(key, 5)

        h_sc = channel_fn(k_chan, tx_pos)
        v = precoder(h_sc)
        sat_pow = precoding.pa_sat_power(ibo_db, avg_samp_pow, v)
        agc = agc_mod.compute_agc_sc(h_sc, v, ibo_db, n_ant)

        if incl_clean:
            pay_c = jax.random.bernoulli(k_info_c, 0.5,
                                         (chain.a,)).astype(jnp.int8)
            coded_c = tp.transport_encode(chain, pay_c)
            sym_c = qam.modulate_bits(coded_c, m, dtype)
            tx_sc = transmit.precode_symbols(sym_c, v)
            rx = channels.propagate(h_sc, tx_sc)
            rx = noise_ops.awgn(k_noise_c, rx, snr_db,
                                avg_sym_pow * agc.hk_vk_noise_scaler)
            rx = rx / agc.hk_vk_agc_sc
            if return_llrs:
                clean_llr = decoder_llr(rx, snr_db)
            else:
                clean_err, clean_blk = decode_count(rx, pay_c, snr_db)
        else:
            pay_c = jnp.zeros((chain.a,), jnp.int8)
            clean_llr = jnp.zeros((chain.e_total,), jnp.float32)
            clean_err = jnp.zeros((), jnp.int32)
            clean_blk = jnp.zeros((), jnp.int32)

        pay_d = jax.random.bernoulli(k_info_d, 0.5, (chain.a,)).astype(jnp.int8)
        coded_d = tp.transport_encode(chain, pay_d)
        fd_dist_sc = transmit.array_transmit_sc(
            coded_d, constel_size=m, n_fft=n_fft, v=v, pa_model=pa_model,
            sat_power=sat_pow, rapp_p=cfg.pa.rapp_p_hardness,
            use_mxu_fft=cfg.use_mxu_fft,
            mxu_storage=cfg.mxu_fft_storage, dtype=dtype)
        rx_d = channels.propagate(h_sc, fd_dist_sc)
        rx_d = noise_ops.awgn(k_noise_d, rx_d, snr_db,
                              avg_sym_pow * agc.ak_hk_vk_noise_scaler)
        rx_sc = rx_d / agc.ak_hk_vk_agc_sc

        if cfg.rx.algorithm == "mcnc":
            replica = receivers.make_mcnc_replica(
                h_sc, v, agc.ak_hk_vk_agc_sc, constel_size=m, n_fft=n_fft,
                n_sc=n_sc, pa_model=pa_model, sat_power=sat_pow,
                rapp_p=cfg.pa.rapp_p_hardness, use_mxu_fft=cfg.use_mxu_fft,
                mxu_storage=cfg.mxu_fft_storage)
        else:
            replica = receivers.make_cnc_replica(m, n_fft, n_sc, ibo_db,
                                                 pa_model,
                                                 use_mxu_fft=cfg.use_mxu_fft,
                mxu_storage=cfg.mxu_fft_storage)
        corr_all = receivers.cnc_iterate_soft(rx_sc, n_iters, m, replica)

        if return_llrs:
            tap_fn = decoder_llr_nvadj if nv_adjust else decoder_llr
            tap_llrs = jax.vmap(lambda sym: tap_fn(sym, snr_db))(corr_all)
            return pay_c, clean_llr, pay_d, tap_llrs
        dist_err, dist_blk = jax.lax.map(
            lambda sym: decode_count(sym, pay_d, snr_db, adjust=nv_adjust),
            corr_all)
        return TransportFrameCounters(clean_err=clean_err, clean_blk=clean_blk,
                                      dist_err=dist_err, dist_blk=dist_blk)

    return frame_fn


def make_transport_inloop_frame_fn(cfg: LinkConfig, n_iters: int, chain,
                                   ldpc_iters: int = 25, *,
                                   ldpc_algorithm: str = "sumprod",
                                   incl_clean: bool = True,
                                   reroll: bool = True,
                                   dtype=jnp.complex64):
    """LDPC-**in-the-loop** CNC/MCNC receiver frame.

    The plain coded receiver (:func:`make_transport_frame_fn`) runs the
    CNC loop on *hard-detected symbols* (``reference/corrector.py:78``)
    and only decodes the per-iteration taps afterwards
    (``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:232-252``). This
    variant instead decodes **inside** every cancellation iteration:

        corrected -> soft demap -> LDPC decode -> re-encode the decoded
        payload -> re-modulate -> feed the replica

    so the replica input is the decoder's (usually error-free above the
    cliff, decoder-biased below it) codeword instead of raw hard
    decisions. This is the protocol behind the reference's committed
    ``figs/csv_results/ldpc_in_loop_ber_vs_ebn0_{cnc,mcnc}_los_nant16_*``
    results, whose generator script no longer survives; the CSV shape
    (clean + ite0 + niter 1..3 rows, byte-identical clean/ite0 rows to the
    legacy ``ldpc_ber_vs_ebn0_*`` family) pins the row semantics, and the
    iteration skeleton is ``reference/corrector.py:52-112`` with the
    detection step replaced by the decode/re-encode round trip.

    Counter layout: ``dist_err[0]`` = standard decode (no cancellation),
    ``dist_err[i]`` = decode after ``i`` in-loop iterations.
    """
    from mimo_ofdm_tpu.ops import transport as tp

    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements
    ibo_db = cfg.pa.ibo_db
    avg_sym_pow = cfg.modem.avg_symbol_power
    avg_samp_pow = cfg.modem.avg_sample_power
    pa_model = cfg.pa.model
    assert chain.e_total == cfg.modem.n_bits_per_ofdm_sym

    _, freqs, rx_base = link_static(cfg, dtype)
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)
    channel_fn = make_channel_fn(cfg, freqs_sc, rx_base, reroll, dtype)
    precoder = precoding.make_precoder(cfg.precoding, cfg.modem.n_users)

    def decoder_llr(sym, snr_db):
        nv = 2.0 * avg_sym_pow / (10.0 ** (snr_db / 10.0))
        return -qam.soft_llr(sym, m, nv)

    def frame_fn(key: Array, snr_db: Array, tx_pos: Array) -> TransportFrameCounters:
        k_chan, k_info_c, k_info_d, k_noise_c, k_noise_d = jax.random.split(key, 5)

        h_sc = channel_fn(k_chan, tx_pos)
        v = precoder(h_sc)
        sat_pow = precoding.pa_sat_power(ibo_db, avg_samp_pow, v)
        agc = agc_mod.compute_agc_sc(h_sc, v, ibo_db, n_ant)

        if incl_clean:
            pay_c = bits_ops.random_payload_bits(k_info_c, chain.a)
            coded_c = tp.transport_encode(chain, pay_c)
            sym_c = qam.modulate_bits(coded_c, m, dtype)
            tx_sc = transmit.precode_symbols(sym_c, v)
            rx = channels.propagate(h_sc, tx_sc)
            rx = noise_ops.awgn(k_noise_c, rx, snr_db,
                                avg_sym_pow * agc.hk_vk_noise_scaler)
            rx = rx / agc.hk_vk_agc_sc
            hat_c, ok_c = tp.transport_decode(chain, decoder_llr(rx, snr_db),
                                              n_iters=ldpc_iters,
                                              algorithm=ldpc_algorithm)
            clean_err = bits_ops.count_bit_errors(pay_c, hat_c)
            clean_blk = (~ok_c).astype(jnp.int32)
        else:
            clean_err = jnp.zeros((), jnp.int32)
            clean_blk = jnp.zeros((), jnp.int32)

        pay_d = bits_ops.random_payload_bits(k_info_d, chain.a)
        coded_d = tp.transport_encode(chain, pay_d)
        fd_dist_sc = transmit.array_transmit_sc(
            coded_d, constel_size=m, n_fft=n_fft, v=v, pa_model=pa_model,
            sat_power=sat_pow, rapp_p=cfg.pa.rapp_p_hardness,
            use_mxu_fft=cfg.use_mxu_fft,
            mxu_storage=cfg.mxu_fft_storage, dtype=dtype)
        rx_d = channels.propagate(h_sc, fd_dist_sc)
        rx_d = noise_ops.awgn(k_noise_d, rx_d, snr_db,
                              avg_sym_pow * agc.ak_hk_vk_noise_scaler)
        rx_sc = rx_d / agc.ak_hk_vk_agc_sc

        if cfg.rx.algorithm == "mcnc":
            replica = receivers.make_mcnc_replica(
                h_sc, v, agc.ak_hk_vk_agc_sc, constel_size=m, n_fft=n_fft,
                n_sc=n_sc, pa_model=pa_model, sat_power=sat_pow,
                rapp_p=cfg.pa.rapp_p_hardness, use_mxu_fft=cfg.use_mxu_fft,
                mxu_storage=cfg.mxu_fft_storage)
        else:
            replica = receivers.make_cnc_replica(
                m, n_fft, n_sc, ibo_db, pa_model,
                use_mxu_fft=cfg.use_mxu_fft, mxu_storage=cfg.mxu_fft_storage)

        def body(d_est, _):
            corr = rx_sc - d_est
            pay_hat, ok = tp.transport_decode(chain, decoder_llr(corr, snr_db),
                                              n_iters=ldpc_iters,
                                              algorithm=ldpc_algorithm)
            bit_err = bits_ops.count_bit_errors(pay_d, pay_hat)
            blk_err = (~ok).astype(jnp.int32)
            resym = qam.modulate_bits(tp.transport_encode(chain, pay_hat),
                                      m, dtype)
            est = replica(resym)
            return est - resym, (bit_err, blk_err)

        _, (dist_err, dist_blk) = jax.lax.scan(
            body, jnp.zeros_like(rx_sc), None, length=n_iters + 1)
        return TransportFrameCounters(clean_err=clean_err, clean_blk=clean_blk,
                                      dist_err=dist_err, dist_blk=dist_blk)

    return frame_fn


def make_transport_inloop_round_fn(cfg: LinkConfig, n_iters: int, batch: int,
                                   chain, ldpc_iters: int = 25, *,
                                   ldpc_algorithm: str = "sumprod",
                                   incl_clean: bool = True,
                                   reroll: bool = True,
                                   dtype=jnp.complex64):
    """Jitted LDPC-in-the-loop Monte-Carlo round summed over ``batch``
    frames (see :func:`make_transport_inloop_frame_fn`)."""
    frame_fn = make_transport_inloop_frame_fn(
        cfg, n_iters, chain, ldpc_iters, ldpc_algorithm=ldpc_algorithm,
        incl_clean=incl_clean, reroll=reroll, dtype=dtype)
    tx_pos = link_static(cfg, dtype)[0]

    @jax.jit
    def round_fn(key: Array, snr_db: Array) -> TransportFrameCounters:
        keys = jax.random.split(key, batch)
        counters = jax.vmap(frame_fn, in_axes=(0, None, None))(keys, snr_db,
                                                               tx_pos)
        return jax.tree.map(lambda x: jnp.sum(x, axis=0, dtype=jnp.int32),
                            counters)

    return round_fn


def make_transport_round_fn(cfg: LinkConfig, n_iters: int, batch: int,
                            chain, ldpc_iters: int = 25, *,
                            ldpc_algorithm: str = "minsum",
                            incl_clean: bool = True, reroll: bool = True,
                            serial_decode: int = 0, nv_adjust: bool = False,
                            dtype=jnp.complex64):
    """Jitted transport-coded Monte-Carlo round summed over ``batch``
    frames.

    ``serial_decode`` (chunk size, 0 = off) keeps the OFDM/PA/CNC chain
    vmapped over the batch but runs the LDPC decode as a chunked
    ``lax.map`` over the flattened (frame, tap, code-block) items. The
    Mosaic backend behind the remote compile helper SIGSEGVs on the
    fully-batched sum-product decoder for some code shapes (observed:
    BG1 Zc=224, the rate-3/4 and 7/8 C=2 transport chains, any batch
    >= 2); chunk-16 bodies with the decoder's ``fusion_barrier`` compile
    and cost ~20x less wall time than chunk 1. Statistics are identical
    — only the device schedule changes."""
    body = make_transport_body_fn(cfg, n_iters, chain, ldpc_iters,
                                  ldpc_algorithm=ldpc_algorithm,
                                  incl_clean=incl_clean, reroll=reroll,
                                  serial_decode=serial_decode,
                                  nv_adjust=nv_adjust, dtype=dtype)
    tx_pos = link_static(cfg, dtype)[0]

    @jax.jit
    def round_fn(key: Array, snr_db: Array) -> TransportFrameCounters:
        keys = jax.random.split(key, batch)
        return body(keys, snr_db, tx_pos)

    return round_fn


def make_transport_body_fn(cfg: LinkConfig, n_iters: int,
                           chain, ldpc_iters: int = 25, *,
                           ldpc_algorithm: str = "minsum",
                           incl_clean: bool = True, reroll: bool = True,
                           serial_decode: int = 0, nv_adjust: bool = False,
                           dtype=jnp.complex64):
    """Unjitted transport-round body ``body(keys [batch], snr_db,
    tx_pos) -> TransportFrameCounters`` (counters summed over the key
    batch). Shared by :func:`make_transport_round_fn` (single device)
    and :func:`mimo_ofdm_tpu.parallel.sharded.make_sharded_transport_round_fn`
    (per-device shard inside ``shard_map``, keys pre-split so sharded and
    unsharded rounds are counter-identical for the same master key)."""
    from mimo_ofdm_tpu.ops import transport as tp

    frame_fn = make_transport_frame_fn(cfg, n_iters, chain, ldpc_iters,
                                       ldpc_algorithm=ldpc_algorithm,
                                       incl_clean=incl_clean, reroll=reroll,
                                       return_llrs=serial_decode,
                                       nv_adjust=nv_adjust,
                                       dtype=dtype)

    if not serial_decode:
        def body(keys: Array, snr_db: Array,
                 tx_pos: Array) -> TransportFrameCounters:
            counters = jax.vmap(frame_fn, in_axes=(0, None, None))(
                keys, snr_db, tx_pos)
            return jax.tree.map(
                lambda x: jnp.sum(x, axis=0, dtype=jnp.int32), counters)

        return body

    n_taps = n_iters + 1

    def body(keys: Array, snr_db: Array,
             tx_pos: Array) -> TransportFrameCounters:
        b = keys.shape[0]   # local batch (may be a per-device shard)
        pay_c, llr_c, pay_d, llr_d = jax.vmap(
            frame_fn, in_axes=(0, None, None))(keys, snr_db, tx_pos)
        # [b, E] clean + [b, n_taps, E] dist -> flat item axis
        flat = llr_d.reshape(b * n_taps, chain.e_total)
        if incl_clean:
            flat = jnp.concatenate([llr_c, flat], axis=0)

        rx, ok = tp.transport_decode(chain, flat, n_iters=ldpc_iters,
                                     algorithm=ldpc_algorithm,
                                     serial_blocks=int(serial_decode))
        n_clean = b if incl_clean else 0
        if incl_clean:
            clean_err = jnp.sum(bits_ops.count_bit_errors(
                pay_c, rx[:n_clean], axis=-1), dtype=jnp.int32)
            clean_blk = jnp.sum((~ok[:n_clean]).astype(jnp.int32))
        else:
            clean_err = jnp.zeros((), jnp.int32)
            clean_blk = jnp.zeros((), jnp.int32)
        rx_d = rx[n_clean:].reshape(b, n_taps, chain.a)
        ok_d = ok[n_clean:].reshape(b, n_taps)
        dist_err = jnp.sum(bits_ops.count_bit_errors(
            pay_d[:, None, :], rx_d, axis=-1), axis=0, dtype=jnp.int32)
        dist_blk = jnp.sum((~ok_d).astype(jnp.int32), axis=0)
        return TransportFrameCounters(clean_err=clean_err, clean_blk=clean_blk,
                                      dist_err=dist_err, dist_blk=dist_blk)

    return body


def make_coded_round_fn(cfg: LinkConfig, n_iters: int, batch: int,
                        code: ldpc.QcLdpcCode | None = None,
                        ldpc_iters: int = 25, *, incl_clean: bool = True,
                        reroll: bool = True, dtype=jnp.complex64):
    """Jitted coded Monte-Carlo round summed over ``batch`` frames."""
    frame_fn = make_coded_frame_fn(cfg, n_iters, code, ldpc_iters,
                                   incl_clean=incl_clean, reroll=reroll,
                                   dtype=dtype)
    tx_pos = link_static(cfg, dtype)[0]

    @jax.jit
    def round_fn(key: Array, snr_db: Array) -> CodedFrameCounters:
        keys = jax.random.split(key, batch)
        counters = jax.vmap(frame_fn, in_axes=(0, None, None))(keys, snr_db,
                                                               tx_pos)
        return jax.tree.map(lambda x: jnp.sum(x, axis=0, dtype=jnp.int32),
                            counters)

    return round_fn
