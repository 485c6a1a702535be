"""End-to-end link tests: BER against closed forms and the scientific
invariants the reference validates by literature reproduction
(SURVEY.md section 4). Small FFT sizes keep CPU runtime low; the physics
is size-invariant."""

import numpy as np
import jax
import pytest

from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig, LinkConfig,
                                        ModemConfig, PaConfig, RxConfig,
                                        SweepConfig)
from mimo_ofdm_tpu.parallel.montecarlo import run_ber_sweep, run_point
from mimo_ofdm_tpu.models.link import make_round_fn
from mimo_ofdm_tpu.ops.metrics import qam_awgn_ber_theory


def small_cfg(**kw):
    base = dict(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128, cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="los"),
        precoding="mrt",
        pa=PaConfig(model="softlim", ibo_db=0.0),
        rx=RxConfig(algorithm="cnc"),
    )
    base.update(kw)
    return LinkConfig(**base)


def sweep_one(ebn0, n_err=1500, bits=1_500_000, batch=16):
    return SweepConfig(ebn0_min=ebn0, ebn0_max=ebn0, ebn0_step=1.0,
                       n_err_min=n_err, bits_sent_max=bits, batch_frames=batch)


def effective_ebn0(ebn0, cfg):
    """With the canonical reference conversion (noise referenced to the
    data band: ``ebn0_to_snr(ebn0, n_sub_carr, n_sub_carr, M)``, see
    ``reference/main_miso_cnc_ber_vs_ebn0.py:99``), the textbook Eb/N0
    equals the swept Eb/N0 directly."""
    return ebn0


def test_siso_awgn_clean_ber_matches_theory():
    cfg = small_cfg(modem=ModemConfig(constel_size=16, n_fft=256, n_sub_carr=128,
                                      cp_len=16),
                    array=ArrayConfig(n_elements=1),
                    channel=ChannelConfig(model="awgn"), precoding="none")
    res = run_ber_sweep(cfg, sweep_one(8.0), n_iters=1, seed=0)
    ber = res.ber_matrix[0, 0]
    th = qam_awgn_ber_theory(16, effective_ebn0(8.0, cfg))
    assert ber == pytest.approx(th, rel=0.15)


def test_miso_los_mrt_clean_ber_matches_theory():
    """MRT + AGC + noise-scaler bookkeeping must preserve the requested
    SNR exactly regardless of array gain (the constant-IBO chain of
    ``reference/mp_model.py:290-329``)."""
    cfg = small_cfg()
    res = run_ber_sweep(cfg, sweep_one(15.0), n_iters=1, seed=1)
    th = qam_awgn_ber_theory(64, effective_ebn0(15.0, cfg))
    assert res.ber_matrix[0, 0] == pytest.approx(th, rel=0.2)


def test_cnc_improves_monotonically_on_los():
    """CNC iteration gain on a frequency-flat channel — the headline
    result of the Ochiai CNC paper reproduced by
    ``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ebn0.py``."""
    cfg = small_cfg()
    res = run_ber_sweep(cfg, sweep_one(15.0), n_iters=4, seed=2)
    ber = res.ber_matrix[:, 0]
    clean, it = ber[0], ber[1:]
    assert it[0] > 2 * clean            # clipping hurts at IBO 0 dB
    assert it[4] < 0.7 * it[0]          # CNC recovers a large fraction
    assert np.all(np.diff(it) <= 1e-3)  # monotone (within MC noise)


def test_mcnc_converges_on_rayleigh_where_cnc_does_not():
    """Frequency-selective fading decorrelates the single-PA CNC replica;
    the full-chain MCNC replica still converges (the core claim of the
    MCNC extension, ``reference/corrector.py:115-207``)."""
    cfg_c = small_cfg(channel=ChannelConfig(model="rayleigh"))
    cfg_m = small_cfg(channel=ChannelConfig(model="rayleigh"),
                      rx=RxConfig(algorithm="mcnc"))
    res_c = run_ber_sweep(cfg_c, sweep_one(15.0), n_iters=3, seed=3)
    res_m = run_ber_sweep(cfg_m, sweep_one(15.0), n_iters=3, seed=3)
    ber_c, ber_m = res_c.ber_matrix[:, 0], res_m.ber_matrix[:, 0]
    # MCNC improves over no-cancellation; CNC does not on Rayleigh
    assert ber_m[4] < 0.7 * ber_m[1]
    assert ber_m[4] < ber_c[4]
    # MCNC approaches the clean bound
    assert ber_m[4] < 1.5 * ber_m[0]


def test_determinism_same_seed_same_counters():
    cfg = small_cfg(array=ArrayConfig(n_elements=4))
    round_fn = make_round_fn(cfg, 2, 8)
    key = jax.random.key(42)
    c1 = round_fn(key, 12.0)
    c2 = round_fn(key, 12.0)
    assert int(c1.clean_err) == int(c2.clean_err)
    np.testing.assert_array_equal(np.asarray(c1.dist_err), np.asarray(c2.dist_err))


def test_run_point_stop_criteria():
    cfg = small_cfg(array=ArrayConfig(n_elements=2))
    round_fn = make_round_fn(cfg, 1, 4)
    pt = run_point(round_fn, jax.random.key(0), 10.0, n_counters=3,
                   n_bits_per_frame=cfg.modem.n_bits_per_ofdm_sym, batch=4,
                   n_err_min=100, bits_sent_max=10_000_000)
    assert np.all((pt.n_err >= 100) | (pt.n_bits >= 10_000_000))
    assert pt.n_rounds > 0


def test_ber_vs_ibo_ordering():
    """Higher IBO (more backoff) -> less distortion -> lower uncorrected
    BER (``main_miso_cnc_ber_vs_ibo.py`` behavior)."""
    bers = []
    for ibo in (0.0, 5.0):
        cfg = small_cfg(pa=PaConfig(model="softlim", ibo_db=ibo))
        res = run_ber_sweep(cfg, sweep_one(15.0, n_err=800), n_iters=0, seed=4)
        bers.append(res.ber_matrix[1, 0])
    assert bers[1] < bers[0]


def test_csi_error_degrades_ber():
    """CSI error model (``reference/mp_model.py:264-284``) must degrade
    clean BER."""
    cfg0 = small_cfg()
    cfg1 = small_cfg(csi_epsilon=0.4)
    r0 = run_ber_sweep(cfg0, sweep_one(15.0, n_err=800), n_iters=0, seed=5)
    r1 = run_ber_sweep(cfg1, sweep_one(15.0, n_err=800), n_iters=0, seed=5)
    assert r1.ber_matrix[0, 0] > r0.ber_matrix[0, 0]


def test_run_sweep_pipelined_matches_run_point():
    """The cross-point pipelined scheduler derives per-point keys exactly
    like run_point(fold_in(key, i), ...), so with stop criteria that
    aren't mask-stale-sensitive (single round per point) the accumulated
    counters are bit-identical; multi-round points stay deterministic."""
    import jax
    from mimo_ofdm_tpu.parallel.montecarlo import (run_point,
                                                   run_sweep_pipelined)
    cfg = small_cfg()
    round_fn = make_round_fn(cfg, n_iters=2, batch=8)
    key = jax.random.key(11)
    snrs = [8.0, 11.0, 14.0]
    pts = run_sweep_pipelined(round_fn, key, snrs, n_counters=4,
                              n_bits_per_frame=cfg.modem.n_bits_per_ofdm_sym,
                              batch=8, n_err_min=500, bits_sent_max=150_000)
    for i, snr in enumerate(snrs):
        ref = run_point(round_fn, jax.random.fold_in(key, i), snr,
                        n_counters=4,
                        n_bits_per_frame=cfg.modem.n_bits_per_ofdm_sym,
                        batch=8, n_err_min=500, bits_sent_max=150_000)
        np.testing.assert_array_equal(pts[i].n_err, ref.n_err)
        np.testing.assert_array_equal(pts[i].n_bits, ref.n_bits)
    # determinism of the pipelined path itself
    pts2 = run_sweep_pipelined(round_fn, key, snrs, n_counters=4,
                               n_bits_per_frame=cfg.modem.n_bits_per_ofdm_sym,
                               batch=8, n_err_min=500, bits_sent_max=150_000)
    for a, b in zip(pts, pts2):
        np.testing.assert_array_equal(a.n_err, b.n_err)


def test_csi_noise_clean_run_uses_true_channel():
    """Legacy additive-CSI-noise model (csi_snr_db): the clean run must
    propagate through the TRUE channel while equalizing with the
    noisy-CSI AGC (reference/mp_model.py:136-175) — at effectively
    infinite thermal SNR the clean BER is then CSI-limited, not zero.
    Regression for the committed csi_noise_db clean rows."""
    import jax.numpy as jnp
    from mimo_ofdm_tpu.utils.config import PaConfig

    cfg = small_cfg(channel=ChannelConfig(model="rayleigh"),
                    rx=RxConfig(algorithm="none"),
                    pa=PaConfig(model="none", ibo_db=0.0),
                    csi_snr_db=5.0)
    c = make_round_fn(cfg, 1, 64)(jax.random.key(0), jnp.float32(60.0))
    assert int(np.asarray(c.clean_err)) > 100


def test_flat_round_matches_named_counters():
    """make_round_fn(flat=True) returns the identical counters as the
    named-tuple round, pre-packed to [clean, it0..itN] inside the round
    executable (single host fetch; figs/profiling/consume_ab.json)."""
    import jax
    import numpy as np
    from mimo_ofdm_tpu.models.link import make_round_fn
    from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig,
                                            LinkConfig, ModemConfig, PaConfig,
                                            RxConfig)

    cfg = LinkConfig(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128,
                          cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="rayleigh"),
        precoding="mrt", pa=PaConfig(model="softlim", ibo_db=0.0),
        rx=RxConfig(algorithm="cnc"))
    key = jax.random.key(7)
    named = make_round_fn(cfg, n_iters=2, batch=4)(key, 15.0)
    flat = make_round_fn(cfg, n_iters=2, batch=4, flat=True)(key, 15.0)
    expect = np.concatenate([np.atleast_1d(np.asarray(named.clean_err)),
                             np.asarray(named.dist_err)])
    assert np.array_equal(np.asarray(flat), expect)


def test_idx_arg_round_matches_host_foldin():
    """make_round_fn(idx_arg=True) derives fold_in(key, idx) inside the
    executable — bit-identical counters to the host-side fold, one
    dispatch per launch (figs/profiling/foldin_ab.json)."""
    import jax
    import numpy as np
    from mimo_ofdm_tpu.models.link import make_round_fn
    from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig,
                                            LinkConfig, ModemConfig, PaConfig,
                                            RxConfig)

    cfg = LinkConfig(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128,
                          cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="rayleigh"),
        precoding="mrt", pa=PaConfig(model="softlim", ibo_db=0.0),
        rx=RxConfig(algorithm="cnc"))
    key = jax.random.key(11)
    plain = make_round_fn(cfg, n_iters=2, batch=4, flat=True)
    idx = make_round_fn(cfg, n_iters=2, batch=4, flat=True, idx_arg=True)
    for i in (0, 3, 17):
        a = np.asarray(plain(jax.random.fold_in(key, i), 15.0))
        b = np.asarray(idx(key, i, 15.0))
        assert np.array_equal(a, b), i

    # and through the ibo_as_arg variant
    plain_i = make_round_fn(cfg, n_iters=2, batch=4, flat=True,
                            ibo_as_arg=True)
    idx_i = make_round_fn(cfg, n_iters=2, batch=4, flat=True,
                          ibo_as_arg=True, idx_arg=True)
    a = np.asarray(plain_i(jax.random.fold_in(key, 5), 15.0, 0.0))
    b = np.asarray(idx_i(key, 5, 15.0, 0.0))
    assert np.array_equal(a, b)
