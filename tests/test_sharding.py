"""Sharded Monte-Carlo correctness on a virtual 8-device CPU mesh
(SURVEY.md section 4 "multi-host tests ... compare sharded vs
single-device BER counters")."""

import numpy as np
import jax
import pytest

from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig, LinkConfig,
                                        ModemConfig, PaConfig, RxConfig)
from mimo_ofdm_tpu.models.link import make_round_fn
from mimo_ofdm_tpu.parallel.sharded import make_mesh, make_sharded_round_fn


def small_cfg(chan="rayleigh", alg="mcnc"):
    return LinkConfig(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128, cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model=chan),
        precoding="mrt",
        pa=PaConfig(model="softlim", ibo_db=0.0),
        rx=RxConfig(algorithm=alg),
        # layout-exactness tests compare sharded vs single-device on the
        # complex path; the planar channel block is tp-ineligible and would
        # make the single-device side a different (planar) program
        channel_storage="complex64",
    )


needs_8_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                     reason="needs 8 virtual devices")


@needs_8_devices
def test_dp_sharding_bit_identical_to_single_device():
    """Pure trial parallelism must reproduce single-device counters
    bit-exactly (same keys, same math, psum is exact for ints)."""
    cfg = small_cfg()
    key = jax.random.key(3)
    single = make_round_fn(cfg, 3, 16)(key, 15.0)
    mesh = make_mesh(n_dp=8, n_tp=1)
    sharded = make_sharded_round_fn(cfg, 3, 16, mesh)(key, 15.0)
    assert int(single.clean_err) == int(sharded.clean_err)
    np.testing.assert_array_equal(np.asarray(single.dist_err),
                                  np.asarray(sharded.dist_err))


@needs_8_devices
def test_tp_sharding_bit_identical_for_geometric_channel():
    """Antenna sharding of a deterministic (LOS) channel is exact: every
    collective reduction must reproduce the local sums."""
    cfg = small_cfg(chan="los", alg="cnc")
    key = jax.random.key(4)
    single = make_round_fn(cfg, 2, 8)(key, 15.0)
    mesh = make_mesh(n_dp=4, n_tp=2)
    sharded = make_sharded_round_fn(cfg, 2, 8, mesh)(key, 15.0)
    assert int(single.clean_err) == int(sharded.clean_err)
    np.testing.assert_array_equal(np.asarray(single.dist_err),
                                  np.asarray(sharded.dist_err))


@needs_8_devices
def test_tp_sharding_statistically_consistent_for_rayleigh():
    """Antenna-sharded Rayleigh draws per-shard fade streams, so counters
    differ bit-wise but BER must agree within Monte-Carlo tolerance."""
    cfg = small_cfg()
    n_frames = 64
    n_bits = cfg.modem.n_bits_per_ofdm_sym * n_frames
    key = jax.random.key(5)
    single = make_round_fn(cfg, 2, n_frames)(key, 15.0)
    mesh = make_mesh(n_dp=4, n_tp=2)
    sharded = make_sharded_round_fn(cfg, 2, n_frames, mesh)(key, 15.0)
    ber_s = np.asarray(single.dist_err) / n_bits
    ber_p = np.asarray(sharded.dist_err) / n_bits
    np.testing.assert_allclose(ber_p, ber_s, rtol=0.25)


@needs_8_devices
def test_mesh_shapes():
    mesh = make_mesh(n_dp=4, n_tp=2)
    assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2
    mesh = make_mesh(n_tp=1)
    assert mesh.shape["dp"] == len(jax.devices())


@needs_8_devices
def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_weak_scaling_experiment_runs():
    """weak_scaling drives parallel/scaling.py end to end on the virtual
    CPU mesh and reports sane efficiencies."""
    from mimo_ofdm_tpu.experiments import EXPERIMENTS
    payload = EXPERIMENTS["weak_scaling"](
        n_ant=4, n_iters=1, batch_per_device=8, device_counts=[1, 2, 4],
        small=True, save_json=False, verbose=False)
    res = payload["results"]
    assert set(res) == {"1", "2", "4"}
    assert res["1"]["efficiency"] == 1.0
    for d in ("2", "4"):
        assert 0.05 < res[d]["efficiency"] <= 1.5
        assert res[d]["frames_per_s"] > 0


@needs_8_devices
@pytest.mark.parametrize("precoding,algorithm", [("zf", "cnc"),
                                                 ("mrt", "mcnc_mu")])
def test_mu_tp_sharding_matches_single_device(precoding, algorithm):
    """MU precoders (ZF Gram psum, MU-MRT norm psum) and the MCNC-MU
    replica under antenna sharding must reproduce the unsharded MU round
    (LOS channels: all randomness in bits/noise, shared across layouts).

    float32 chain storage: the psum reduction order differs from the
    single-device sum by ULPs (f32 addition is not associative), which is
    far from any detection boundary in f32 — but bf16 epilogue storage
    re-rounds those ULP differences to 2^-9-relative ones, occasionally
    flipping a boundary bit (a ~0.5% counter wobble, statistically nil).
    The exactness claim under test is the *collective layout*, so the
    chain runs in f32 here; bf16+tp statistical agreement is covered by
    test_tp_sharding_statistically_consistent_for_rayleigh."""
    from mimo_ofdm_tpu.models.link_mu import make_mu_round_fn
    from mimo_ofdm_tpu.parallel.sharded import make_sharded_mu_round_fn
    cfg = LinkConfig(
        modem=ModemConfig(constel_size=16, n_fft=256, n_sub_carr=128, cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="los"),
        precoding=precoding,
        pa=PaConfig(model="softlim", ibo_db=0.0),
        rx=RxConfig(algorithm=algorithm),
        mxu_fft_storage="float32",
    )
    key = jax.random.key(11)
    single = make_mu_round_fn(cfg, 2, 8)(key, 15.0)
    mesh = make_mesh(n_dp=4, n_tp=2)
    sharded = make_sharded_mu_round_fn(cfg, 2, 8, mesh)(key, 15.0)
    se, pe = np.asarray(single.dist_err), np.asarray(sharded.dist_err)
    np.testing.assert_array_equal(np.asarray(single.clean_err),
                                  np.asarray(sharded.clean_err))
    np.testing.assert_array_equal(se, pe)


@needs_8_devices
def test_mu_tp_sharding_bf16_statistically_consistent():
    """bf16 MXU-chain storage under antenna sharding (the shipped
    default): psum-reordered ULP differences re-round to 2^-9-relative in
    the bf16 planes and may flip detector-boundary bits, so counters are
    compared statistically rather than bit-exactly (the f32 chain's
    bit-exactness is test_mu_tp_sharding_matches_single_device). Covers
    the bf16+tp gap noted by the r2 advisor."""
    from mimo_ofdm_tpu.models.link_mu import make_mu_round_fn
    from mimo_ofdm_tpu.parallel.sharded import make_sharded_mu_round_fn
    cfg = LinkConfig(
        modem=ModemConfig(constel_size=16, n_fft=256, n_sub_carr=128, cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="los"),
        precoding="zf",
        pa=PaConfig(model="softlim", ibo_db=0.0),
        rx=RxConfig(algorithm="cnc"),
        mxu_fft_storage="bfloat16",
    )
    key = jax.random.key(13)
    n_frames = 16
    n_bits = cfg.modem.n_bits_per_ofdm_sym * n_frames
    single = make_mu_round_fn(cfg, 2, n_frames)(key, 12.0)
    mesh = make_mesh(n_dp=4, n_tp=2)
    sharded = make_sharded_mu_round_fn(cfg, 2, n_frames, mesh)(key, 12.0)
    ber_s = np.asarray(single.dist_err) / n_bits
    ber_p = np.asarray(sharded.dist_err) / n_bits
    # same fade-free LOS geometry and same bit/noise streams: only bf16
    # re-rounding of psum reordering can move counters — a sub-percent
    # wobble, bounded well inside 5% + a few bits
    np.testing.assert_allclose(ber_p, ber_s, rtol=0.05,
                               atol=8.0 / n_bits)
    np.testing.assert_array_equal(np.asarray(single.clean_err),
                                  np.asarray(sharded.clean_err))


@needs_8_devices
def test_dp_sharded_transport_round_counter_identical():
    """The dp-sharded transport-coded round (full DL-SCH chain + CNC +
    LDPC decode per device, psum-reduced counters) must reproduce the
    single-device round's counters exactly for the same master key —
    keys are pre-split over the global batch (the coded analogue of the
    reference's per-process LinkLdpc workers on shared counters,
    ``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:15``)."""
    from mimo_ofdm_tpu.models.link_ldpc import (make_transport_round_fn,
                                                transport_chain_for_modem)
    from mimo_ofdm_tpu.parallel.sharded import make_sharded_transport_round_fn

    cfg = small_cfg(alg="cnc")
    chain = transport_chain_for_modem(cfg, code_rate=0.5, n_blocks=2,
                                      family="ira")
    key = jax.random.key(11)
    single = make_transport_round_fn(cfg, 2, 8, chain, ldpc_iters=6,
                                     ldpc_algorithm="minsum")(key, 8.0)
    mesh = make_mesh(n_dp=4, n_tp=2)
    sharded = make_sharded_transport_round_fn(
        cfg, 2, 8, chain, mesh, ldpc_iters=6,
        ldpc_algorithm="minsum")(key, 8.0)
    for f in ("clean_err", "clean_blk", "dist_err", "dist_blk"):
        np.testing.assert_array_equal(np.asarray(getattr(single, f)),
                                      np.asarray(getattr(sharded, f)))

    # serial_decode (the Mosaic workaround path) under sharding too
    chunked = make_sharded_transport_round_fn(
        cfg, 2, 8, chain, mesh, ldpc_iters=6,
        ldpc_algorithm="minsum", serial_decode=4)(key, 8.0)
    for f in ("clean_err", "clean_blk", "dist_err", "dist_blk"):
        np.testing.assert_array_equal(np.asarray(getattr(single, f)),
                                      np.asarray(getattr(chunked, f)))
