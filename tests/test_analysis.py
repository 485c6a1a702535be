"""Beampattern / SDR / Welch PSD analysis tests
(``reference/main_beampatterns_plotting`` family behavior)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.models.analysis import (beampattern_scan, bussgang_split,
                                           sdr_at_point, welch_psd)
from mimo_ofdm_tpu.utils.config import (ArrayConfig, LinkConfig, ModemConfig,
                                        PaConfig)


def small_cfg(n_ant=16, ibo=0.0):
    return LinkConfig(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128, cp_len=16),
        array=ArrayConfig(n_elements=n_ant),
        pa=PaConfig(model="softlim", ibo_db=ibo),
    )


def test_welch_matches_scipy():
    from scipy.signal import welch as sp_welch
    rng = np.random.default_rng(0)
    x = rng.normal(size=2048) + 1j * rng.normal(size=2048)
    f1, p1 = welch_psd(jnp.asarray(x), nfft=128, nperseg=64)
    f2, p2 = sp_welch(x, fs=128, nfft=128, nperseg=64, return_onesided=False)
    np.testing.assert_allclose(np.asarray(f1), f2)
    np.testing.assert_allclose(np.asarray(p1), p2, rtol=1e-10)


def test_bussgang_split_linear_part_vanishes():
    """For a clipped Gaussian, distortion (y - alpha x) must be orthogonal
    to x (Bussgang theorem)."""
    from mimo_ofdm_tpu.ops import pa
    from mimo_ofdm_tpu.ops.noise import complex_normal
    key = jax.random.key(1)
    x = complex_normal(key, (4, 1 << 15), jnp.complex128)
    ibo = 0.0
    y = pa.soft_limiter(x, pa.ibo_to_sat_power(ibo, 1.0))
    alpha = pa.bussgang_alpha(ibo)
    ak = jnp.full((4,), alpha)
    desired, dist = bussgang_split(y, x, ak)
    corr = jnp.mean(dist * jnp.conj(x), axis=-1)
    np.testing.assert_allclose(np.abs(np.asarray(corr)), 0.0, atol=5e-3)


def test_beampattern_peak_at_precoded_angle():
    cfg = small_cfg()
    res = beampattern_scan(cfg, jax.random.key(0), precoding_angle_deg=45,
                           n_points=36, n_snapshots=4, point_chunk=8)
    ang = np.degrees(res.angles_rad)
    peak = ang[int(np.argmax(np.asarray(res.desired_pow)))]
    assert peak == pytest.approx(-45.0, abs=5.0)


def test_mrt_distortion_beamforms_with_signal():
    """Single-user MRT on LOS: distortion beamforms with the desired
    signal, so SDR is nearly flat across angles — the headline result of
    the beampattern study."""
    cfg = small_cfg()
    res = beampattern_scan(cfg, jax.random.key(0), precoding_angle_deg=45,
                           n_points=36, n_snapshots=4, point_chunk=8)
    sdr = np.asarray(res.sdr_db)
    assert sdr.max() - sdr.min() < 1.0


def test_sdr_increases_with_ibo():
    """More backoff -> less clipping -> higher SDR (the SDR-vs-IBO sweep
    of ``main_sdr_vs_ibo_vs_channel.py``)."""
    sdrs = []
    for ibo in (0.0, 3.0, 6.0):
        cfg = small_cfg(ibo=ibo)
        sdrs.append(float(sdr_at_point(cfg, jax.random.key(2),
                                       (150.0, 150.0, 1.5), n_snapshots=4)))
    assert sdrs[0] < sdrs[1] < sdrs[2]


def test_mu_distortion_intermod_lobes():
    """Two-user MRT: third-order clipping products beamform toward
    2*theta1 - theta2 and 2*theta2 - theta1 (the prediction of
    ``reference/main_multiuser/2_users_ula_distortion_angles_prediction.py``)."""
    from mimo_ofdm_tpu.experiments import EXPERIMENTS
    ang, d, e, pred = EXPERIMENTS["mu_beampattern"](
        n_ant=32, n_points=72, n_snapshots=4, usr_angles_deg=(-20.0, 20.0),
        small=True, save_csv=False, verbose=False)
    deg = np.degrees(ang)
    edb = 10 * np.log10(np.asarray(e) / np.asarray(e).max())

    def at(a):
        return edb[int(np.argmin(abs(deg - a)))]

    assert pred == [-60.0, 60.0]
    # main distortion lobes ride with the users...
    assert at(-20) > -3 and at(20) > -3
    # ...and intermod lobes at +-60 stand well above the +-40 sidelobe floor
    assert at(60) > at(40) + 3
    assert at(-60) > at(-40) + 3


def test_mu_sinr_zf_vs_mrt():
    """ZF nulls inter-user interference so SINR ~= SDR; MRT leaves
    cross-talk so SINR < SDR (per-user SINR measurement, BASELINE config
    'Multi-user ... per-user SINR + BER')."""
    from mimo_ofdm_tpu.experiments import EXPERIMENTS
    sdr_zf, sinr_zf = EXPERIMENTS["mu_sinr"](n_users=4, n_ant=32,
                                             precoding="zf", n_snapshots=4,
                                             small=True, verbose=False)
    sdr_mrt, sinr_mrt = EXPERIMENTS["mu_sinr"](n_users=4, n_ant=32,
                                               precoding="mrt", n_snapshots=4,
                                               small=True, verbose=False)
    assert np.all(np.abs(sdr_zf - sinr_zf) < 0.5)
    assert np.mean(sdr_mrt - sinr_mrt) > 0.1
    assert np.all(sdr_zf > 5.0)


def test_evm_decreases_with_ibo():
    from mimo_ofdm_tpu.experiments import EXPERIMENTS
    ibo, evm = EXPERIMENTS["evm_vs_ibo"](n_ant=8, ibo_values=(0.0, 4.0, 8.0),
                                         n_snapshots=4, small=True,
                                         save_csv=False, verbose=False)
    assert evm[0] > evm[1] > evm[2]
    assert evm[0] > 0.1          # heavy clipping at IBO 0
    assert evm[2] < 0.02         # nearly linear at IBO 8


def test_channel_mat_correlation_los_peak_and_narrowing():
    """LOS channel correlation peaks (=1) at the main user angle and
    decorrelates faster with more antennas
    (reference/main_multiuser/multiuser_channel_mat_correlation.py)."""
    import jax
    from mimo_ofdm_tpu.models.analysis import channel_mat_correlation_scan

    n_points = 36
    corr_by_nant = {}
    for n_ant in (2, 16):
        cfg = small_cfg(n_ant=n_ant)
        angles, corr = channel_mat_correlation_scan(
            cfg, jax.random.key(0), main_usr_angle_deg=45.0,
            main_user_dist=300.0, n_points=n_points)
        corr = np.asarray(corr)
        main_idx = int(round(n_points / 180 * 45.0))
        assert corr[main_idx] == pytest.approx(1.0, abs=1e-5)
        assert corr.argmax() == main_idx
        assert np.all(corr <= 1.0 + 1e-5) and np.all(corr >= 0.0)
        corr_by_nant[n_ant] = corr
    # larger arrays decorrelate faster away from the precoding angle
    off = int(round(n_points / 180 * 90.0))
    assert corr_by_nant[16][off] < corr_by_nant[2][off]


def test_channel_mat_correlation_rayleigh_low_off_main():
    """Rayleigh: independent fades -> low correlation except at the main
    point (which reuses the exact main-user matrix -> corr 1)."""
    import jax
    from mimo_ofdm_tpu.models.analysis import channel_mat_correlation_scan

    cfg = small_cfg(n_ant=16)
    cfg = cfg.replace(channel=cfg.channel.__class__(model="rayleigh"))
    n_points = 18
    _, corr = channel_mat_correlation_scan(
        cfg, jax.random.key(3), main_usr_angle_deg=40.0,
        main_user_dist=300.0, n_points=n_points)
    corr = np.asarray(corr)
    main_idx = int(round(n_points / 180 * 40.0))
    assert corr[main_idx] == pytest.approx(1.0, abs=1e-5)
    others = np.delete(corr, main_idx)
    assert np.all(others < 0.6)


def test_spatial_correlation_los():
    """Beampattern correlation is 1 at the main precoding angle and decays
    away from it
    (reference/main_multiuser/multiuser_channel_spatial_correlation.py)."""
    import jax
    from mimo_ofdm_tpu.models.analysis import spatial_correlation_scan

    cfg = small_cfg(n_ant=16)
    n_points = 18
    angles, corr = spatial_correlation_scan(
        cfg, jax.random.key(0), main_usr_angle_deg=40.0,
        main_user_dist=300.0, n_points=n_points)
    corr = np.asarray(corr)
    main_idx = int(round(n_points / 180 * 40.0))
    assert corr[main_idx] == pytest.approx(1.0, abs=1e-5)
    assert corr.argmax() == main_idx
    # beampatterns are positive vectors -> corr in (0, 1]
    assert np.all(corr > 0.0) and np.all(corr <= 1.0 + 1e-5)
    # far-away precoding angles give beampatterns less aligned than neighbors
    assert corr[main_idx - 1] > corr.min()


def test_channel_corr_experiment_runs():
    from mimo_ofdm_tpu.experiments import EXPERIMENTS
    out = EXPERIMENTS["channel_corr"](channels=("los",), n_ant_values=(4, 8),
                                      n_points=18, small=True,
                                      save_csv=False, verbose=False)
    angles, mat = out["los"]
    assert mat.shape == (2, 19) and angles.shape == (19,)
    out2 = EXPERIMENTS["spatial_corr"](channels=("los",), n_ant_values=(4,),
                                       n_points=12, small=True,
                                       save_csv=False, verbose=False)
    angles2, mat2 = out2["los"]
    assert mat2.shape == (1, 13) and angles2.shape == (13,)


def test_radiation_pattern_with_psd():
    """Full radiation-pattern scan incl. per-angle Welch PSDs
    (reference/main_beampatterns_plotting/
    main_mrt_precoding_radiation_pattern.py): desired power peaks at the
    precoding angle, distortion power is positive everywhere, and the
    desired PSD dominates the distortion PSD in-band at both committed
    angles."""
    import jax
    from mimo_ofdm_tpu.models.analysis import radiation_pattern
    from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig,
                                            LinkConfig, ModemConfig, PaConfig)
    cfg = LinkConfig(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128,
                          cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="los"),
        pa=PaConfig(model="softlim", ibo_db=3.0))
    res = radiation_pattern(cfg, jax.random.key(0), n_points=36,
                            n_snapshots=10, n_samp_per_seg=64)
    assert res.desired_pow.shape == (37,)
    prec_idx = int(round(36 / 180 * 45))
    assert int(np.argmax(res.desired_pow)) == prec_idx
    assert np.all(res.distortion_pow > 0)
    assert set(res.psd) == {45.0, 78.0}
    for ang in (45.0, 78.0):
        f, p_des, p_dist = res.psd[ang]
        assert f.shape == p_des.shape == p_dist.shape == (256,)
        # in-band desired dominates distortion
        assert p_des.mean() > 10 * p_dist.mean()
    # rayleigh arm: frozen attenuation + per-point fades -> flat-ish pattern
    cfg_r = LinkConfig(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128,
                          cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="rayleigh"),
        pa=PaConfig(model="softlim", ibo_db=3.0))
    res_r = radiation_pattern(cfg_r, jax.random.key(1), n_points=18,
                              n_snapshots=10, n_samp_per_seg=64)
    # no spatial beam for IID fades: peak within 10 dB of the median
    d = res_r.desired_pow
    assert 10 * np.log10(d.max() / np.median(d)) < 10.0
