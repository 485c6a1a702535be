"""Geometry and channel-model unit tests
(``reference/antenna_array.py:415-520``, ``reference/channel.py``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.models import channels, geometry
from mimo_ofdm_tpu.ops import ofdm


def test_ula_positions():
    pos = geometry.ula_positions(64, 3.5e9, 0.5, cord_z=15.0)
    assert pos.shape == (64, 3)
    lam = geometry.C_LIGHT / 3.5e9
    d = np.diff(pos[:, 0])
    np.testing.assert_allclose(d, lam / 2, rtol=1e-9)       # lambda/2 spacing
    np.testing.assert_allclose(pos[:, 0].mean(), 0, atol=1e-9)  # centered
    assert np.all(pos[:, 2] == 15.0)


def test_uca_positions():
    n = 16
    pos = geometry.uca_positions(n, 3.5e9)
    lam = geometry.C_LIGHT / 3.5e9
    r = lam * (n - 1) / (2 * np.pi)                          # reference :472
    np.testing.assert_allclose(np.hypot(pos[:, 0], pos[:, 1]), r, rtol=1e-9)
    # semicircular: all y >= 0
    assert np.all(pos[:, 1] >= -1e-12)


def test_ura_positions():
    pos = geometry.ura_positions(4, 8, 3.5e9, cord_z=10.0)
    assert pos.shape == (32, 3)
    assert len(np.unique(np.round(pos[:, 0], 6))) == 8       # 8 x-columns
    assert len(np.unique(np.round(pos[:, 2], 6))) == 4       # 4 z-rows
    np.testing.assert_allclose(pos[:, 2].mean(), 10.0)


def test_los_channel_phase_and_attenuation():
    tx = jnp.asarray(geometry.ula_positions(4, 3.5e9, cord_z=15.0), jnp.float32)
    rx = jnp.asarray([100.0, 100.0, 1.5], jnp.float32)
    freqs = ofdm.fft_bin_frequencies(64, 15e3, 3.5e9)
    h = np.asarray(channels.los_channel(tx, rx, freqs, dtype=jnp.complex128))
    d = np.linalg.norm(np.asarray(tx) - np.asarray(rx), axis=1)
    # free-space amplitude c/(4 pi d f)
    expect_amp = geometry.C_LIGHT / (4 * np.pi * d[:, None] * np.asarray(freqs))
    np.testing.assert_allclose(np.abs(h), expect_amp, rtol=1e-5)
    # phase of bin 0 = 2 pi d f0 / c (float32 positions give ~1e-3 rad
    # wrap-around precision at ~1650 wavelengths — physically irrelevant)
    expect_ph = np.angle(np.exp(2j * np.pi * d * 3.5e9 / geometry.C_LIGHT))
    np.testing.assert_allclose(np.angle(h[:, 0]), expect_ph, atol=5e-3)


def test_two_path_fades_relative_to_los():
    """The ground reflection creates frequency-selective fading: two-path
    |H| oscillates around the LOS level."""
    tx = jnp.asarray(geometry.ula_positions(1, 3.5e9, cord_z=15.0), jnp.float32)
    # close-in RX: path difference ~2 z_t z_r / d = 1.5 m gives visible
    # fading modulation across the 61 MHz band
    rx = jnp.asarray([30.0, 0.0, 1.5], jnp.float32)
    freqs = ofdm.fft_bin_frequencies(4096, 15e3, 3.5e9)
    h_los = np.asarray(channels.los_channel(tx, rx, freqs, dtype=jnp.complex128))
    h_2p = np.asarray(channels.two_path_channel(tx, rx, freqs, dtype=jnp.complex128))
    ratio = np.abs(h_2p[0]) / np.abs(h_los[0])
    assert ratio.max() - ratio.min() > 0.3      # frequency-selective
    assert ratio.max() < 2.01                   # bounded by LOS + reflection


def test_rayleigh_channel_statistics():
    tx = jnp.asarray(geometry.ula_positions(8, 3.5e9, cord_z=15.0), jnp.float32)
    rx = jnp.asarray([212.0, 212.0, 1.5], jnp.float32)
    freqs = ofdm.fft_bin_frequencies(512, 15e3, 3.5e9)
    h = np.asarray(channels.rayleigh_channel(jax.random.key(0), tx, rx, freqs,
                                             skip_attenuation=True,
                                             dtype=jnp.complex128))
    # unit-variance complex Gaussian per bin
    assert np.mean(np.abs(h) ** 2) == pytest.approx(1.0, rel=0.05)
    assert abs(np.mean(h)) < 0.05


def test_random_paths_channel_unit_mean_power():
    tx = jnp.asarray(geometry.ula_positions(4, 3.5e9, cord_z=15.0), jnp.float32)
    freqs = ofdm.fft_bin_frequencies(256, 15e3, 3.5e9)
    h = np.asarray(channels.random_paths_channel(jax.random.key(1), tx, freqs,
                                                 n_paths=10,
                                                 dtype=jnp.complex128))
    assert h.shape == (4, 256)
    # 1/sqrt(P) normalization keeps mean power O(1)
    assert 0.2 < np.mean(np.abs(h) ** 2) < 5.0


def test_tdl_channel_profiles():
    tx = jnp.asarray(geometry.ula_positions(8, 3.5e9, cord_z=15.0), jnp.float32)
    rx = jnp.asarray([212.0, 212.0, 1.5], jnp.float32)
    freqs = ofdm.fft_bin_frequencies(512, 15e3, 3.5e9)
    for profile in ("uma_los", "umi_nlos"):
        h = np.asarray(channels.tdl_channel(jax.random.key(2), tx, rx, freqs,
                                            profile=profile,
                                            skip_attenuation=True,
                                            dtype=jnp.complex128))
        assert h.shape == (8, 512)
        assert np.all(np.isfinite(h))
        # frequency selectivity from the delay taps
        assert np.std(np.abs(h[0])) > 0.01
    # LOS profile is more frequency-flat than the NLOS one
    h_los = np.asarray(channels.tdl_channel(jax.random.key(3), tx, rx, freqs,
                                            "uma_los", skip_attenuation=True))
    h_nlos = np.asarray(channels.tdl_channel(jax.random.key(3), tx, rx, freqs,
                                             "umi_nlos", skip_attenuation=True))
    cv_los = np.std(np.abs(h_los)) / np.mean(np.abs(h_los))
    cv_nlos = np.std(np.abs(h_nlos)) / np.mean(np.abs(h_nlos))
    assert cv_los < cv_nlos


def test_csi_error_preserves_power_scaling():
    from mimo_ofdm_tpu.models.channels import csi_error_channel
    tx = jnp.asarray(geometry.ula_positions(4, 3.5e9, cord_z=15.0), jnp.float32)
    rx = jnp.asarray([212.0, 212.0, 1.5], jnp.float32)
    freqs = ofdm.fft_bin_frequencies(256, 15e3, 3.5e9)
    h = channels.rayleigh_channel(jax.random.key(4), tx, rx, freqs,
                                  skip_attenuation=True, dtype=jnp.complex128)
    noisy = csi_error_channel(jax.random.key(5), h, 128, epsilon=0.3)
    h_np, n_np = np.asarray(h), np.asarray(noisy)
    # power approximately preserved: (1-eps^2) + eps^2 = 1
    sc = np.concatenate([h_np[:, -64:], h_np[:, 1:65]], axis=1)
    sc_n = np.concatenate([n_np[:, -64:], n_np[:, 1:65]], axis=1)
    assert np.mean(np.abs(sc_n) ** 2) == pytest.approx(
        np.mean(np.abs(sc) ** 2), rel=0.2)
    # out-of-band bins untouched
    np.testing.assert_array_equal(h_np[:, 70:180], n_np[:, 70:180])


def test_tdl_tables_match_tr38901():
    """The TDL profiles are the exact TR 38.901 Tables 7.7.2-1..5 (VERDICT
    r2 item 2): tap counts, spot delay/power values, and the LOS specular
    components of TDL-D/E."""
    P = channels.TDL_PROFILES
    assert len(P["tdl_a"]["delays"]) == 23
    assert len(P["tdl_b"]["delays"]) == 23
    assert len(P["tdl_c"]["delays"]) == 24
    assert len(P["tdl_d"]["delays"]) == 13
    assert len(P["tdl_e"]["delays"]) == 14
    # spot values straight from the tables
    assert P["tdl_a"]["delays"][22] == pytest.approx(9.6586)
    assert P["tdl_a"]["powers_db"][1] == 0.0
    assert P["tdl_b"]["powers_db"][15] == pytest.approx(-1.9)
    assert P["tdl_c"]["delays"][5] == pytest.approx(0.6366)
    assert P["tdl_c"]["powers_db"][5] == 0.0
    assert P["tdl_d"]["los_db"] == pytest.approx(-0.2)
    assert P["tdl_d"]["powers_db"][0] == pytest.approx(-13.5)
    assert P["tdl_e"]["los_db"] == pytest.approx(-0.03)
    assert P["tdl_e"]["delays"][13] == pytest.approx(20.6519)
    # every NLOS profile has no specular part; LOS ones do
    for p in ("tdl_a", "tdl_b", "tdl_c"):
        assert P[p]["los_db"] is None
    # Quadriga scenario aliases resolve to the real tables
    assert P["uma_los"] is P["tdl_d"]
    assert P["umi_nlos"] is P["tdl_a"]
    assert P["uma_nlos"] is P["tdl_c"]


def test_tdl_channel_unit_power_and_los_flatness():
    tx = jnp.asarray(geometry.ula_positions(8, 3.5e9, cord_z=15.0), jnp.float32)
    rx = jnp.asarray([212.0, 212.0, 1.5], jnp.float32)
    freqs = ofdm.fft_bin_frequencies(512, 15e3, 3.5e9)
    # average per-bin channel power == 1 (profile normalized incl. the LOS
    # component) for every profile, averaged over fades
    for profile in ("tdl_a", "tdl_c", "tdl_d", "tdl_e"):
        p = []
        for s in range(40):
            h = np.asarray(channels.tdl_channel(
                jax.random.key(s), tx, rx, freqs, profile,
                skip_attenuation=True, dtype=jnp.complex128))
            p.append(np.mean(np.abs(h) ** 2))
        assert np.mean(p) == pytest.approx(1.0, rel=0.15), profile
    # LOS (TDL-D, K ~ 13.3 dB) is far more frequency-flat than NLOS TDL-A
    # (averaged over fade realizations: a single draw's coefficient of
    # variation fluctuates ~2x)
    cv = {}
    for profile in ("tdl_d", "tdl_a"):
        vals = []
        for s in range(10):
            h = np.asarray(channels.tdl_channel(jax.random.key(s), tx, rx,
                                                freqs, profile,
                                                skip_attenuation=True))
            vals.append(np.std(np.abs(h)) / np.mean(np.abs(h)))
        cv[profile] = np.mean(vals)
    assert cv["tdl_d"] < 0.5 * cv["tdl_a"]
