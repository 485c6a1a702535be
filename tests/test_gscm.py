"""Tests for the native TR 38.901 geometric channel (models/gscm.py) —
the full-fidelity substitute for the reference's Quadriga engine
(reference/channel.py:404-494)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.models import gscm, geometry
from mimo_ofdm_tpu.models.geometry import C_LIGHT


FC = 3.5e9


def _setup(n_ant=8, n_fft=256, spacing=15e3):
    tx = jnp.asarray(geometry.array_positions("linear", n_ant, FC, 0.5,
                                              cord_z=15.0), jnp.float32)
    freqs = FC + spacing * (np.arange(n_fft) - n_fft // 2)
    rx = jnp.asarray([212.0, 212.0, 1.5], jnp.float32)
    return tx, rx, jnp.asarray(freqs, jnp.float32)


def _draw(key, scenario, n_drops=64, element_pattern=False, **kw):
    tx, rx, freqs = _setup(**kw)
    fn = jax.jit(jax.vmap(
        lambda k: gscm.gscm_channel(k, tx, rx, freqs, scenario=scenario,
                                    skip_attenuation=True,
                                    element_pattern=element_pattern)))
    return np.asarray(fn(jax.random.split(key, n_drops)))


@pytest.mark.parametrize("scenario", ["uma_los", "uma_nlos"])
def test_unit_mean_power(scenario):
    # total ray power is normalized to 1 per drop (before the element
    # pattern and free-space attenuation), so the ensemble mean per-bin
    # power is 1
    h = _draw(jax.random.key(0), scenario, n_drops=192)
    p = np.mean(np.abs(h) ** 2)
    assert 0.9 < p < 1.1, p


@pytest.mark.parametrize("scenario", ["uma_los", "uma_nlos"])
def test_finite_and_shapes(scenario):
    h = _draw(jax.random.key(1), scenario, n_drops=4, element_pattern=True)
    assert h.shape == (4, 8, 256)
    assert h.dtype == np.complex64
    assert np.all(np.isfinite(h))


def test_delay_spread_statistics():
    # realized RMS delay spread across drops follows the UMa LOS
    # lognormal: median ~= 10^mu_lgDS (Table 7.5-6); K-dependent power
    # weighting pulls the realized spread slightly below the diffuse DS,
    # so allow a wide but centered band
    spacing = 15e3
    h = _draw(jax.random.key(2), "uma_los", n_drops=256, n_fft=512)
    # RMS delay spread from the power-delay profile via IFFT of H(f).
    # Periodic Hann window (the symmetric np.hanning leaks everywhere) +
    # noise-floor threshold suppress the Dirichlet leakage of off-grid
    # taps, which otherwise dominates the second moment.
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(512) / 512)
    imp = np.fft.ifft(h[:, 0, :] * win, axis=-1)
    pdp = np.abs(imp) ** 2
    pdp = np.where(pdp > pdp.max(axis=-1, keepdims=True) * 1e-3, pdp, 0.0)
    # signed circular time axis: the window kernel's bin -1 sidelobe of
    # the tau=0 specular must read as -130 ns, not +66 us
    t = (((np.arange(512) + 256) % 512) - 256) / (512 * spacing)
    mean_t = np.sum(pdp * t, axis=-1) / np.sum(pdp, axis=-1)
    rms = np.sqrt(np.sum(pdp * (t - mean_t[:, None]) ** 2, axis=-1)
                  / np.sum(pdp, axis=-1))
    med = np.median(rms)
    mu = 10.0 ** (-6.955 - 0.0963 * np.log10(FC / 1e9))  # ~98 ns
    # LOS specular (K ~ 9 dB) concentrates power at tap 0, shrinking the
    # realized RMS spread well below the diffuse DS
    assert 0.05 * mu < med < 1.5 * mu, (med, mu)


def test_los_specular_dominates_at_high_k():
    # with the scenario K-factor forced high via many drops, the
    # frequency-flat specular should make LOS drops much flatter than
    # NLOS drops on average
    h_los = _draw(jax.random.key(3), "uma_los", n_drops=128)
    h_nlos = _draw(jax.random.key(3), "uma_nlos", n_drops=128)

    def flatness(h):
        p = np.abs(h[:, 0, :]) ** 2
        return np.median(np.std(p, axis=-1) / np.mean(p, axis=-1))

    assert flatness(h_los) < flatness(h_nlos)


def test_power_angle_coupling():
    # UMa LOS: the strongest clusters sit near the LOS azimuth, so the
    # power-weighted beamforming direction of the drop ensemble must
    # point at the RX. Estimate via the per-drop dominant eigenvector's
    # best-match steering angle.
    tx, rx, freqs = _setup(n_ant=16, n_fft=64)
    fn = jax.jit(jax.vmap(
        lambda k: gscm.gscm_channel(k, tx, rx, freqs, scenario="uma_los",
                                    skip_attenuation=True,
                                    element_pattern=False)))
    h = np.asarray(fn(jax.random.split(jax.random.key(4), 64)))
    # correlate each drop's mean spatial signature with steering vectors
    lam = C_LIGHT / FC
    dx = np.asarray(tx[:, 0] - np.mean(tx[:, 0]))
    angles = np.radians(np.arange(0, 91, 1.0))
    steer = np.exp(1j * 2 * np.pi / lam
                   * dx[:, None] * np.cos(angles)[None, :])  # az from +x
    # spatial covariance averaged over bins and drops
    r = np.einsum("daf,dbf->ab", h, h.conj()) / (h.shape[0] * h.shape[2])
    resp = np.real(np.einsum("ak,ab,bk->k", steer.conj(), r, steer))
    best = np.degrees(angles[np.argmax(resp)])
    # LOS azimuth is 45 deg from +x
    assert abs(best - 45.0) < 10.0, best


def test_element_pattern_weights_power():
    # the 3GPP element pattern attenuates off-boresight rays, so total
    # power with the pattern on must be below the isotropic case (max
    # gain normalized out), and the peak response stays near LOS
    h_iso = _draw(jax.random.key(5), "uma_nlos", n_drops=96)
    h_pat = _draw(jax.random.key(5), "uma_nlos", n_drops=96,
                  element_pattern=True)
    assert np.mean(np.abs(h_pat) ** 2) < np.mean(np.abs(h_iso) ** 2)


def test_element_amp_formula():
    # boresight: 0 dB
    assert np.isclose(float(gscm._element_amp(jnp.float32(90.0),
                                              jnp.float32(0.0))), 1.0)
    # 65 deg off azimuth at horizon: -12 dB
    a = float(gscm._element_amp(jnp.float32(90.0), jnp.float32(65.0)))
    assert np.isclose(20 * np.log10(a), -12.0, atol=1e-3)
    # far off in both planes: floored at -30 dB
    a = float(gscm._element_amp(jnp.float32(0.0), jnp.float32(180.0)))
    assert np.isclose(20 * np.log10(a), -30.0, atol=1e-3)


def test_reproducible_and_key_sensitive():
    h1 = _draw(jax.random.key(7), "uma_los", n_drops=2)
    h2 = _draw(jax.random.key(7), "uma_los", n_drops=2)
    h3 = _draw(jax.random.key(8), "uma_los", n_drops=2)
    np.testing.assert_array_equal(h1, h2)
    assert not np.allclose(h1, h3)


def test_link_integration():
    # the "gscm" model runs end-to-end through make_round_fn
    import dataclasses
    from mimo_ofdm_tpu.utils.config import (canonical_miso_cnc, ChannelConfig,
                                            ModemConfig)
    from mimo_ofdm_tpu.models.link import make_round_fn

    cfg, _ = canonical_miso_cnc()
    cfg = cfg.replace(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128,
                          cp_len=16),
        array=dataclasses.replace(cfg.array, n_elements=4),
        channel=ChannelConfig(model="gscm", gscm_scenario="uma_los"),
        channel_storage="complex64")
    round_fn = make_round_fn(cfg, n_iters=2, batch=4)
    c = round_fn(jax.random.key(0), jnp.float32(15.0))
    assert int(np.asarray(c.clean_err)) >= 0
    assert np.asarray(c.dist_err).shape == (3,)
