"""OFDM framing, PA model, AWGN and metric unit tests against closed forms
and the reference conventions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.ops import metrics, noise, ofdm, pa


def test_subcarrier_layout_matches_reference():
    """fd[-(nsc/2):] = sym[:nsc/2]; fd[1:nsc/2+1] = sym[nsc/2:]
    (``reference/modulation.py:264-267``)."""
    n_fft, n_sc = 16, 8
    sym = jnp.arange(1, n_sc + 1).astype(jnp.complex128)
    fd = np.asarray(ofdm.map_subcarriers(sym, n_fft))
    expected = np.zeros(n_fft, complex)
    expected[-(n_sc // 2):] = np.arange(1, n_sc + 1)[: n_sc // 2]
    expected[1: n_sc // 2 + 1] = np.arange(1, n_sc + 1)[n_sc // 2:]
    np.testing.assert_array_equal(fd, expected)
    # demap inverts
    back = np.asarray(ofdm.extract_subcarriers(jnp.asarray(expected), n_sc))
    np.testing.assert_array_equal(back, np.asarray(sym))


def test_ofdm_roundtrip_and_parseval():
    rng = np.random.default_rng(0)
    n_fft, n_sc, cp = 256, 128, 16
    sym = rng.normal(size=n_sc) + 1j * rng.normal(size=n_sc)
    td = ofdm.ofdm_modulate(jnp.asarray(sym), n_fft, cp)
    assert td.shape == (n_fft + cp,)
    # CP is a copy of the tail
    np.testing.assert_allclose(np.asarray(td[:cp]), np.asarray(td[-cp:]))
    back = ofdm.ofdm_demodulate(td, n_sc, cp)
    np.testing.assert_allclose(np.asarray(back), sym, atol=1e-12)
    # ortho norm preserves energy (Parseval)
    e_fd = np.sum(np.abs(sym) ** 2)
    e_td = np.sum(np.abs(np.asarray(td[cp:])) ** 2)
    np.testing.assert_allclose(e_td, e_fd, rtol=1e-12)


def test_ofdm_avg_sample_power():
    """avg_samp_pow = avg_sym_pow * n_sc/n_fft (``reference/modulation.py:418-424``)
    holds empirically for random QAM frames."""
    from mimo_ofdm_tpu.ops import qam
    rng = np.random.default_rng(1)
    m, n_fft, n_sc = 64, 512, 256
    c = np.asarray(qam.qam_constellation(m, jnp.complex128))
    sym = c[rng.integers(0, m, size=(200, n_sc))]
    td = ofdm.fd_to_td(ofdm.map_subcarriers(jnp.asarray(sym), n_fft))
    p_emp = float(np.mean(np.abs(np.asarray(td)) ** 2))
    p_theory = ofdm.ofdm_avg_sample_power(qam.avg_symbol_power(m), n_fft, n_sc)
    assert p_emp == pytest.approx(p_theory, rel=0.02)


def test_fft_bin_frequencies():
    f = np.asarray(ofdm.fft_bin_frequencies(8, 15e3, 3.5e9))
    k = np.fft.fftfreq(8, d=1 / 8)
    np.testing.assert_allclose(f, k * 15e3 + 3.5e9)


def test_soft_limiter():
    sat = 4.0  # amplitude clip at 2
    x = jnp.asarray([1.0 + 0j, 3.0 + 0j, 3j, 3 + 4j, 0.0])
    y = np.asarray(pa.soft_limiter(x, sat))
    np.testing.assert_allclose(y[0], 1.0)
    np.testing.assert_allclose(abs(y[1]), 2.0)
    np.testing.assert_allclose(y[1].real / abs(y[1]), 1.0)       # phase kept
    np.testing.assert_allclose(abs(y[3]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.angle(y[3]), np.angle(3 + 4j), rtol=1e-6)
    np.testing.assert_allclose(y[4], 0.0)


def test_rapp_limits():
    sat = 1.0
    x = jnp.asarray([1e6 + 0j])
    y = np.asarray(pa.rapp(x, sat, p_hardness=3.0))
    np.testing.assert_allclose(abs(y[0]), 1.0, rtol=1e-3)         # saturates at sqrt(sat)
    x = jnp.asarray([1e-3 + 0j])
    y = np.asarray(pa.rapp(x, sat, p_hardness=3.0))
    np.testing.assert_allclose(y[0], 1e-3, rtol=1e-6)             # linear for small input


def test_third_order():
    c = 0.1
    x = jnp.asarray([2.0 + 0j])
    y = np.asarray(pa.third_order(x, c))
    np.testing.assert_allclose(y[0], 2.0 - 0.1 * 2.0 * 4.0)


def test_bussgang_alpha_closed_form():
    """alpha(0 dB) per the Ochiai formula (``reference/modulation.py:186-189``)."""
    from scipy.special import erfc
    for ibo in (-3.0, 0.0, 3.0, 6.0):
        g = 10 ** (ibo / 20)
        expected = 1 - np.exp(-g**2) + np.sqrt(np.pi) * g / 2 * erfc(g)
        assert float(pa.bussgang_alpha(ibo)) == pytest.approx(expected, rel=1e-6)
    # alpha -> 1 as IBO -> inf
    assert float(pa.bussgang_alpha(40.0)) == pytest.approx(1.0, abs=1e-6)


def test_awgn_power_and_snr():
    key = jax.random.key(0)
    n = 1 << 16
    sig = jnp.zeros(n, jnp.complex128)
    avg_pow, snr_db = 42.0, 10.0
    out = noise.awgn(key, sig, snr_db, avg_pow)
    p_noise = float(np.mean(np.abs(np.asarray(out)) ** 2))
    assert p_noise == pytest.approx(avg_pow / 10.0, rel=0.05)


def test_ebn0_snr_roundtrip():
    snr = metrics.ebn0_to_snr(10.0, 4096, 2048, 64)
    # 10*log10(10 * 2048*6/4096) = 10 + 10log10(3)
    assert snr == pytest.approx(10 + 10 * np.log10(3.0))
    back = metrics.snr_to_ebn0(snr, 4096, 2048, 64)
    assert back == pytest.approx(10.0)


def test_pa_preserves_signal_below_saturation():
    """Soft limiter is the identity below saturation
    (``reference/distortion.py:18``)."""
    rng = np.random.default_rng(5)
    x = (rng.normal(size=100) + 1j * rng.normal(size=100)) * 0.1
    y = np.asarray(pa.soft_limiter(jnp.asarray(x), 100.0))
    np.testing.assert_allclose(y, x, rtol=1e-12)
