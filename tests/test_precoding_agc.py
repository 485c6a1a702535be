"""Precoding / AGC / constant-IBO algebraic invariant tests
(SURVEY.md section 7 "Hard parts": the interlocking alpha/IBO/AGC chain)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.models import precoding
from mimo_ofdm_tpu.ops import pa
from mimo_ofdm_tpu.ops.noise import complex_normal


def random_channel(key, n_usr, n_ant, n_sc):
    return complex_normal(key, (n_usr, n_ant, n_sc), jnp.complex128)


def test_mrt_unit_power_per_subcarrier():
    """MRT normalization gives sum_ant |V|^2 == 1 per subcarrier
    (``reference/antenna_array.py:167-171``)."""
    h = random_channel(jax.random.key(0), 1, 16, 64)[0]
    v = precoding.mrt_precoder(h)
    pw = np.sum(np.abs(np.asarray(v)) ** 2, axis=0)
    np.testing.assert_allclose(pw, 1.0, rtol=1e-10)
    # and V o H is real positive (coherent combining)
    vh = np.sum(np.asarray(v) * np.asarray(h), axis=0)
    assert np.all(vh.real > 0)
    np.testing.assert_allclose(vh.imag, 0.0, atol=1e-10)


def test_phase_precoder_unit_modulus():
    h = random_channel(jax.random.key(1), 1, 8, 32)[0]
    v = precoding.phase_precoder(h)
    np.testing.assert_allclose(np.abs(np.asarray(v)), 1.0, rtol=1e-10)


def test_mu_mrt_joint_normalization():
    """MU MRT: total precoder power per subcarrier over users+antennas == 1
    (``reference/antenna_array.py:201-220``)."""
    h = random_channel(jax.random.key(2), 2, 16, 32)
    v = precoding.mu_mrt_precoder(h)                 # [n_ant, n_usr, n_sc]
    pw = np.sum(np.abs(np.asarray(v)) ** 2, axis=(0, 1))
    np.testing.assert_allclose(pw, 1.0, rtol=1e-10)


def test_zf_zero_forces_cross_user():
    """ZF: Hm V per subcarrier is diagonal (no inter-user interference)
    and unit total power (``reference/antenna_array.py:222-257``)."""
    n_usr, n_ant, n_sc = 2, 8, 16
    h = random_channel(jax.random.key(3), n_usr, n_ant, n_sc)
    v = precoding.zf_precoder(h)                     # [n_ant, n_usr, n_sc]
    hn, vn = np.asarray(h), np.asarray(v)
    for sc in range(n_sc):
        prod = hn[:, :, sc] @ vn[:, :, sc]           # [n_usr, n_usr]
        off = prod - np.diag(np.diag(prod))
        np.testing.assert_allclose(off, 0.0, atol=1e-9)
        # received gains equal across users (equal channel-inversion power)
        np.testing.assert_allclose(prod[0, 0], prod[1, 1], rtol=1e-9)
        pw = np.sum(np.abs(vn[:, :, sc]) ** 2)
        np.testing.assert_allclose(pw, 1.0, rtol=1e-9)


def test_sep_carrier_precoder_shape_and_power():
    h = random_channel(jax.random.key(4), 2, 8, 32)
    v = precoding.mu_sep_carrier_precoder(h)
    assert v.shape == (8, 32)
    pw = np.sum(np.abs(np.asarray(v)) ** 2, axis=0)
    np.testing.assert_allclose(pw, 1.0, rtol=1e-10)


def test_per_antenna_ibo_consistency():
    """With MRT (sum_a vk_pow = n_sc) the mean per-antenna IBO correction
    equals 1/n_ant power division (``reference/mp_model.py:315-316``)."""
    n_ant, n_sc = 16, 64
    h = random_channel(jax.random.key(5), 1, n_ant, n_sc)[0]
    v = precoding.mrt_precoder(h)
    vk_pow = np.asarray(precoding.precoding_power_per_antenna(v))
    np.testing.assert_allclose(vk_pow.sum(), n_sc, rtol=1e-9)
    ibo_vec = np.asarray(precoding.per_antenna_ibo_db(0.0, jnp.asarray(vk_pow),
                                                      n_sc, n_ant))
    # effective IBO recovers nominal when power is evenly spread
    even = np.asarray(precoding.per_antenna_ibo_db(
        3.0, jnp.full(n_ant, n_sc / n_ant), n_sc, n_ant))
    np.testing.assert_allclose(even, 3.0, rtol=1e-9)
    assert ibo_vec.shape == (n_ant,)


def test_avg_precoding_gain_mrt():
    """MRT average precoding gain is 1/n_ant
    (``reference/antenna_array.py:328-341``)."""
    h = random_channel(jax.random.key(6), 1, 32, 64)[0]
    v = precoding.mrt_precoder(h)
    g = float(precoding.avg_precoding_gain(v))
    assert g == pytest.approx(1.0 / 32.0, rel=1e-9)


def test_empirical_bussgang_alpha():
    """Empirical alpha E[y x*]/E[|x|^2] of a clipped complex Gaussian must
    match the closed form — the reference's own validation study
    (``reference/main_misc_evals/main_alpha_dist_coefficient_eval.py:28-80``)."""
    key = jax.random.key(7)
    n = 1 << 18
    x = complex_normal(key, (n,), jnp.complex128)   # unit power
    for ibo_db in (-3.0, 0.0, 3.0):
        sat = pa.ibo_to_sat_power(ibo_db, 1.0)
        y = pa.soft_limiter(x, sat)
        alpha_emp = (jnp.mean(y * jnp.conj(x)) / jnp.mean(jnp.abs(x) ** 2)).real
        alpha_th = float(pa.bussgang_alpha(ibo_db))
        assert float(alpha_emp) == pytest.approx(alpha_th, rel=5e-3)


def test_agc_state_shapes_and_identity():
    """AGC of an identity channel/precoder is all-ones with unit scalers
    (degenerate SISO case)."""
    from mimo_ofdm_tpu.models.agc import compute_agc
    n_sc, n_fft = 8, 16
    h = jnp.ones((1, n_sc), jnp.complex128)
    v = jnp.ones((1, n_sc), jnp.complex128)
    agc = compute_agc(h, v, ibo_db=0.0, n_ant=1, n_fft=n_fft)
    # per-antenna effective IBO = 10log10(10^0 * n_sc / (n_sc*1)) = 0 dB
    alpha0 = float(pa.bussgang_alpha(0.0))
    np.testing.assert_allclose(np.asarray(agc.ak_vect), alpha0, rtol=1e-6)
    np.testing.assert_allclose(float(agc.hk_vk_noise_scaler), 1.0)
    np.testing.assert_allclose(float(agc.ak_hk_vk_noise_scaler), alpha0 ** 2,
                               rtol=1e-6)
    # data bins hold the sum, other bins hold ones
    nfft_vec = np.asarray(agc.hk_vk_agc_nfft)
    assert nfft_vec.shape == (n_fft,)
    np.testing.assert_allclose(nfft_vec, 1.0)
