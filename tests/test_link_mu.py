"""Multi-user link tests (``reference/main_multiuser`` family behavior)."""

import numpy as np
import jax
import pytest

from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig, LinkConfig,
                                        ModemConfig, PaConfig, RxConfig)
from mimo_ofdm_tpu.models.link_mu import (default_user_positions,
                                          make_mu_round_fn)


def mu_cfg(prec="mrt", alg="cnc", n_ant=8):
    return LinkConfig(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128, cp_len=16,
                          n_users=2),
        array=ArrayConfig(n_elements=n_ant),
        channel=ChannelConfig(model="los"),
        precoding=prec,
        pa=PaConfig(model="softlim", ibo_db=0.0),
        rx=RxConfig(algorithm=alg),
    )


def test_default_user_positions():
    pos = default_user_positions()
    assert pos.shape == (2, 3)
    # +-30 deg around broadside (+90 rotation), distances 100 / 316.3
    np.testing.assert_allclose(np.hypot(pos[0, 0], pos[0, 1]), 100.0)
    np.testing.assert_allclose(np.hypot(pos[1, 0], pos[1, 1]), 316.3)
    assert pos[0, 0] > 0 and pos[1, 0] < 0  # opposite sides


def test_mu_zf_beats_mrt_cross_interference():
    """ZF removes inter-user interference, so at high SNR the clean BER
    under ZF must undercut MRT (which leaves cross-talk)."""
    key = jax.random.key(0)
    bers = {}
    for prec in ("mrt", "zf"):
        rf = make_mu_round_fn(mu_cfg(prec), 1, 24)
        c = rf(key, 25.0)
        n_bits = 24 * mu_cfg().modem.n_bits_per_ofdm_sym
        bers[prec] = np.asarray(c.clean_err) / n_bits
    assert bers["zf"].mean() < bers["mrt"].mean()


def test_mcnc_mu_converges():
    rf = make_mu_round_fn(mu_cfg(alg="mcnc_mu"), 3, 16)
    c = rf(jax.random.key(1), 17.0)
    n_bits = 16 * mu_cfg().modem.n_bits_per_ofdm_sym
    ber = np.asarray(c.dist_err) / n_bits       # [n_usr, n_iters+1]
    # iterations reduce BER for both users
    assert np.all(ber[:, 3] < ber[:, 0])


def test_mu_per_user_counters_differ():
    """Users at different distances see different SNR/interference, so the
    per-user counters should not be identical."""
    rf = make_mu_round_fn(mu_cfg(), 1, 16)
    c = rf(jax.random.key(2), 17.0)
    assert c.dist_err.shape == (2, 2)
    assert int(c.clean_err[0]) != int(c.clean_err[1])


def test_mu_determinism():
    rf = make_mu_round_fn(mu_cfg(alg="cnc_mu"), 2, 8)
    c1 = rf(jax.random.key(3), 15.0)
    c2 = rf(jax.random.key(3), 15.0)
    np.testing.assert_array_equal(np.asarray(c1.dist_err), np.asarray(c2.dist_err))


def test_sep_carrier_mu_link():
    """Separate-subcarrier allocation removes inter-user interference
    entirely in the clean run (each user owns its block), so clean BER
    should be near the single-user level for both users
    (``main_multiuser_cnc_sep_sc_ber_vs_ebn0.py`` behavior)."""
    from mimo_ofdm_tpu.models.link_mu import (default_user_positions,
                                              make_mu_round_fn)
    cfg = mu_cfg()
    # equal distances: the composed-MRT AGC has a single noise scaler, so
    # unequal path losses shift per-user SNR (faithful to the reference)
    pos = default_user_positions(distances=(150.0, 150.0))
    rf = make_mu_round_fn(cfg, 2, 16, user_positions=pos, sep_carriers=True)
    c = rf(jax.random.key(0), 20.0)
    n_bits_usr = 16 * cfg.modem.n_bits_per_ofdm_sym // 2
    clean = np.asarray(c.clean_err) / n_bits_usr
    dist = np.asarray(c.dist_err) / n_bits_usr
    assert c.dist_err.shape == (2, 3)
    # with own subcarrier blocks there is no inter-user interference:
    # both users decode cleanly; distortion makes it worse
    assert np.all(clean < 0.02)
    assert np.all(dist[:, 0] > clean)


def test_n_user_mu_link_generalizes():
    """Plain per-user CNC works for more than 2 users."""
    from mimo_ofdm_tpu.models.link_mu import (make_mu_round_fn,
                                              spread_user_positions)
    cfg = mu_cfg(prec="zf")
    pos = spread_user_positions(4, distance=150.0)
    rf = make_mu_round_fn(cfg, 1, 8, user_positions=pos)
    c = rf(jax.random.key(1), 18.0)
    assert c.clean_err.shape == (4,)
    assert c.dist_err.shape == (4, 2)
    assert np.all(np.asarray(c.dist_err) >= 0)
