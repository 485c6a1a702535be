"""Link-level coverage for the Rapp and TOI PA models
(``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ebn0_toi.py``,
Rapp variant of ``reference/distortion.py:116-198``)."""

import numpy as np
import jax

from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig, LinkConfig,
                                        ModemConfig, PaConfig, RxConfig)
from mimo_ofdm_tpu.models.link import make_round_fn


def cfg_with_pa(pa):
    return LinkConfig(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128, cp_len=16),
        array=ArrayConfig(n_elements=4),
        channel=ChannelConfig(model="los"),
        precoding="mrt",
        pa=pa,
        rx=RxConfig(algorithm="cnc"),
    )


def _ber(pa, snr=25.0, n_iters=2, batch=16, seed=0):
    cfg = cfg_with_pa(pa)
    rf = make_round_fn(cfg, n_iters, batch)
    c = rf(jax.random.key(seed), snr)
    n_bits = batch * cfg.modem.n_bits_per_ofdm_sym
    return np.asarray(c.dist_err) / n_bits, int(c.clean_err) / n_bits


def test_rapp_less_distortion_than_softlim_at_high_hardness():
    """Rapp with p -> inf approaches the soft limiter; small p distorts
    below saturation too."""
    ber_soft, _ = _ber(PaConfig(model="softlim", ibo_db=2.0))
    ber_rapp_hard, _ = _ber(PaConfig(model="rapp", ibo_db=2.0,
                                     rapp_p_hardness=20.0))
    ber_rapp_soft, _ = _ber(PaConfig(model="rapp", ibo_db=2.0,
                                     rapp_p_hardness=0.8))
    # very hard Rapp ~ soft limiter (same order of magnitude)
    assert abs(np.log10(ber_rapp_hard[0] + 1e-6)
               - np.log10(ber_soft[0] + 1e-6)) < 0.5
    # soft Rapp compresses everywhere -> more distortion
    assert ber_rapp_soft[0] > ber_rapp_hard[0]


def test_toi_distortion_increases_with_lower_toi():
    """Lower third-order intercept -> stronger cubic distortion -> worse
    BER. (At these sizes the effect shows once the distortion exceeds the
    decision margins; compare a strong- and a weak-distortion setting.)"""
    ber_hi, _ = _ber(PaConfig(model="toi", ibo_db=16.0), snr=25.0)
    ber_lo, _ = _ber(PaConfig(model="toi", ibo_db=8.0), snr=25.0)
    assert ber_lo.max() > ber_hi.max()
    assert ber_lo[0] >= ber_hi[0]


def test_pa_none_matches_clean():
    ber, clean = _ber(PaConfig(model="none"), snr=15.0)
    # without distortion the "distorted" run is statistically a clean run
    assert abs(ber[0] - clean) / max(clean, 1e-9) < 0.35
