"""SISO literature anchors (experiments/siso_checks) — clean curve against
the closed-form 64-QAM SER and CNC convergence toward the no-distortion
curve (the behavior of the committed reference figure
``reference/figs/cnc/ref_impl_ser_eval/ser_soft_lim_siso_cnc_*.png``)."""

import numpy as np
from scipy.special import erfc
import pytest

from mimo_ofdm_tpu.experiments import EXPERIMENTS


def qam_ser_analytic(m, snr_db):
    """Square-QAM symbol error rate at Es/N0 = snr (textbook)."""
    snr = 10 ** (snr_db / 10.0)
    p_half = (1 - 1 / np.sqrt(m)) * erfc(np.sqrt(1.5 * snr / (m - 1)))
    return 1 - (1 - p_half) ** 2


@pytest.mark.slow
def test_siso_awgn_ser_anchor():
    snrs, ser = EXPERIMENTS["siso_ser_vs_snr"](
        small=True, batch=32, n_symb_err_min=400, n_symb_sent_max=400_000,
        save_csv=False, verbose=False, snr_min=17, snr_max=27, snr_step=5,
        iters=(0, 3, 12))
    # clean run tracks the closed form
    for j, s in enumerate(snrs):
        ref = qam_ser_analytic(64, s)
        if ref > 1e-3:
            assert abs(ser[0, j] - ref) < 0.35 * ref + 2e-3, (s, ser[0, j], ref)
    hi = -1
    # distortion-limited standard RX; CNC-12 approaches clean
    assert ser[1, hi] > 0.3
    assert ser[3, hi] < 0.15 * ser[1, hi]
    assert ser[3, hi] < ser[2, hi] < ser[1, hi]


@pytest.mark.slow
def test_siso_rayleigh_zf_cnc_anchor():
    snrs, ser = EXPERIMENTS["siso_rayleigh_zf_cnc"](
        small=True, batch=32, n_symb_err_min=400, n_symb_sent_max=200_000,
        save_csv=False, verbose=False, snr_min=20, snr_max=40, snr_step=10,
        iters=(0, 3, 12))
    # fading clean curve is far above AWGN closed form (diversity-1 ZF)
    assert ser[0, -1] > qam_ser_analytic(64, snrs[-1]) + 1e-3
    # CNC monotone improvement at the top of the range
    assert ser[3, -1] < ser[2, -1] < ser[1, -1]
    assert ser[1, -1] > 0.3
