"""Experiment registry smoke tests (small shapes, loose criteria)."""

import numpy as np
import pytest

from mimo_ofdm_tpu.experiments import EXPERIMENTS


def test_registry_contents():
    for name in ("miso_ber_vs_ebn0", "awgn_ber_vs_ebn0", "miso_ber_vs_ibo",
                 "miso_ber_vs_nant", "req_ebn0_vs_ibo", "multiuser_ber",
                 "beampattern", "sdr_vs_ibo", "psd_eval", "alpha_eval",
                 "complexity_eval", "pa_characteristics", "channel_tf"):
        assert name in EXPERIMENTS


def test_awgn_ber_experiment(tmp_path, monkeypatch):
    monkeypatch.setenv("MIMO_OFDM_TPU_RESULTS", str(tmp_path))
    res = EXPERIMENTS["awgn_ber_vs_ebn0"](
        n_iters=2, ebn0_min=10.0, ebn0_max=10.0, ebn0_step=2.0,
        n_err_min=300, bits_sent_max=400_000, batch=8, verbose=False,
        save_csv=False, small=True)
    assert res.ber_matrix.shape[0] == 4  # clean + iters 0..2


def test_miso_ber_vs_ibo_experiment():
    res = EXPERIMENTS["miso_ber_vs_ibo"](
        channel="los", n_ant=4, ebn0_db=15.0, ibo_values=(0.0, 6.0),
        n_iters=1, n_err_min=300, bits_sent_max=300_000, batch=8,
        verbose=False, save_csv=False, small=True)
    ber = res.ber_matrix
    assert ber.shape == (3, 2)
    assert ber[1, 1] < ber[1, 0]  # more backoff -> lower uncorrected BER


def test_alpha_eval_experiment():
    analytic, emp = EXPERIMENTS["alpha_eval"](n_ant=4, n_snapshots=16,
                                              verbose=False, small=True)
    np.testing.assert_allclose(emp, analytic, rtol=0.02)


def test_complexity_eval_matches_reference_formulas():
    out = EXPERIMENTS["complexity_eval"](verbose=False)
    cnc_add, cnc_mul = out["cnc"]
    mcnc_add, _ = out["mcnc"]
    # reference prints per-subcarrier numbers; spot-check the I=0 column
    # equals the std receiver and growth is linear in I
    std_add, std_mul = out["std"]
    assert cnc_add[0] == std_add and cnc_mul[0] == std_mul
    d1 = cnc_add[1] - cnc_add[0]
    d2 = cnc_add[2] - cnc_add[1]
    assert d1 == pytest.approx(d2)
    # MCNC per-iteration cost exceeds CNC by roughly K x (K=64)
    assert (mcnc_add[1] - mcnc_add[0]) > 30 * (cnc_add[1] - cnc_add[0])


def test_pa_characteristics():
    x, y = EXPERIMENTS["pa_characteristics"](model="softlim", ibo_db=0.0,
                                             verbose=False)
    assert np.max(y) == pytest.approx(1.0, rel=1e-6)  # clipped at sqrt(sat)=1


def test_channel_tf():
    h = EXPERIMENTS["channel_tf"](channel="two_path", n_ant=2, verbose=False)
    assert h.shape == (2, 256)
    assert np.all(np.isfinite(h))


def test_cli_help(capsys):
    from mimo_ofdm_tpu.experiments.__main__ import main
    assert main(["--help"]) == 0
    out = capsys.readouterr().out
    assert "miso_ber_vs_ebn0" in out


@pytest.mark.slow
def test_ldpc_ref_ber_experiment(tmp_path, monkeypatch):
    """Reference-parity NR coded sweep (reference/main_cnc_mcnc_w_ldpc/
    main_mp_ldpc_cnc_ber_vs_ebn0.py): exact-payload sizing, sumprod
    decode, reference CSV name ldpc_<num>_<den>_ber_vs_ebn0_*."""
    monkeypatch.setenv("MIMO_OFDM_TPU_RESULTS", str(tmp_path))
    ebn0, ber = EXPERIMENTS["ldpc_ref_ber"](
        code_rate_str="1/2", n_ant=4, n_iters=2, ebn0_min=0.0,
        ebn0_max=8.0, ebn0_step=4.0, n_err_min=50, bits_sent_max=40_000,
        batch=4, verbose=False, save_csv=True, small=True)
    assert ber.shape == (4, 3)          # clean + taps 0..2
    assert ber[0, -1] <= ber[1, -1]     # clean <= distorted at high Eb/N0
    hits = list(tmp_path.glob("ldpc_1_2_ber_vs_ebn0_cnc_los_nant4_*.csv"))
    assert len(hits) == 1
