"""CSV result I/O, replot, plotting style and spatial plot tests."""

import numpy as np
import matplotlib

matplotlib.use("Agg")


def test_csv_roundtrip(tmp_path):
    from mimo_ofdm_tpu.utils import results
    data = [np.arange(5.0), np.linspace(0, 1, 5), np.ones(3)]
    p = results.save_to_csv(data, "unit_test_file", tmp_path)
    assert p.exists()
    back = results.read_from_csv("unit_test_file", tmp_path)
    np.testing.assert_allclose(back[0], data[0])
    np.testing.assert_allclose(back[2], data[2])


def test_ber_sweep_filename_matches_reference_convention():
    from mimo_ofdm_tpu.utils import results
    ebn0 = np.arange(5.0, 20.5, 0.5)
    name = results.ber_sweep_filename("ber_vs_ebn0", "cnc", "los", 64, 0.0,
                                      ebn0, [1, 2, 3, 4, 5, 6, 7, 8])
    # reference convention (main_miso_cnc_ber_vs_ebn0.py:279-281)
    assert name == ("ber_vs_ebn0_cnc_los_nant64_ibo0_ebn0_min5_max20_step0.50"
                    "_niter1_2_3_4_5_6_7_8")


def test_save_and_replot_ber_sweep(tmp_path):
    from mimo_ofdm_tpu.utils import results
    from mimo_ofdm_tpu.utils.replot import replot_ber_vs_ebn0
    ebn0 = np.arange(5.0, 11.0, 1.0)
    ber = np.abs(np.random.default_rng(0).normal(size=(4, len(ebn0)))) * 1e-2 + 1e-5
    name = results.ber_sweep_filename("ber_vs_ebn0", "cnc", "los", 8, 0.0,
                                      ebn0, [1, 2])
    results.save_ber_sweep(ebn0, ber, name, tmp_path)
    fig, ax = replot_ber_vs_ebn0("ber_vs_ebn0", "cnc", "los", 8, 0.0, ebn0,
                                 [1, 2], results_dir=tmp_path)
    assert len(ax.lines) == 4


def test_plot_style_and_spatial():
    from mimo_ofdm_tpu.utils.plotting import set_latex_plot_style, reset_color_cycle
    from mimo_ofdm_tpu.utils.spatial_plot import (plot_array_config,
                                                  plot_spatial_config)
    from mimo_ofdm_tpu.models.geometry import ula_positions
    set_latex_plot_style()
    pos = ula_positions(8, 3.5e9, cord_z=15.0)
    fig, ax = plot_spatial_config(pos, rx_pos=np.array([212.0, 212.0, 1.5]))
    assert ax is not None
    fig2, ax2 = plot_array_config(pos)
    assert ax2 is not None
    import matplotlib.pyplot as plt
    plt.figure()
    reset_color_cycle()
    plt.close("all")
