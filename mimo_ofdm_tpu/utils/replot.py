"""Publication replots from saved CSVs — the ``final_plots`` layer
(``reference/final_plots/ber_vs_ebn0.py:34-60`` and siblings): reconstruct
the deterministic filename, read the CSV and re-render with the
publication style. No simulation is run."""

from __future__ import annotations

import numpy as np

from mimo_ofdm_tpu.utils import results
from mimo_ofdm_tpu.utils.plotting import CB_COLOR_CYCLE, set_latex_plot_style


def replot_ber_vs_ebn0(kind: str, rx_name: str, chan_name: str, n_ant: int,
                       ibo_db: float, ebn0_arr, cnc_iter_lst,
                       sel_iters=None, results_dir=None, save_path=None,
                       show: bool = False):
    """Re-render a BER-vs-Eb/N0 CSV (row 0 = Eb/N0, row 1 = clean, rows
    2.. = per-iteration), mirroring ``reference/final_plots/ber_vs_ebn0.py``."""
    import matplotlib.pyplot as plt

    set_latex_plot_style()
    fname = results.ber_sweep_filename(kind, rx_name, chan_name, n_ant,
                                       ibo_db, np.asarray(ebn0_arr),
                                       cnc_iter_lst)
    kw = {} if results_dir is None else {"results_dir": results_dir}
    ebn0, ber = results.load_ber_sweep(fname, **kw)

    fig, ax = plt.subplots()
    ax.set_yscale("log", base=10)
    ax.plot(ebn0, ber[0], color=CB_COLOR_CYCLE[0], label="No distortion")
    sel = set(sel_iters) if sel_iters is not None else None
    color_idx = 1
    for i in range(1, ber.shape[0]):
        it = i - 1
        if sel is not None and it not in sel:
            continue
        label = "Standard RX" if it == 0 else f"NI = {it}"
        ax.plot(ebn0, ber[i], color=CB_COLOR_CYCLE[color_idx % len(CB_COLOR_CYCLE)],
                label=label)
        color_idx += 1
    ax.set_xlabel("Eb/N0 [dB]")
    ax.set_ylabel("BER")
    ax.grid(True)
    ax.legend()
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=600, bbox_inches="tight")
    if show:
        plt.show()
    return fig, ax
