"""Result CSV I/O with the reference's schema and filename conventions.

Schema (``reference/docs/source/usage.rst:37-56``): row 0 holds the swept
parameter values, the following rows hold the measured metric per
configuration (e.g. clean run, then one row per CNC iteration count).

Filenames reproduce the reference's deterministic encoding so
``final_plots``-style replot scripts carry over, e.g.
``ber_vs_ebn0_cnc_los_nant64_ibo0_ebn0_min5_max20_step0.50_niter1_2_3...``
(``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ebn0.py:279-281``).
"""

from __future__ import annotations

import csv
import os
from pathlib import Path

import numpy as np

DEFAULT_RESULTS_DIR = None  # sentinel: resolve MIMO_OFDM_TPU_RESULTS lazily


def _resolve_dir(results_dir) -> Path:
    if results_dir is None:
        results_dir = os.environ.get("MIMO_OFDM_TPU_RESULTS",
                                     "figs/csv_results")
    return Path(results_dir)


def save_to_csv(data_lst: list, filename: str,
                results_dir: str | Path = DEFAULT_RESULTS_DIR) -> Path:
    """Write a list of flat vectors as CSV rows
    (``reference/utilities.py:342-352``). Creates the directory if needed
    and returns the written path."""
    results_dir = _resolve_dir(results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    path = results_dir / f"{filename}.csv"
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerows([np.asarray(row).tolist() for row in data_lst])
    return path


def read_from_csv(filename: str,
                  results_dir: str | Path = DEFAULT_RESULTS_DIR) -> list:
    """Read CSV rows as float lists (``reference/utilities.py:355-365``)."""
    path = _resolve_dir(results_dir) / f"{filename}.csv"
    with open(path, newline="") as f:
        reader = csv.reader(f, quoting=csv.QUOTE_NONNUMERIC)
        return list(reader)


def ber_sweep_filename(kind: str, rx_name: str, chan_name: str, n_ant: int,
                       ibo_db: float, ebn0_arr: np.ndarray,
                       cnc_iter_lst) -> str:
    """Reference filename convention for BER-vs-Eb/N0 sweeps
    (``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ebn0.py:279-281``)."""
    step = ebn0_arr[1] - ebn0_arr[0] if len(ebn0_arr) > 1 else 0.0
    iters = "_".join(str(int(v)) for v in cnc_iter_lst)
    return (f"{kind}_{rx_name}_{chan_name}_nant{n_ant}_ibo{int(ibo_db)}"
            f"_ebn0_min{int(min(ebn0_arr))}_max{int(max(ebn0_arr))}"
            f"_step{step:1.2f}_niter{iters}")


def save_ber_sweep(param_values: np.ndarray, ber_matrix: np.ndarray,
                   filename: str,
                   results_dir: str | Path = DEFAULT_RESULTS_DIR) -> Path:
    """Row 0 = swept parameter; rows 1.. = BER per configuration
    (``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ebn0.py:289-294``)."""
    data = [np.asarray(param_values)] + [np.asarray(r) for r in ber_matrix]
    return save_to_csv(data, filename, results_dir)


def load_ber_sweep(filename: str,
                   results_dir: str | Path = DEFAULT_RESULTS_DIR):
    rows = read_from_csv(filename, results_dir)
    return np.asarray(rows[0]), np.asarray(rows[1:])
