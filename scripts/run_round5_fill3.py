"""Round-5 TPU batch 3: high-resolution PSD/beampattern reproductions.

Produces the committed ``npoints1800`` Welch-PSD / powers-vs-angle
files same-name (the last justified-N/A family that is actually
producible in this environment):

  1. mrt_radiation_pattern at 1800 points x 10 snapshots for
     los/two_path/rayleigh at nant (16, 32, 64, 128)
     -> 24 psd_mrt_* (angles 45+78) + 12 mrt_sig_powers_vs_angle_*
  2. the 1800 x 100 pair at nant128 with psd angle 54
     (los + two_path) -> the 4 committed nsnap100 files
"""

import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OD = os.path.join(REPO, "figs", "csv_results")


def job(desc, fn):
    t0 = time.time()
    print(f"\n=== {desc} ===", flush=True)
    try:
        fn()
        print(f"=== done ({time.time() - t0:.0f}s) ===", flush=True)
    except Exception:
        traceback.print_exc()
        print(f"=== FAILED ({time.time() - t0:.0f}s) — continuing ===",
              flush=True)


def main():
    from mimo_ofdm_tpu.experiments.spatial import mrt_radiation_pattern

    probe = ("psd_mrt_rayleigh_chan_ibo3_npoints1800_nsnap10_angle78"
             "_nant128")
    if not os.path.exists(os.path.join(OD, probe + ".csv")):
        job("mrt_radiation_pattern 1800x10 nant16..128",
            lambda: mrt_radiation_pattern(
                channels=("los", "two_path", "rayleigh"),
                n_ant_values=(16, 32, 64, 128), ibo_db=3.0,
                n_points=1800, n_snapshots=10, verbose=True))

    probe = "psd_mrt_los_chan_ibo3_npoints1800_nsnap100_angle54_nant128"
    if not os.path.exists(os.path.join(OD, probe + ".csv")):
        job("mrt_radiation_pattern 1800x100 nant128 angle54",
            lambda: mrt_radiation_pattern(
                channels=("los", "two_path"), n_ant_values=(128,),
                ibo_db=3.0, n_points=1800, n_snapshots=100,
                psd_angle_deg=54.0, verbose=True))

    print("\nround5 fill3: all jobs processed", flush=True)


if __name__ == "__main__":
    main()
