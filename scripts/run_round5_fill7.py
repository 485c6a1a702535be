"""Round-5 TPU batch 7: representatives for the last N/A blocks.

  1. CSI-eps 0.1 on the GSCM channel (cnc + mcnc) vs the committed
     ber_vs_ebn0_*_quadriga_csi_eps0.100 files — the joint
     (Quadriga-channel x CSI-error) representative.
  2. One nant64 coded grid (rate 1/2, cnc, niter 8, min-5..15 step 1)
     vs the committed ldpc_1_2_..._nant64 file — the large-array coded
     representative.

Writes figs/profiling/quadriga_csi_gscm.json; the coded run saves the
same-name CSV directly.
"""

import csv
import json
import os
import sys
import time
import traceback

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OD = os.path.join(REPO, "figs", "csv_results")
RD = "/root/reference/figs/csv_results"


def job(desc, fn):
    t0 = time.time()
    print(f"\n=== {desc} ===", flush=True)
    try:
        fn()
        print(f"=== done ({time.time() - t0:.0f}s) ===", flush=True)
    except Exception:
        traceback.print_exc()
        print("=== FAILED — continuing ===", flush=True)


def main():
    from mimo_ofdm_tpu.experiments.ber_sweeps import (csi_err_ber_vs_ebn0,
                                                      ldpc_ref_ber)

    out_p = os.path.join(REPO, "figs", "profiling",
                         "quadriga_csi_gscm.json")
    if not os.path.exists(out_p):
        ev = {}
        for alg in ("cnc", "mcnc"):
            def run(alg=alg):
                res = csi_err_ber_vs_ebn0(
                    channel="gscm", algorithm=alg, n_ant=64,
                    csi_eps=(0.1,), ebn0_step=1.0, n_err_min=100_000,
                    bits_sent_max=10_000_000, batch=64, save_csv=False,
                    verbose=True)
                ber = res[0.1].ber_matrix        # clean + it0..it8
                ref_name = (f"ber_vs_ebn0_{alg}_quadriga_csi_eps0.100_"
                            f"nant64_ibo0_ebn0_min5_max20_step1.00_"
                            f"niter1_2_3_4_5_6_7_8")
                ref = [np.array([float(x) for x in r]) for r in csv.reader(
                    open(os.path.join(RD, ref_name + ".csv")))]
                meds = {}
                for row, lab in ((1, "clean"), (2, "it0"), (4, "it2"),
                                 (7, "it5"), (10, "it8")):
                    o, f = ber[row - 1], ref[row]
                    m = (o > 5e-4) & (f > 5e-4)
                    meds[lab] = (float(np.median(o[m] / f[m]))
                                 if m.any() else None)
                ev[alg] = {"ref": ref_name + ".csv", "medians": meds}
                print(alg, meds, flush=True)
            job(f"gscm csi_eps0.1 {alg}", run)
        with open(out_p, "w") as f:
            json.dump(ev, f, indent=1)

    nm = ("ldpc_1_2_ber_vs_ebn0_cnc_los_nant64_ibo0"
          "_ebn0_min-5_max15_step1.00_niter1_2_3_4_5_6_7_8")
    if not os.path.exists(os.path.join(OD, nm + ".csv")):
        job(nm, lambda: ldpc_ref_ber(
            code_rate_str="1/2", channel="los", algorithm="cnc", n_ant=64,
            n_iters=8, ebn0_step=1.0, serial_decode=16, verbose=True))

    print("\nround5 fill7: all scheduled jobs processed", flush=True)


if __name__ == "__main__":
    main()
