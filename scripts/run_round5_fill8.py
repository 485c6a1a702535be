"""Round-5 TPU batch 8: the five denser/subset-window 38.901 files,
measured directly as additional gscm_compare arms (upgrading their
subset-window N/A rule to per-file comparisons)."""

import importlib
import json
import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)


def main():
    gc = importlib.import_module("gscm_compare")
    gc.ARMS.update({
        "cnc_los_min10_fine": dict(
            alg="cnc", scenario="uma_los", ebn0=(10.0, 20.0, 0.5),
            ref="ber_vs_ebn0_cnc_3GPP_38.901_UMa_LOS_nant64_ibo0_ebn0_"
                "min10_max20_step0.50_niter1_2_3_4_5_6_7_8.csv"),
        "cnc_los_min10": dict(
            alg="cnc", scenario="uma_los", ebn0=(10.0, 20.0, 1.0),
            ref="ber_vs_ebn0_cnc_3GPP_38.901_UMa_LOS_nant64_ibo0_ebn0_"
                "min10_max20_step1.00_niter1_2_3_4_5_6_7_8.csv"),
        "cnc_nlos_min10_fine": dict(
            alg="cnc", scenario="uma_nlos", ebn0=(10.0, 20.0, 0.5),
            ref="ber_vs_ebn0_cnc_3GPP_38.901_UMa_NLOS_nant64_ibo0_ebn0_"
                "min10_max20_step0.50_niter1_2_3_4_5_6_7_8.csv"),
        "mcnc_los_min10_fine": dict(
            alg="mcnc", scenario="uma_los", ebn0=(10.0, 20.0, 0.5),
            ref="ber_vs_ebn0_mcnc_3GPP_38.901_UMa_LOS_nant64_ibo0_ebn0_"
                "min10_max20_step0.50_niter1_2_3_4_5_6_7_8.csv"),
        "mcnc_los_min10": dict(
            alg="mcnc", scenario="uma_los", ebn0=(10.0, 20.0, 1.0),
            ref="ber_vs_ebn0_mcnc_3GPP_38.901_UMa_LOS_nant64_ibo0_ebn0_"
                "min10_max20_step1.00_niter1_2_3_4_5_6_7_8.csv"),
    })
    done = {}
    if os.path.exists(gc.OUT):
        done = json.load(open(gc.OUT))
    for arm in ("cnc_los_min10", "mcnc_los_min10", "cnc_los_min10_fine",
                "mcnc_los_min10_fine", "cnc_nlos_min10_fine"):
        if arm not in done:
            t0 = time.time()
            print(f"\n=== gscm arm {arm} ===", flush=True)
            try:
                gc.main_arms([arm])
                print(f"=== done ({time.time() - t0:.0f}s) ===", flush=True)
            except Exception:
                traceback.print_exc()
                print("=== FAILED — continuing ===", flush=True)
    print("\nround5 fill8: all scheduled jobs processed", flush=True)


if __name__ == "__main__":
    main()
