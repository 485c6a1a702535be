"""Round-5 TPU batch 5: GSCM small-array arms + MCNC coded-rate
variants (converting the last sizable N/A blocks into comparisons).

  PYTHONPATH=/root/.axon_site:/root/repo nohup python \
      scripts/run_round5_fill5.py > figs/profiling/round5_fill5.log 2>&1 &
"""

import importlib
import json
import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OD = os.path.join(REPO, "figs", "csv_results")
sys.path.insert(0, HERE)


def have(name):
    return os.path.exists(os.path.join(OD, name + ".csv"))


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
    # 1. GSCM small-array arms (committed 38.901 nant16/nant4 files)
    gc = importlib.import_module("gscm_compare")
    gc.ARMS.update({
        "cnc_nant16": dict(
            alg="cnc", scenario="uma_los", n_ant=16, n_iters=3,
            ebn0=(5.0, 20.0, 1.0),
            ref="ber_vs_ebn0_cnc_3GPP_38.901_UMa_LOS_nant16_ibo0_ebn0_"
                "min5_max20_step1.00_niter1_2_3.csv"),
        "mcnc_nant16": dict(
            alg="mcnc", scenario="uma_los", n_ant=16, n_iters=2,
            ebn0=(5.0, 20.0, 1.0),
            ref="ber_vs_ebn0_mcnc_3GPP_38.901_UMa_LOS_nant16_ibo0_ebn0_"
                "min5_max20_step1.00_niter1_2.csv"),
        "cnc_nant4": dict(
            alg="cnc", scenario="uma_los", n_ant=4, n_iters=2,
            ebn0=(5.0, 20.0, 1.0),
            ref="ber_vs_ebn0_cnc_3GPP_38.901_UMa_LOS_nant4_ibo0_ebn0_"
                "min5_max20_step1.00_niter1_2.csv"),
    })
    done = {}
    if os.path.exists(gc.OUT):
        done = json.load(open(gc.OUT))
    for arm in ("cnc_nant16", "mcnc_nant16", "cnc_nant4"):
        if arm not in done:
            job(f"gscm arm {arm}", lambda arm=arm: gc.main_arms([arm]))

    # 2. MCNC per-rate coded variants at the committed nant16 config
    from mimo_ofdm_tpu.experiments.ber_sweeps import ldpc_ref_ber
    for rate in ("1/2", "1/3", "2/3", "3/4", "7/8"):
        num, den = rate.split("/")
        nm = (f"ldpc_{num}_{den}_ber_vs_ebn0_mcnc_los_nant16_ibo0"
              f"_ebn0_min-5_max15_step2.00_niter1_2_3")
        if have(nm):
            continue
        job(nm, lambda rate=rate: ldpc_ref_ber(
            code_rate_str=rate, channel="los", algorithm="mcnc",
            serial_decode=16, verbose=True))

    print("\nround5 fill5: all scheduled jobs processed", flush=True)


if __name__ == "__main__":
    main()
