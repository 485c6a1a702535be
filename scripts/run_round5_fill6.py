"""Round-5 TPU batch 6: regenerate the csi_noise_db CSVs with the fixed
clean-run propagation (true channel through the noisy-CSI AGC)."""

import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def job(desc, fn):
    t0 = time.time()
    print(f"\n=== {desc} ===", flush=True)
    try:
        fn()
        print(f"=== done ({time.time() - t0:.0f}s) ===", flush=True)
    except Exception:
        traceback.print_exc()
        print(f"=== FAILED — continuing ===", flush=True)


def main():
    from mimo_ofdm_tpu.experiments.ber_sweeps import csi_noise_ber_vs_ebn0
    for alg, dbs, e1 in (("cnc", (10, 15, 20, 30), 20.0),
                         ("mcnc", (10, 15, 20), 20.0),
                         ("mcnc", (10, 15, 20), 25.0)):
        job(f"csi_noise {alg} max{int(e1)} dbs {dbs}",
            lambda alg=alg, dbs=dbs, e1=e1: csi_noise_ber_vs_ebn0(
                algorithm=alg, csi_snr_db=dbs, n_ant=16,
                ebn0_min=5.0, ebn0_max=e1, ebn0_step=1.0,
                n_err_min=100_000, bits_sent_max=10_000_000,
                batch=64, verbose=False))
    # candidate sweep for the unlabeled mcnc_random_paths_nant4 file:
    # the default (10 paths, 1 us) hypothesis shows a growing SNR offset
    # (ratios 1.05 -> 2.5 across the window), so test the other
    # plausible (n_paths, max_delay) configs the named nant16 variants
    # use; results land in figs/profiling/random_paths_nant4_id.json
    import json
    import numpy as np
    from mimo_ofdm_tpu.experiments.ber_sweeps import miso_ber_vs_ebn0
    import csv as _csv
    out_p = os.path.join(REPO, "figs", "profiling",
                         "random_paths_nant4_id.json")
    if not os.path.exists(out_p):
        ref_rows = [np.array([float(x) for x in r]) for r in _csv.reader(
            open("/root/reference/figs/csv_results/ber_vs_ebn0_mcnc_"
                 "random_paths_nant4_ibo0_ebn0_min5_max20_step1.00_"
                 "niter1_2_3_4_5_6_7_8.csv"))]
        cand = {"p3_1u": (3, 1e-6), "p8_1u": (8, 1e-6),
                "p3_100n": (3, 100e-9), "p20_1u": (20, 1e-6),
                "p10_300n": (10, 300e-9)}
        ev = {}
        for name, (np_, dly) in cand.items():
            def run(np_=np_, dly=dly, name=name):
                res = miso_ber_vs_ebn0(
                    channels=("random_paths",), algorithm="mcnc", n_ant=4,
                    ibo_db=0.0, ebn0_min=5.0, ebn0_max=20.0, ebn0_step=1.0,
                    n_err_min=100_000, bits_sent_max=10_000_000, batch=64,
                    channel_kwargs={"n_paths": np_,
                                    "max_delay_spread": dly},
                    save_csv=False, verbose=False)
                ber = res["random_paths"].ber_matrix
                meds = {}
                for row, lab in ((1, "clean"), (2, "it0"), (10, "it8")):
                    o, f = ber[row - 1], ref_rows[row]
                    m = (o > 5e-4) & (f > 5e-4)
                    meds[lab] = (float(np.median(o[m] / f[m]))
                                 if m.any() else None)
                ev[name] = meds
                print(name, meds, flush=True)
            job(f"random_paths nant4 candidate {name}", run)
        with open(out_p, "w") as f:
            json.dump(ev, f, indent=1)

    print("\nround5 fill6: all scheduled jobs processed", flush=True)


if __name__ == "__main__":
    main()
