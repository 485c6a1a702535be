"""Identify the lost config behind the legacy unprefixed
``ldpc_ber_vs_ebn0_*`` / ``ldpc_in_loop_*`` committed CSVs.

Their generator is absent from the reference; the rate is not in the
filename. Candidate (rate, decoder-iteration) combos are simulated on
the committed grid (nant16 LOS CNC, Eb/N0 -5..4) and scored against the
committed clean + ite0 rows by mean |log10 BER| deviation over the
comparable range plus the 1e-2-crossing (cliff) offset.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/identify_legacy_ldpc.py
Writes figs/ldpc/legacy_identification.json.
"""

import csv
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = ("/root/reference/figs/csv_results/ldpc_ber_vs_ebn0_cnc_los_nant16"
       "_ibo0_ebn0_min-5_max4_step1.00_niter1_2_3.csv")


def cliff(ebn0, ber, target=1e-2):
    b = np.asarray(ber, float)
    m = b > 0
    if m.sum() < 2 or b[m].min() > target:
        return float("nan")
    lb = np.log10(np.maximum(b, 1e-12))
    e = np.asarray(ebn0, float)
    o = np.argsort(lb)
    return float(np.interp(np.log10(target), lb[o], e[o]))


def main():
    from mimo_ofdm_tpu.experiments.ber_sweeps import transport_coded_ber

    rows = [np.array([float(x) for x in r]) for r in csv.reader(open(REF))]
    ref_ebn0, ref_clean, ref_it0 = rows[0], rows[1], rows[2]

    out = {"reference": {"clean_cliff": cliff(ref_ebn0, ref_clean),
                         "it0_cliff": cliff(ref_ebn0, ref_it0)}}
    print("committed: clean cliff %.2f, it0 cliff %.2f" %
          (out["reference"]["clean_cliff"], out["reference"]["it0_cliff"]),
          flush=True)

    cands = [("1/3", 4), ("1/3", 6), ("1/3", 8), ("1/3", 12),
             ("1/2", 12), ("1/2", 50)]
    for rate_str, iters in cands:
        num, den = rate_str.split("/")
        ebn0, ber, _ = transport_coded_ber(
            channel="los", algorithm="cnc", n_ant=16, ibo_db=0.0, n_iters=1,
            code_rate=float(num) / float(den), rv=0, ldpc_iters=iters,
            ldpc_algorithm="sumprod", exact_payload=True,
            ebn0_min=-5.0, ebn0_max=4.0, ebn0_step=1.0,
            n_err_min=20_000, bits_sent_max=5_000_000, batch=16,
            save_csv=False, verbose=False)
        both = (ber[0] > 1e-4) & (ref_clean > 1e-4)
        dev = (np.mean(np.abs(np.log10(ber[0][both])
                              - np.log10(ref_clean[both])))
               if both.any() else float("nan"))
        c = cliff(ebn0, ber[0])
        key = f"r{rate_str.replace('/', '_')}_it{iters}"
        out[key] = {"clean_cliff": c,
                    "cliff_delta": c - out["reference"]["clean_cliff"],
                    "mean_log10_dev": dev,
                    "clean": ber[0].tolist(), "it0": ber[1].tolist()}
        print(f"{key}: clean cliff {c:.2f} "
              f"(delta {c - out['reference']['clean_cliff']:+.2f}), "
              f"mean|dlog10 BER| {dev:.3f}", flush=True)

    os.makedirs(os.path.join(HERE, "..", "figs", "ldpc"), exist_ok=True)
    with open(os.path.join(HERE, "..", "figs", "ldpc",
                           "legacy_identification.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
