"""Analyze figs/ldpc/table_sensitivity_r3.json (produced by
scripts/run_ldpc_perf_r3.py): separate the NR-LDPC surrogate-table
sensitivity from the decoder-algorithm sensitivity against the committed
reference curve (VERDICT r2 item 6).

For each Eb/N0 point and counter the spread across the three independent
surrogate draws (all sum-product) bounds the table effect; the
draw0-sumprod vs draw0-minsum gap bounds the decoder effect; both are
compared to the |ours - reference| deviation. Also expresses the table
effect as an equivalent Eb/N0 shift of the coded cliff (the horizontal
distance between draws at BER 1e-3, interpolated on the standard-RX
counter).
"""

import csv
import json

import numpy as np

REF = ("/root/reference/figs/csv_results/ldpc_1_2_ber_vs_ebn0_cnc_los_"
       "nant16_ibo0_ebn0_min-5_max15_step2.00_niter1_2_3.csv")


def cliff_ebn0(ebn0, ber, target=1e-3):
    """Eb/N0 where BER crosses target (log-linear interp); nan if not
    bracketed."""
    b = np.asarray(ber, float)
    ok = b > 0
    if ok.sum() < 2 or b[ok].min() > target or b[ok].max() < target:
        return float("nan")
    lb = np.log10(b[ok])
    e = np.asarray(ebn0, float)[ok]
    order = np.argsort(lb)
    return float(np.interp(np.log10(target), lb[order], e[order]))


def main():
    data = json.load(open("figs/ldpc/table_sensitivity_r3.json"))
    ref_rows = [np.array([float(x) for x in r]) for r in csv.reader(open(REF))]
    ref_ebn0 = ref_rows[0]

    # counters: [clean, it0..it3]; compare the standard-RX (it0) and it3
    draws = [k for k in data if k.endswith("_sumprod")]
    print(f"draws: {draws}  + {[k for k in data if 'minsum' in k]}")
    ebn0 = np.array(data[draws[0]]["ebn0"])

    for ctr, name in ((1, "standard RX (it0)"), (4, "CNC it3")):
        print(f"\n--- counter: {name} ---")
        per_draw = {k: np.array(data[k]["ber"])[ctr] for k in data}
        # reference row: ref rows = [ebn0, clean, it0..it3]
        ref = np.interp(ebn0, ref_ebn0, ref_rows[1 + ctr])
        print("ebn0      " + "  ".join(f"{e:7.1f}" for e in ebn0))
        for k, v in per_draw.items():
            print(f"{k:15s}" + "  ".join(f"{x:9.2e}" for x in v))
        print("reference      " + "  ".join(f"{x:9.2e}" for x in ref))

        sp = np.stack([per_draw[k] for k in draws])
        with np.errstate(divide="ignore", invalid="ignore"):
            table_spread = np.nanmax(np.abs(np.log10(sp / sp[0])), axis=0)
            dec = np.abs(np.log10(per_draw[f"{draws[0].split('_')[0]}_minsum"]
                                  / sp[0]))
            vs_ref = np.abs(np.log10(sp[0] / ref))
        def fmt(a):
            return "  ".join("      nan" if not np.isfinite(x)
                             else f"{x:9.3f}" for x in a)
        print("log10 spread over table draws:", fmt(table_spread))
        print("log10 sumprod-vs-minsum gap  :", fmt(dec))
        print("log10 |draw0 - reference|    :", fmt(vs_ref))

        cliffs = {k: cliff_ebn0(ebn0, v) for k, v in per_draw.items()}
        cliffs["reference"] = cliff_ebn0(ebn0, ref)
        print("Eb/N0 @ BER 1e-3:",
              {k: (None if np.isnan(v) else round(v, 2))
               for k, v in cliffs.items()})


if __name__ == "__main__":
    main()
