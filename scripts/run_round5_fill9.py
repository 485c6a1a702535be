"""Round-5 TPU batch 9: eliminate the remaining eliminable N/A files.

  1. Quadriga-CSI x GSCM at EVERY committed eps (extends
     figs/profiling/quadriga_csi_gscm.json; the comparator's
     quadriga_csi_evidence consumes all entries generically).
  2. The two nsnap1 multiuser pattern files (same-name).
  3. The eight remaining ber_vs_ibo variants (step-0.25 grids at
     ebn0 15/18, rayleigh nant1 at ebn0 20) (same-name).
  4. The three step-1 nant64 coded grids (rates 1/3, 2/3, 3/4)
     (same-name; the four 0.25-step coded grids stay justified-N/A as
     denser duplicates).
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
        print("=== FAILED — continuing ===", flush=True)


def main():
    from mimo_ofdm_tpu.experiments.ber_sweeps import (csi_err_ber_vs_ebn0,
                                                      miso_ber_vs_ibo,
                                                      transport_coded_ber)
    from mimo_ofdm_tpu.experiments.spatial import mu_radiation_pattern

    # 1. quadriga-CSI x GSCM, every committed eps
    out_p = os.path.join(REPO, "figs", "profiling",
                         "quadriga_csi_gscm.json")
    ev = json.load(open(out_p)) if os.path.exists(out_p) else {}
    eps_sets = {"cnc": (0.01, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7),
                "mcnc": (0.0, 0.01, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7)}
    for alg, eps_list in eps_sets.items():
        for eps in eps_list:
            key = f"{alg}_eps{eps:.3f}"
            ref_name = (f"ber_vs_ebn0_{alg}_quadriga_csi_eps{eps:.3f}_"
                        f"nant64_ibo0_ebn0_min5_max20_step1.00_"
                        f"niter1_2_3_4_5_6_7_8")
            if key in ev or not os.path.exists(
                    os.path.join(RD, ref_name + ".csv")):
                continue

            def run(alg=alg, eps=eps, key=key, ref_name=ref_name):
                res = csi_err_ber_vs_ebn0(
                    channel="gscm", algorithm=alg, n_ant=64,
                    csi_eps=(eps,), ebn0_step=1.0, n_err_min=100_000,
                    bits_sent_max=10_000_000, batch=64, save_csv=False,
                    verbose=False)
                ber = res[float(eps)].ber_matrix
                ref = [np.array([float(x) for x in r]) for r in csv.reader(
                    open(os.path.join(RD, ref_name + ".csv")))]
                meds = {}
                for row, lab in ((1, "clean"), (2, "it0"), (4, "it2"),
                                 (7, "it5"), (10, "it8")):
                    o, f = ber[row - 1], ref[row]
                    m = (o > 5e-4) & (f > 5e-4)
                    meds[lab] = (float(np.median(o[m] / f[m]))
                                 if m.any() else None)
                ev[key] = {"ref": ref_name + ".csv", "medians": meds}
                print(key, meds, flush=True)
                with open(out_p, "w") as f:
                    json.dump(ev, f, indent=1)
            job(f"gscm quadriga-csi {key}", run)

    # 2. nsnap1 multiuser pattern files
    if not have("multiuser_psd_mrt_two_path_chan_ibo3_npoints180_nsnap1"
                "_angle78_nant8"):
        job("mu_radiation_pattern nsnap1 nant8",
            lambda: mu_radiation_pattern(n_ant_values=(8,), n_points=180,
                                         n_snapshots=1, verbose=True))

    # 3. remaining ber_vs_ibo variants
    ibo_jobs = [("cnc", chan, 15.0, 0.25) for chan in
                ("los", "two_path", "rayleigh")]
    ibo_jobs += [("cnc", chan, 18.0, 0.25) for chan in
                 ("los", "two_path", "rayleigh")]
    for alg, chan, ebn0, st in ibo_jobs:
        nm = (f"ber_vs_ibo_{alg}_{chan}_nant64_ebn0_{int(ebn0)}"
              f"_ibo_min0_max9_step{st:1.2f}_niter1_2_3_4_5_6_7_8")
        if have(nm):
            continue
        job(nm, lambda alg=alg, chan=chan, ebn0=ebn0, st=st:
            miso_ber_vs_ibo(channel=chan, algorithm=alg, n_ant=64,
                            ebn0_db=ebn0, ibo_min=0.0, ibo_max=9.25,
                            ibo_step=st, n_err_min=100_000,
                            bits_sent_max=1_000_000, batch=64,
                            verbose=False))
    for alg in ("cnc", "mcnc"):
        nm = (f"ber_vs_ibo_{alg}_rayleigh_nant1_ebn0_20"
              f"_ibo_min0_max9_step0.50_niter1_2_3_4_5_6_7_8")
        if have(nm):
            continue
        job(nm, lambda alg=alg: miso_ber_vs_ibo(
            channel="rayleigh", algorithm=alg, n_ant=1, ebn0_db=20.0,
            ibo_min=0.0, ibo_max=9.5, ibo_step=0.5, n_err_min=100_000,
            bits_sent_max=1_000_000, batch=64, verbose=False))

    # 4. step-1 nant64 coded grids
    coded = [("1/3", -5.0, 10.0), ("2/3", 0.0, 20.0), ("3/4", 0.0, 20.0)]
    for rate, e0, e1 in coded:
        num, den = rate.split("/")
        nm = (f"ldpc_{num}_{den}_ber_vs_ebn0_cnc_los_nant64_ibo0"
              f"_ebn0_min{int(e0)}_max{int(e1)}_step1.00"
              f"_niter1_2_3_4_5_6_7_8")
        if have(nm):
            continue
        job(nm, lambda rate=rate, e0=e0, e1=e1, num=num, den=den:
            transport_coded_ber(
                channel="los", algorithm="cnc", n_ant=64, ibo_db=0.0,
                n_iters=8, code_rate=float(num) / float(den), rv=0,
                ldpc_iters=12, ldpc_algorithm="sumprod",
                exact_payload=True, serial_decode=16,
                csv_kind=f"ldpc_{num}_{den}_ber_vs_ebn0",
                ebn0_min=e0, ebn0_max=e1, ebn0_step=1.0,
                n_err_min=20_000, bits_sent_max=10_000_000, batch=16,
                verbose=True))

    print("\nround5 fill9: all scheduled jobs processed", flush=True)


if __name__ == "__main__":
    main()
