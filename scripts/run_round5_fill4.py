"""Round-5 TPU batch 4: convert remaining justified-N/A families into
same-name reproductions (CSI-eps grid, IBO variants, denser windows,
small-array variants). Resumable via have() guards; prioritized so an
early stop still maximizes ledger coverage.

  PYTHONPATH=/root/.axon_site:/root/repo nohup python \
      scripts/run_round5_fill4.py > figs/profiling/round5_fill4.log 2>&1 &
"""

import os
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OD = os.path.join(REPO, "figs", "csv_results")


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
    from mimo_ofdm_tpu.experiments.ber_sweeps import (csi_err_ber_vs_ebn0,
                                                      miso_ber_vs_ebn0)

    iters9 = "niter1_2_3_4_5_6_7_8"

    # 1. CSI-eps grid, step-1 window (the largest N/A block)
    for chan, alg, eps_list in (
            ("los", "cnc", (0.0, 0.01, 0.18, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7)),
            ("los", "mcnc", (0.0, 0.01, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7)),
            ("rayleigh", "cnc", (0.01, 0.1, 0.2)),
            ("rayleigh", "mcnc", (0.01, 0.1))):
        todo = [e for e in eps_list if not have(
            f"ber_vs_ebn0_{alg}_{chan}_csi_eps{e:.3f}_nant64_ibo0"
            f"_ebn0_min5_max20_step1.00_{iters9}")]
        if todo:
            job(f"csi_err {alg} {chan} eps {todo}",
                lambda alg=alg, chan=chan, todo=tuple(todo):
                csi_err_ber_vs_ebn0(channel=chan, algorithm=alg,
                                    csi_eps=todo, ebn0_step=1.0,
                                    n_err_min=100_000,
                                    bits_sent_max=10_000_000, batch=64,
                                    verbose=False))

    # 2. IBO-1 / IBO-3 variants of the canonical curves
    for alg in ("cnc", "mcnc"):
        for chan in ("los", "two_path", "rayleigh"):
            for ibo in (1.0, 3.0):
                nm = (f"ber_vs_ebn0_{alg}_{chan}_nant64_ibo{int(ibo)}"
                      f"_ebn0_min5_max20_step1.00_{iters9}")
                if have(nm):
                    continue
                job(nm, lambda alg=alg, chan=chan, ibo=ibo:
                    miso_ber_vs_ebn0(channels=(chan,), algorithm=alg,
                                     n_ant=64, ibo_db=ibo, ebn0_step=1.0,
                                     n_err_min=100_000,
                                     bits_sent_max=10_000_000, batch=64,
                                     verbose=False))

    # 3. denser step-0.5 windows at the canonical config
    for alg in ("cnc", "mcnc"):
        for chan in ("los", "two_path", "rayleigh"):
            nm = (f"ber_vs_ebn0_{alg}_{chan}_nant64_ibo0"
                  f"_ebn0_min5_max20_step0.50_{iters9}")
            if have(nm):
                continue
            job(nm, lambda alg=alg, chan=chan:
                miso_ber_vs_ebn0(channels=(chan,), algorithm=alg, n_ant=64,
                                 ibo_db=0.0, ebn0_step=0.5,
                                 n_err_min=100_000,
                                 bits_sent_max=10_000_000, batch=64,
                                 verbose=False))

    # 4. small-array / window variants (exact committed shapes)
    small_jobs = [
        # (alg, chan, n_ant, ibo, e0, e1, estep, n_iters)
        ("cnc", "los", 1, 0, 5, 20, 1.0, 8),
        ("cnc", "los", 4, 0, 5, 25, 1.0, 8),
        ("cnc", "rayleigh", 1, 0, 5, 20, 1.0, 8),
        ("cnc", "rayleigh", 1, 0, 5, 25, 1.0, 8),
        ("cnc", "rayleigh", 4, 0, 5, 25, 1.0, 8),
        ("cnc", "two_path", 1, 0, 5, 20, 1.0, 8),
        ("cnc", "two_path", 4, 0, 5, 25, 1.0, 8),
        ("mcnc", "los", 1, 0, 5, 20, 0.5, 8),
        ("mcnc", "los", 4, 0, 5, 25, 1.0, 8),
        ("mcnc", "rayleigh", 1, 0, 5, 20, 0.5, 8),
        ("mcnc", "rayleigh", 1, 0, 5, 25, 1.0, 8),
        ("mcnc", "rayleigh", 4, 0, 5, 25, 1.0, 8),
        ("mcnc", "two_path", 1, 0, 5, 20, 0.5, 8),
        ("mcnc", "two_path", 4, 0, 5, 25, 1.0, 8),
        ("cnc", "los", 1, 50, 5, 20, 1.0, 3),
        ("cnc", "two_path", 1, 20, 5, 20, 1.0, 8),
        ("mcnc", "random_paths", 4, 0, 5, 20, 1.0, 8),
    ]
    from mimo_ofdm_tpu.utils import results as res_mod
    import numpy as np
    for alg, chan, n_ant, ibo, e0, e1, es, n_it in small_jobs:
        ebn0 = np.arange(e0, e1 + es / 2, es)
        nm = res_mod.ber_sweep_filename(
            "ber_vs_ebn0", alg, chan, n_ant, float(ibo), ebn0,
            list(range(1, n_it + 1)))
        if have(nm):
            continue
        job(nm, lambda alg=alg, chan=chan, n_ant=n_ant, ibo=ibo, e0=e0,
                e1=e1, es=es, n_it=n_it:
            miso_ber_vs_ebn0(channels=(chan,), algorithm=alg, n_ant=n_ant,
                             ibo_db=float(ibo), n_iters=n_it, ebn0_min=e0,
                             ebn0_max=e1, ebn0_step=es, n_err_min=100_000,
                             bits_sent_max=10_000_000, batch=64,
                             verbose=False))

    # 5. truncated niter1 nant16 partials
    for alg in ("cnc", "mcnc"):
        nm = (f"ber_vs_ebn0_{alg}_los_nant16_ibo0"
              f"_ebn0_min15_max20_step1.00_niter1")
        if have(nm):
            continue
        job(nm, lambda alg=alg: miso_ber_vs_ebn0(
            channels=("los",), algorithm=alg, n_ant=16, ibo_db=0.0,
            n_iters=1, ebn0_min=15.0, ebn0_max=20.0, ebn0_step=1.0,
            n_err_min=100_000, bits_sent_max=10_000_000, batch=64,
            verbose=False))

    # 6. CSI-eps denser step-0.5 variants
    for alg in ("cnc", "mcnc"):
        todo = [e for e in (0.0, 0.1, 0.2, 0.3, 0.4) if not have(
            f"ber_vs_ebn0_{alg}_los_csi_eps{e:.3f}_nant64_ibo0"
            f"_ebn0_min5_max20_step0.50_{iters9}")]
        if todo:
            job(f"csi_err {alg} los step0.5 eps {todo}",
                lambda alg=alg, todo=tuple(todo):
                csi_err_ber_vs_ebn0(channel="los", algorithm=alg,
                                    csi_eps=todo, ebn0_step=0.5,
                                    n_err_min=100_000,
                                    bits_sent_max=10_000_000, batch=64,
                                    verbose=False))

    print("\nround5 fill4: all scheduled jobs processed", flush=True)


if __name__ == "__main__":
    main()
