"""Round-5 TPU batch 2: perf measurements + coded GSCM arm.

Runs after run_round5_fill.py (launch via the chain wrapper):
  1. GSCM vs TDL throughput (VERDICT item 1 "within 1.5x" criterion)
  2. MCNC roofline measurement (VERDICT item 3)
  3. plain rate-3/4 coded run on the GSCM for the committed
     ldpc_3_4_*_quadriga files (upgrades their N/A rule to a comparison)
  4. bench.py (drift-proofed) to reconcile the README headline
"""

import importlib
import json
import os
import subprocess
import sys
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OD = os.path.join(REPO, "figs", "csv_results")
sys.path.insert(0, HERE)


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
    if not os.path.exists(os.path.join(REPO, "figs", "profiling",
                                       "gscm_throughput.json")):
        job("gscm_throughput",
            importlib.import_module("gscm_throughput").main)
    if not os.path.exists(os.path.join(REPO, "figs", "profiling",
                                       "mcnc_roofline.json")):
        job("mcnc_roofline", importlib.import_module("mcnc_roofline").main)

    # scenario identification for the committed cnc_quadriga_nant8 file
    gc = importlib.import_module("gscm_compare")
    done = {}
    if os.path.exists(gc.OUT):
        done = json.load(open(gc.OUT))
    if "cnc_nant8_nlos" in gc.ARMS and "cnc_nant8_nlos" not in done:
        job("gscm arm cnc_nant8_nlos",
            lambda: gc.main_arms(["cnc_nant8_nlos"]))

    from mimo_ofdm_tpu.experiments.ber_sweeps import transport_coded_ber
    for alg in ("cnc", "mcnc"):
        nm = (f"ldpc_3_4_ber_vs_ebn0_{alg}_gscm_nant16_ibo0"
              f"_ebn0_min-5_max15_step2.00_niter1_2_3")
        if os.path.exists(os.path.join(OD, nm + ".csv")):
            continue
        job(nm, lambda alg=alg: transport_coded_ber(
            channel="gscm", algorithm=alg, n_ant=16, ibo_db=0.0, n_iters=3,
            code_rate=0.75, rv=0, ldpc_iters=12, ldpc_algorithm="sumprod",
            exact_payload=True, serial_decode=16,
            csv_kind="ldpc_3_4_ber_vs_ebn0",
            ebn0_min=-5.0, ebn0_max=15.0, ebn0_step=2.0,
            n_err_min=20_000, bits_sent_max=10_000_000, batch=16,
            verbose=True))

    def cnc_batch_probe():
        import jax
        import jax.numpy as jnp
        import numpy as np
        import time as _t
        from mimo_ofdm_tpu.utils.config import (canonical_miso_cnc,
                                                ChannelConfig)
        from mimo_ofdm_tpu.models.link import make_round_fn
        cfg, _ = canonical_miso_cnc()
        cfg = cfg.replace(channel=ChannelConfig(model="rayleigh"))
        key = jax.random.key(0)
        snr = jnp.float32(15.0)

        def consume(c):
            return int(np.asarray(c.clean_err)) + int(np.asarray(c.dist_err)[0])

        fns = {}
        for b in (768, 1024, 1536, 2048):
            fn = make_round_fn(cfg, n_iters=8, batch=b)
            consume(fn(key, snr))
            for i in range(2):
                consume(fn(jax.random.fold_in(key, i), snr))
            fns[b] = fn
        wins = {b: [] for b in fns}
        for w in range(4):
            for b, fn in fns.items():
                t0 = _t.perf_counter()
                n = 0
                pend = []
                for _ in range(2):
                    pend.append(fn(jax.random.fold_in(key, 100 * w + n), snr))
                    n += 1
                while _t.perf_counter() - t0 < 2.0:
                    pend.append(fn(jax.random.fold_in(key, 100 * w + n), snr))
                    n += 1
                    consume(pend.pop(0))
                for p in pend:
                    consume(p)
                wins[b].append(n * b / (_t.perf_counter() - t0))
        med = {b: float(__import__("numpy").median(v))
               for b, v in wins.items()}
        print("CNC batch medians:", med, flush=True)
        with open(os.path.join(REPO, "figs", "profiling",
                               "cnc_batch_probe.json"), "w") as f:
            json.dump({"windows": {str(k): v for k, v in wins.items()},
                       "medians": {str(k): v for k, v in med.items()}}, f,
                      indent=1)

    job("cnc batch probe", cnc_batch_probe)

    def run_bench():
        out = subprocess.run([sys.executable,
                              os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True, cwd=REPO)
        print(out.stdout)
        print(out.stderr[-2000:] if out.stderr else "")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if line:
            with open(os.path.join(REPO, "figs", "profiling",
                                   "bench_r5_precheck.json"), "w") as f:
                f.write(line[-1])

    job("bench precheck", run_bench)
    print("\nround5 fill2: all jobs processed", flush=True)


if __name__ == "__main__":
    main()
