"""Round-3 TPU batch #2: NR-LDPC surrogate sensitivity + remaining coded
rates + performance re-measurement.

1. ldpc_table_sensitivity — 3 surrogate draws (sumprod) + minsum on the
   reference-parity rate-1/2 nant16 config (VERDICT r2 item 6).
2. ldpc_ref_ber at the remaining committed rates (1/3, 2/3, 3/4, 7/8,
   nant16, taps 0-3) for comparison against
   reference/figs/csv_results/ldpc_*_nant16_*.csv.
3. Single-chip batch-scaling curve 64..4096 (VERDICT item 8) via
   scripts/profile_breakdown.py sections.
4. Stage ablation re-run with the shipped (planar bf16) default
   (VERDICT item 5).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/run_ldpc_perf_r3.py
"""

import json
import os
import subprocess
import sys
import time

from mimo_ofdm_tpu.experiments import EXPERIMENTS


def stage(name):
    print(f"\n=== [{time.strftime('%H:%M:%S')}] {name} ===", flush=True)


def main():
    t0 = time.time()

    stage("ldpc_table_sensitivity (3 draws sumprod + minsum, rate 1/2 nant16)")
    out = EXPERIMENTS["ldpc_table_sensitivity"](
        draws=(0, 1, 2), code_rate_str="1/2", n_ant=16, n_iters=3,
        ldpc_iters=12, ebn0_min=5.0, ebn0_max=15.0, ebn0_step=2.0,
        n_err_min=20_000, bits_sent_max=10_000_000, batch=16, seed=0)
    res = {k: {"ebn0": v[0].tolist(), "ber": v[1].tolist()}
           for k, (v) in ((k, v) for k, v in out.items())}
    os.makedirs("figs/ldpc", exist_ok=True)
    with open("figs/ldpc/table_sensitivity_r3.json", "w") as f:
        json.dump(res, f, indent=1)

    for rate in ("1/3", "2/3", "3/4", "7/8"):
        stage(f"ldpc_ref_ber rate {rate} nant16")
        EXPERIMENTS["ldpc_ref_ber"](code_rate_str=rate, n_ant=16, n_iters=3,
                                    ldpc_iters=12, seed=3)

    stage("batch-scaling + ablation re-run (profile_breakdown)")
    env = dict(os.environ)
    env["PROFILE_SECTIONS"] = "variants,batch"
    subprocess.run([sys.executable, "scripts/profile_breakdown.py"],
                   env=env, check=False)

    print(f"\nALL DONE in {(time.time() - t0) / 60:.1f} min", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
