"""Round-3 TPU batch #4: everything still pending from batches #2/#3.

1. Stage ablation + microbench + batch-scaling re-run with the shipped
   planar-bf16 default, incl. the new ``chan_c64`` variant
   (VERDICT r2 items 5 and 8) — refreshes
   ``figs/profiling/breakdown_tpu.json``.
2. ``ldpc_ref_ber`` at the two remaining committed rates (3/4, 7/8,
   nant16, taps 0-3) for comparison against
   ``reference/figs/csv_results/ldpc_{3_4,7_8}_*_nant16_*.csv``.
3. Batch #3 ground-truth families (SDR-vs-IBO grid, TOI curves,
   legacy CSI-noise, BER-vs-nant) via ``run_reproduction_r3b.py``.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/run_round3_finish.py
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def stage(name):
    print(f"\n=== [{time.strftime('%H:%M:%S')}] {name} ===", flush=True)


def main():
    t0 = time.time()
    from mimo_ofdm_tpu.experiments import EXPERIMENTS

    if os.environ.get("SKIP_PROFILE") != "1":
        stage("profile_breakdown re-run (planar default, variants+micro+batch)")
        env = dict(os.environ)
        env["PROFILE_SECTIONS"] = "variants,micro,batch"
        subprocess.run([sys.executable,
                        os.path.join(HERE, "profile_breakdown.py")],
                       env=env, check=False)

    if os.environ.get("SKIP_R3B") != "1":
        stage("run_reproduction_r3b (sdr grid, TOI, csi_noise, ber_vs_nant)")
        subprocess.run([sys.executable,
                        os.path.join(HERE, "run_reproduction_r3b.py")],
                       env=dict(os.environ), check=False)

    # Mosaic SIGSEGVs on the batched sum-product decoder for the C=2
    # transport codes (rates 3/4 and 7/8) — run them through the chunked
    # serial-decode path (bit-identical statistics, compiles everywhere)
    for rate in ("3/4", "7/8"):
        stage(f"ldpc_ref_ber rate {rate} nant16 (serial_decode=16)")
        try:
            EXPERIMENTS["ldpc_ref_ber"](code_rate_str=rate, n_ant=16,
                                        n_iters=3, ldpc_iters=12, seed=3,
                                        serial_decode=16)
        except Exception as e:
            print(f"FAILED rate {rate}: {str(e)[:300]}", flush=True)

    print(f"\nALL DONE in {(time.time() - t0) / 60:.1f} min", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
