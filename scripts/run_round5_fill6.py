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
    print("\nround5 fill6: all scheduled jobs processed", flush=True)


if __name__ == "__main__":
    main()
