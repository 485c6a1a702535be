"""Round-3 TPU batch #3: the remaining committed ground-truth families.

1. ber_vs_nant (3 channels x nant 1..128, Eb/N0 15, IBO 0) — target
   ``ber_vs_nant_cnc_nant1_2_4_8_16_32_64_128_ebn0_15_ibo0_niter*.csv``.
2. TOI curves — targets ``toi_ber_vs_ebn0_cnc_two_path_nant1_ibo22``,
   ``..._nant1_ibo5``, ``..._nant4_ibo22``.
3. Legacy CSI-noise curves (cnc + mcnc, nant16, CSI SNR 10/15/20/30 dB)
   — targets ``ber_vs_ebn0_{cnc,mcnc}_los_csi_noise_db*_nant16_*``.
4. SDR vs IBO (nant 1/4/16/32/64 x 3 channels x IBO 0..8 step 0.25,
   500 snapshots) — target
   ``sdr_vs_ibo_per_channel_ibo0to8_1_4_16_32_64nant.csv``.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/run_reproduction_r3b.py
"""

import sys
import time

from mimo_ofdm_tpu.experiments import EXPERIMENTS


def stage(name):
    print(f"\n=== [{time.strftime('%H:%M:%S')}] {name} ===", flush=True)


def run(name, fn, **kw):
    stage(name)
    try:
        fn(**kw)
    except Exception as e:  # isolate: one failed family must not kill the batch
        print(f"FAILED {name}: {str(e)[:300]}", flush=True)


def main():
    t0 = time.time()

    run("sdr_vs_ibo full grid (5 nant x 3 chan x 33 IBO, 500 snaps)",
        EXPERIMENTS["sdr_vs_ibo"], seed=51)

    run("toi_ber_vs_ebn0 cnc/two_path nant1 TOI 22.75",
        EXPERIMENTS["toi_ber_vs_ebn0"], n_ant=1, toi_db=22.75, seed=52)
    run("toi_ber_vs_ebn0 cnc/two_path nant1 TOI 5",
        EXPERIMENTS["toi_ber_vs_ebn0"], n_ant=1, toi_db=5.0, seed=53)
    run("toi_ber_vs_ebn0 cnc/two_path nant4 TOI 22.75",
        EXPERIMENTS["toi_ber_vs_ebn0"], n_ant=4, toi_db=22.75, seed=54)

    run("csi_noise cnc nant16",
        EXPERIMENTS["csi_noise_ber_vs_ebn0"], algorithm="cnc", n_ant=16, seed=55)
    run("csi_noise mcnc nant16",
        EXPERIMENTS["csi_noise_ber_vs_ebn0"], algorithm="mcnc", n_ant=16, seed=56)

    run("ber_vs_nant (3 chan x nant 1..128)",
        EXPERIMENTS["miso_ber_vs_nant"], seed=57)

    print(f"\nALL DONE in {(time.time() - t0) / 60:.1f} min", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
