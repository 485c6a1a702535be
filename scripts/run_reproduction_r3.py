"""Round-3 ground-truth reproduction runs (VERDICT r2 items 1 and 2).

Runs, at the reference's exact configurations and stop criteria, the
experiment families whose committed ground-truth CSVs were never compared:

1. BER vs IBO    — cnc/los/nant64, mcnc/los/nant64, cnc/rayleigh/nant64
   (``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ibo.py``,
   targets ``reference/figs/csv_results/ber_vs_ibo_*_ebn0_15_*.csv``)
2. fixed-BER grid — cnc/rayleigh/nant64, Eb/N0 10..22 x IBO 0..7.5
   (``.../main_miso_cnc_constant_ber_req_ebn0_vs_ibo.py``, target
   ``fixed_ber1.0e-02_cnc_rayleigh_nant64_ebn0_min10_max22_step0.50_ibo_min0_max7_step0.50_*.csv``)
3. multi-user     — mr + zf, 2 users at +-30 deg / 100 & 316.3 m
   (``reference/main_multiuser/main_multiuser_cnc_ber_vs_ebn0.py``, targets
   ``ber_vs_ebn0_mu_{mr,zf}_cnc_los_nant64_*.csv``)
4. TDL substitute — cnc/tdl_3gpp(uma_los->TDL-D)/nant64 Eb/N0 5..20
   (compared against ``ber_vs_ebn0_cnc_3GPP_38.901_UMa_LOS_nant64_ibo0_ebn0_min5_max20_step1.00_*.csv``)

Writes CSVs with the reference's exact filenames into figs/csv_results/.
Run from /root/repo:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/run_reproduction_r3.py
"""

import sys
import time

from mimo_ofdm_tpu.experiments import EXPERIMENTS


def stage(name):
    print(f"\n=== [{time.strftime('%H:%M:%S')}] {name} ===", flush=True)


def main():
    t0 = time.time()

    stage("ber_vs_ibo cnc/los/nant64 ebn0=15 ibo 0..9 step 0.5")
    EXPERIMENTS["miso_ber_vs_ibo"](channel="los", algorithm="cnc", n_ant=64,
                                   ebn0_db=15.0, seed=31)

    stage("ber_vs_ibo cnc/rayleigh/nant64 ebn0=15 ibo 0..8 step 0.5")
    EXPERIMENTS["miso_ber_vs_ibo"](channel="rayleigh", algorithm="cnc",
                                   n_ant=64, ebn0_db=15.0, ibo_max=8.5,
                                   seed=32)

    stage("ber_vs_ibo mcnc/los/nant64 ebn0=15 ibo 0..9 step 0.5")
    EXPERIMENTS["miso_ber_vs_ibo"](channel="los", algorithm="mcnc", n_ant=64,
                                   ebn0_db=15.0, seed=33)

    stage("fixed_ber grid cnc/rayleigh/nant64 (16 IBO x 25 Eb/N0)")
    EXPERIMENTS["req_ebn0_vs_ibo"](channel="rayleigh", algorithm="cnc",
                                   n_ant=64, seed=34)

    stage("multiuser mr (2 usr, +-30 deg, 100/316.3 m)")
    EXPERIMENTS["multiuser_ber"](precoding="mrt", algorithm="cnc", n_ant=64,
                                 seed=35)

    stage("multiuser zf")
    EXPERIMENTS["multiuser_ber"](precoding="zf", algorithm="cnc", n_ant=64,
                                 seed=36)

    stage("ber_vs_ebn0 cnc/tdl_3gpp(TDL-D)/nant64 ebn0 5..20 step 1")
    EXPERIMENTS["miso_ber_vs_ebn0"](channels=("tdl_3gpp",), algorithm="cnc",
                                    n_ant=64, ebn0_min=5.0, ebn0_max=20.0,
                                    ebn0_step=1.0, seed=37)

    print(f"\nALL DONE in {(time.time() - t0) / 60:.1f} min", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
