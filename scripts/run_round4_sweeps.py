"""Round-4 ground-truth production runs (real TPU, sequential).

Produces every CSV the round-4 comparator additions need:

1. fixed-BER covering grids (24 committed files; scripts/run_fixed_ber_grids.py)
2. legacy unprefixed ``ldpc_ber_vs_ebn0_*`` family (identified: rate 1/3, 12-iteration decoder)
3. ``ldpc_in_loop_*`` (4 files)
4. ``nvadj_ldpc_3_4_*`` (2 files, TDL substitute channel, serial decode
   for the BG1 Zc=224 Mosaic workaround)
5. ``no_noise_ber_vs_ibo_*`` (2 files)
6. TDL re-comparison sweep (cnc tdl_3gpp nant64) with the CDL-style
   subpath model
7. 3-user MU radiation pattern at the consumer's exact config
   (nant128, npoints 1800, nsnap 10)

Run:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/run_round4_sweeps.py [stage ...]
Stages: fixed ldpc_legacy in_loop nvadj no_noise tdl mu128 (default: all).
Prints progress with flush; never killed mid-TPU-call (let it finish).
"""

import sys
import time

import numpy as np


def stage_fixed():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "run_fixed_ber_grids",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "run_fixed_ber_grids.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(list(mod.GRIDS))


def stage_ldpc_legacy():
    from mimo_ofdm_tpu.experiments.ber_sweeps import transport_coded_ber
    for alg, nant, e0, e1 in (("cnc", 16, -5.0, 4.0), ("mcnc", 16, -5.0, 4.0),
                              ("cnc", 4, -5.0, 4.0), ("cnc", 1, -5.0, 4.0),
                              ("cnc", 1, 5.0, 20.0)):
        print(f"--- legacy ldpc {alg} nant{nant} ebn0 {e0}..{e1} ---",
              flush=True)
        transport_coded_ber(
            channel="los", algorithm=alg, n_ant=nant, ibo_db=0.0, n_iters=3,
            code_rate=1.0 / 3.0, rv=0, ldpc_iters=12,
            ldpc_algorithm="sumprod",
            exact_payload=True, csv_kind="ldpc_ber_vs_ebn0",
            ebn0_min=e0, ebn0_max=e1, ebn0_step=1.0,
            n_err_min=20_000, bits_sent_max=10_000_000, batch=16,
            verbose=True)


def stage_in_loop():
    from mimo_ofdm_tpu.experiments.ber_sweeps import ldpc_in_loop_ber
    for alg in ("cnc", "mcnc"):
        for e0, e1, es in ((-5.0, 4.0, 1.0), (-2.0, 2.0, 0.5)):
            print(f"--- ldpc_in_loop {alg} ebn0 {e0}..{e1} step {es} ---",
                  flush=True)
            ldpc_in_loop_ber(code_rate_str="1/3", channel="los",
                             algorithm=alg, n_ant=16, n_iters=3,
                             ldpc_iters=12, ebn0_min=e0, ebn0_max=e1,
                             ebn0_step=es, n_err_min=20_000,
                             bits_sent_max=10_000_000, batch=16,
                             verbose=True)


def stage_nvadj():
    from mimo_ofdm_tpu.experiments.ber_sweeps import nvadj_ldpc_ber
    for alg in ("cnc", "mcnc"):
        print(f"--- nvadj {alg} ---", flush=True)
        nvadj_ldpc_ber(code_rate_str="3/4", channel="tdl_3gpp",
                       algorithm=alg, n_ant=16, n_iters=3, ldpc_iters=12,
                       ebn0_min=-5.0, ebn0_max=15.0, ebn0_step=2.0,
                       n_err_min=20_000, bits_sent_max=10_000_000,
                       batch=16, serial_decode=16, verbose=True)


def stage_no_noise():
    from mimo_ofdm_tpu.experiments.ber_sweeps import miso_ber_vs_ibo
    for alg, ebn0 in (("cnc", 15.0), ("mcnc", 18.0)):
        print(f"--- no_noise ber_vs_ibo {alg} ---", flush=True)
        miso_ber_vs_ibo(channel="los", algorithm=alg, n_ant=16,
                        ebn0_db=ebn0, ibo_values=np.arange(-5.0, 7.01, 0.5),
                        n_iters=8, n_err_min=100_000,
                        bits_sent_max=1_000_000, batch=64, no_noise=True,
                        verbose=True)


def stage_tdl():
    from mimo_ofdm_tpu.experiments.ber_sweeps import miso_ber_vs_ebn0
    print("--- tdl_3gpp (CDL-subpath) cnc nant64 ---", flush=True)
    miso_ber_vs_ebn0(channels=("tdl_3gpp",), algorithm="cnc", n_ant=64,
                     ibo_db=0.0, n_iters=8, ebn0_min=5.0, ebn0_max=20.0,
                     ebn0_step=1.0, n_err_min=100_000,
                     bits_sent_max=10_000_000, batch=64, verbose=True)


def stage_mu128():
    from mimo_ofdm_tpu.experiments.spatial import mu_radiation_pattern
    print("--- 3-user MU radiation pattern nant128 npoints1800 ---",
          flush=True)
    mu_radiation_pattern(channel="two_path", n_ant_values=(128,),
                         usr_angles=(45.0, 120.0, 150.0), ibo_db=3.0,
                         psd_angle_deg=78.0, n_points=1800, n_snapshots=10,
                         radial_distance=300.0, n_samp_per_seg=2048,
                         verbose=True)


STAGES = {"fixed": stage_fixed, "ldpc_legacy": stage_ldpc_legacy,
          "in_loop": stage_in_loop, "nvadj": stage_nvadj,
          "no_noise": stage_no_noise, "tdl": stage_tdl, "mu128": stage_mu128}


def main():
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        t0 = time.time()
        print(f"===== stage {name} =====", flush=True)
        try:
            STAGES[name]()
            print(f"===== stage {name} done in {time.time() - t0:.0f}s =====",
                  flush=True)
        except Exception as e:
            print(f"===== stage {name} FAILED: {e!r} =====", flush=True)


if __name__ == "__main__":
    main()
