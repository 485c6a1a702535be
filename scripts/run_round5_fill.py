"""Round-5 TPU batch: fill the committed-CSV ledger + replot inputs.

Serial, resumable job list (each job skips itself if its output CSV
already exists). Run as ONE background process writing to a log
(CLAUDE.md: long TPU work = one process, no timeout-kills):

  PYTHONPATH=/root/.axon_site:/root/repo nohup python \
      scripts/run_round5_fill.py > figs/profiling/round5_fill.log 2>&1 &

Priority order:
  1. alpha_vs_tx_pow nant64 (VERDICT item 4 + alpha_per_ant replot input)
  2. ber_vs_ibo LOS nant64 cnc+mcnc at ebn0 15 and 1000, IBO -9..9
     (berin_berout replot inputs + same-name ledger files)
  3. SDR quadriga comparison on the GSCM (scripts/sdr_quadriga_compare)
  4. legacy SDR units identification (scripts/identify_legacy_sdr)
  5. GSCM nant8 quadriga arms (scripts/gscm_compare cnc/mcnc_nant8)
  6. nvadj coded family re-run on the GSCM (VERDICT item 1 tail)
  7. random-paths named variants (same-name ledger files)
  8. remaining same-name ber_vs_ibo / ber_vs_ebn0 variants (cheap ones
     first), csi_noise max25 windows, mcnc ber_vs_nant
"""

import os
import sys
import time
import traceback

import numpy as np

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
    from mimo_ofdm_tpu.experiments.ber_sweeps import (miso_ber_vs_ebn0,
                                                      miso_ber_vs_ibo,
                                                      miso_ber_vs_nant,
                                                      csi_noise_ber_vs_ebn0,
                                                      nvadj_ldpc_ber)
    from mimo_ofdm_tpu.experiments.misc_evals import alpha_vs_tx_pow

    # 1. alpha at nant64
    if not have("alpha_vs_tx_pow_per_ant_nant64_ibo0"):
        job("alpha_vs_tx_pow nant64", lambda: alpha_vs_tx_pow(n_ant=64))

    # 2. the berin/berout replot inputs (and same-name ledger files)
    for ebn0 in (15.0, 1000.0):
        for alg in ("cnc", "mcnc"):
            nm = (f"ber_vs_ibo_{alg}_los_nant64_ebn0_{int(ebn0)}"
                  f"_ibo_min-9_max9_step0.50_niter1_2_3_4_5_6_7_8")
            if have(nm):
                continue
            job(nm, lambda alg=alg, ebn0=ebn0: miso_ber_vs_ibo(
                channel="los", algorithm=alg, n_ant=64, ebn0_db=ebn0,
                ibo_min=-9.0, ibo_max=9.5, ibo_step=0.5,
                n_err_min=100_000, bits_sent_max=1_000_000, batch=64,
                verbose=False))

    # 3 + 4. SDR evidence blocks
    if not os.path.exists(os.path.join(REPO, "figs", "profiling",
                                       "sdr_quadriga.json")):
        import importlib
        sys.path.insert(0, HERE)
        job("sdr_quadriga_compare",
            importlib.import_module("sdr_quadriga_compare").main)
    if not os.path.exists(os.path.join(REPO, "figs", "profiling",
                                       "legacy_sdr_identify.json")):
        import importlib
        sys.path.insert(0, HERE)
        job("identify_legacy_sdr",
            importlib.import_module("identify_legacy_sdr").main)

    # 5. GSCM nant8 arms
    import importlib
    sys.path.insert(0, HERE)
    gc = importlib.import_module("gscm_compare")
    import json
    done = {}
    if os.path.exists(gc.OUT):
        done = json.load(open(gc.OUT))
    for arm in ("cnc_nant8", "mcnc_nant8"):
        if arm in gc.ARMS and arm not in done:
            job(f"gscm arm {arm}", lambda arm=arm: gc.main_arms([arm]))

    # 6. nvadj on the GSCM (the committed files' actual channel class)
    for alg in ("cnc", "mcnc"):
        nm = (f"nvadj_ldpc_3_4_ber_vs_ebn0_{alg}_gscm_nant16_ibo0"
              f"_ebn0_min-5_max15_step2.00_niter1_2_3")
        if have(nm):
            continue
        job(nm, lambda alg=alg: nvadj_ldpc_ber(
            channel="gscm", algorithm=alg, verbose=True))

    # 7. random-paths named variants (reference channel-string suffixes:
    #    random_paths{n}_{100n|1u} = n paths, 100 ns / 1 us max delay)
    for alg in ("cnc", "mcnc"):
        for n_paths in (3, 8):
            for tag, delay in (("100n", 100e-9), ("1u", 1e-6)):
                nm = (f"ber_vs_ebn0_{alg}_random_paths{n_paths}_{tag}_nant16"
                      f"_ibo0_ebn0_min5_max25_step1.00_niter1_2_3_4_5_6_7_8")
                if have(nm):
                    continue
                job(nm, lambda alg=alg, n_paths=n_paths, tag=tag,
                        delay=delay: miso_ber_vs_ebn0(
                    channels=("random_paths",), algorithm=alg, n_ant=16,
                    ibo_db=0.0, n_iters=8, ebn0_min=5.0, ebn0_max=25.0,
                    ebn0_step=1.0, n_err_min=100_000,
                    bits_sent_max=10_000_000, batch=64,
                    channel_kwargs={"n_paths": n_paths,
                                    "max_delay_spread": delay},
                    save_suffix=f"{n_paths}_{tag}", verbose=False))
    nm = ("ber_vs_ebn0_mcnc_random_paths_nant4_ibo0_ebn0_min5_max20"
          "_step1.00_niter1_2_3_4_5_6_7_8")
    if not have(nm):
        job(nm, lambda: miso_ber_vs_ebn0(
            channels=("random_paths",), algorithm="mcnc", n_ant=4,
            ibo_db=0.0, n_iters=8, ebn0_min=5.0, ebn0_max=20.0,
            ebn0_step=1.0, n_err_min=100_000, bits_sent_max=10_000_000,
            batch=64, verbose=False))

    # 8a. csi_noise extended windows (max25)
    for alg, dbs in (("mcnc", (10, 15, 20)),):
        for db in dbs:
            nm = (f"ber_vs_ebn0_{alg}_los_csi_noise_db{db}_nant16_ibo0"
                  f"_ebn0_min5_max25_step1.00_niter1_2_3_4_5_6_7_8")
            if have(nm):
                continue
            job(nm, lambda alg=alg, db=db: csi_noise_ber_vs_ebn0(
                algorithm=alg, csi_snr_db=(db,), n_ant=16,
                ebn0_min=5.0, ebn0_max=25.0, ebn0_step=1.0,
                verbose=False))

    # 8c. cheap same-name ber_vs_ibo variants at nant64
    ibo_variants = [
        ("cnc", "los", 10, 0.0, 9.5, 0.5), ("mcnc", "los", 10, 0.0, 9.5, 0.5),
        ("cnc", "los", 12, -9.0, 9.5, 0.5), ("mcnc", "los", 12, -9.0, 9.5, 0.5),
        ("cnc", "los", 18, -9.0, 9.5, 0.5), ("mcnc", "los", 18, -9.0, 9.5, 0.5),
        ("cnc", "los", 20, 0.0, 9.5, 0.5), ("mcnc", "los", 20, 0.0, 9.5, 0.5),
        ("cnc", "two_path", 10, 0.0, 9.5, 0.5),
        ("cnc", "los", 15, -3.0, 3.5, 2.0), ("mcnc", "los", 15, -3.0, 3.5, 2.0),
        ("cnc", "los", 1000, -3.0, 3.5, 2.0),
        ("mcnc", "los", 1000, -3.0, 3.5, 2.0),
        ("cnc", "los", 1000, 0.0, 9.5, 0.5),
        ("mcnc", "los", 1000, 0.0, 9.5, 0.5),
        ("cnc", "los", 15, 0.0, 8.5, 0.5), ("mcnc", "los", 15, 0.0, 8.5, 0.5),
        ("cnc", "two_path", 15, 0.0, 8.5, 0.5),
        ("mcnc", "two_path", 15, 0.0, 8.5, 0.5),
        ("mcnc", "rayleigh", 15, 0.0, 8.5, 0.5),
    ]
    for alg, chan, ebn0, lo, hi, st in ibo_variants:
        iv = np.arange(lo, hi, st)
        nm = (f"ber_vs_ibo_{alg}_{chan}_nant64_ebn0_{int(ebn0)}"
              f"_ibo_min{int(min(iv))}_max{int(max(iv))}_step{st:1.2f}"
              f"_niter1_2_3_4_5_6_7_8")
        if have(nm):
            continue
        job(nm, lambda alg=alg, chan=chan, ebn0=ebn0, lo=lo, hi=hi, st=st:
            miso_ber_vs_ibo(channel=chan, algorithm=alg, n_ant=64,
                            ebn0_db=ebn0, ibo_min=lo, ibo_max=hi,
                            ibo_step=st, n_err_min=100_000,
                            bits_sent_max=1_000_000, batch=64,
                            verbose=False))

    # 8d. small-array ber_vs_ibo variants (fast)
    for alg in ("cnc", "mcnc"):
        for chan in ("los", "two_path", "rayleigh"):
            for nant in (1, 4):
                nm = (f"ber_vs_ibo_{alg}_{chan}_nant{nant}_ebn0_15"
                      f"_ibo_min0_max9_step0.50_niter1_2_3_4_5_6_7_8")
                if have(nm):
                    continue
                job(nm, lambda alg=alg, chan=chan, nant=nant:
                    miso_ber_vs_ibo(channel=chan, algorithm=alg,
                                    n_ant=nant, ebn0_db=15.0,
                                    ibo_min=0.0, ibo_max=9.5, ibo_step=0.5,
                                    n_err_min=100_000,
                                    bits_sent_max=1_000_000, batch=64,
                                    verbose=False))
        nm = (f"ber_vs_ibo_{alg}_los_nant16_ebn0_15"
              f"_ibo_min-5_max7_step0.50_niter1_2_3_4_5_6_7_8")
        if not have(nm):
            job(nm, lambda alg=alg: miso_ber_vs_ibo(
                channel="los", algorithm=alg, n_ant=16, ebn0_db=15.0,
                ibo_min=-5.0, ibo_max=7.5, ibo_step=0.5,
                n_err_min=100_000, bits_sent_max=1_000_000, batch=64,
                verbose=False))

    # last (slowest): mcnc ber_vs_nant up to 128 antennas
    nm = ("ber_vs_nant_mcnc_nant1_2_4_8_16_32_64_128_ebn0_15_ibo0"
          "_niter1_2_3_4_5_6_7_8")
    if not have(nm):
        job(nm, lambda: miso_ber_vs_nant(algorithm="mcnc", verbose=False))

    print("\nround5 fill: all scheduled jobs processed", flush=True)


if __name__ == "__main__":
    main()
