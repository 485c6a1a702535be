"""Run the full fixed-BER (required-Eb/N0 vs IBO) grid family.

The reference commits 24 ``fixed_ber1.0e-02_*`` CSVs
(``/root/reference/figs/csv_results/``) spanning {cnc, mcnc} x
{los, two_path, rayleigh} x {nant 1, 64} at various (Eb/N0, IBO) grids
(generator: ``reference/main_clipping_noise_cancellation/
main_mp_miso_cnc_constant_ber_req_ebn0_vs_ibo.py``, stop criteria 1e5
errors / 1e6 bits per grid point). This script runs ONE covering grid per
(algorithm, channel, nant) combo — the union of the committed Eb/N0
ranges at the finest committed step — and saves our CSVs;
``scripts/compare_reference_csv.py`` then compares required-Eb/N0 curves
for every committed file against the covering run on the intersection of
their IBO grids.

One compiled executable per combo: IBO is a traced argument
(``make_round_fn(ibo_as_arg=True)``) and the Eb/N0 axis runs through the
cross-point pipelined scheduler.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/run_fixed_ber_grids.py [combo ...]
(combos: e.g. cnc_los_64; default = all 12)
"""

import sys
import time

from mimo_ofdm_tpu.experiments.ber_sweeps import req_ebn0_vs_ibo

# (algorithm, channel, n_ant, ebn0_min, ebn0_max_excl, ebn0_step, ibo_step)
# Committed-grid coverage:
#   nant64 cnc:  ebn0 10..22 step .5 / .25-step IBO (covers the .25 and .5
#                IBO-step files and the min10_max19 subsets)
#   nant64 mcnc: ebn0 10..22 step .5 / .5-step IBO
#   nant1 los/two_path: ebn0 10..22 step .5 / .5-step IBO
#   nant1 rayleigh: ebn0 10..28 step .25 / .25-step IBO (covers the
#                min10_max22, min20_max23 (.25 and .5) and min20_max28 files)
GRIDS = {}
for alg in ("cnc", "mcnc"):
    for chan in ("los", "two_path", "rayleigh"):
        ibo_step64 = 0.25 if alg == "cnc" else 0.5
        GRIDS[f"{alg}_{chan}_64"] = (alg, chan, 64, 10.0, 22.1, 0.5, ibo_step64)
        if chan == "rayleigh":
            GRIDS[f"{alg}_{chan}_1"] = (alg, chan, 1, 10.0, 28.1, 0.25, 0.25)
        else:
            GRIDS[f"{alg}_{chan}_1"] = (alg, chan, 1, 10.0, 22.1, 0.5, 0.5)


def main(combos):
    for name in combos:
        alg, chan, n_ant, e0, e1, es, ibs = GRIDS[name]
        t0 = time.time()
        print(f"=== {name}: {alg} {chan} nant{n_ant} "
              f"ebn0 {e0}..{e1} step {es}, ibo step {ibs} ===", flush=True)
        req_ebn0_vs_ibo(channel=chan, algorithm=alg, n_ant=n_ant,
                        ibo_min=0.0, ibo_max=7.01, ibo_step=ibs,
                        ebn0_min=e0, ebn0_max=e1, ebn0_step=es,
                        n_err_min=100_000, bits_sent_max=1_000_000,
                        batch=128, verbose=True)
        print(f"--- {name} done in {time.time() - t0:.0f}s ---", flush=True)


if __name__ == "__main__":
    combos = sys.argv[1:] or list(GRIDS)
    unknown = [c for c in combos if c not in GRIDS]
    if unknown:
        raise SystemExit(f"unknown combos {unknown}; choose from {list(GRIDS)}")
    main(combos)
