"""SDR-vs-IBO on the native GSCM vs the 3 committed Quadriga SDR files.

Committed ground truth (reference/figs/csv_results/, linear ratios):
  sdr_vs_ibo_per_channel_ibo0to8_1_4_16_32_64nant_quadriga_los.csv
      rows [ibo(0..8 step .5), 5 x SDR per nant (1,4,16,32,64)]
  ..._quadriga_nlos.csv  — same layout
  sdr_vs_ibo_per_channel_ibo0to8_64nant_quadriga.csv
      rows [ibo(0..8 step .25), nant-major x (los, nlos) pairs for
      nant (1,4,16,32,64)] (cumulative save of the same run)

Runs :func:`mimo_ofdm_tpu.models.analysis.sdr_vs_ibo_curve` with the
``gscm`` channel (TR 38.901 UMa LOS / NLOS drops, ``models/gscm.py``)
at the same antenna counts and prints per-(scenario, nant) median
|Delta SDR| in dB. Writes figs/profiling/sdr_quadriga.json consumed by
``scripts/compare_reference_csv.py``.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/sdr_quadriga_compare.py
"""

import csv
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
RD = "/root/reference/figs/csv_results"
OUT = os.path.join(HERE, "..", "figs", "profiling", "sdr_quadriga.json")

NANTS = (1, 4, 16, 32, 64)


def load(name):
    return [np.array([float(x) for x in r])
            for r in csv.reader(open(os.path.join(RD, name + ".csv")))]


def main():
    import jax
    from mimo_ofdm_tpu.models.analysis import sdr_vs_ibo_curve
    from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig,
                                            LinkConfig, ModemConfig, PaConfig)

    ibo = np.arange(0.0, 8.01, 0.5)
    ours = {}
    for scen in ("uma_los", "uma_nlos"):
        per_nant = []
        for ai, n_ant in enumerate(NANTS):
            cfg = LinkConfig(
                modem=ModemConfig(constel_size=64, n_fft=4096,
                                  n_sub_carr=2048, cp_len=128),
                array=ArrayConfig(n_elements=n_ant),
                channel=ChannelConfig(model="gscm", gscm_scenario=scen),
                pa=PaConfig(model="softlim", ibo_db=0.0))
            db, lin = sdr_vs_ibo_curve(
                cfg, jax.random.fold_in(jax.random.key(0),
                                        17 * ai + (scen == "uma_nlos")),
                ibo, (212.0, 212.0, 1.5), n_snapshots=500)
            per_nant.append(lin)
            print(f"{scen} nant{n_ant}: SDR[dB] "
                  f"{np.array2string(10 * np.log10(lin), precision=2)}",
                  flush=True)
        ours[scen] = np.array(per_nant)        # [5, n_ibo] linear

    ev = {"ibo": ibo.tolist(), "files": {}}
    for scen, fname in (("uma_los",
                         "sdr_vs_ibo_per_channel_ibo0to8_1_4_16_32_64nant"
                         "_quadriga_los"),
                        ("uma_nlos",
                         "sdr_vs_ibo_per_channel_ibo0to8_1_4_16_32_64nant"
                         "_quadriga_nlos")):
        rows = load(fname)
        deltas = {}
        for ai, n_ant in enumerate(NANTS):
            ref_db = 10 * np.log10(np.interp(ibo, rows[0], rows[1 + ai]))
            our_db = 10 * np.log10(ours[scen][ai])
            deltas[f"nant{n_ant}"] = {
                "median_abs_delta_db": float(np.median(np.abs(our_db - ref_db))),
                "max_abs_delta_db": float(np.max(np.abs(our_db - ref_db))),
            }
        ev["files"][fname + ".csv"] = {"scenario": scen, "per_nant": deltas}
        print(fname, json.dumps(deltas), flush=True)

    # cumulative pair file: nant-major x (los, nlos), step 0.25
    rows = load("sdr_vs_ibo_per_channel_ibo0to8_64nant_quadriga")
    deltas = {}
    for ai, n_ant in enumerate(NANTS):
        for si, scen in enumerate(("uma_los", "uma_nlos")):
            ref_db = 10 * np.log10(np.interp(ibo, rows[0],
                                             rows[1 + 2 * ai + si]))
            our_db = 10 * np.log10(ours[scen][ai])
            deltas[f"nant{n_ant}_{scen}"] = {
                "median_abs_delta_db": float(np.median(np.abs(our_db - ref_db))),
                "max_abs_delta_db": float(np.max(np.abs(our_db - ref_db))),
            }
    ev["files"]["sdr_vs_ibo_per_channel_ibo0to8_64nant_quadriga.csv"] = {
        "scenario": "both", "per_nant": deltas}
    print(json.dumps(deltas), flush=True)

    with open(OUT, "w") as f:
        json.dump(ev, f, indent=1)


if __name__ == "__main__":
    main()
