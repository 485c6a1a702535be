"""Identify the generator/units of the two odd committed SDR files.

``sdr_vs_ibo_per_channel_ibo0to7_32nant.csv`` (10 rows) and
``..._ibo0to8_128nant.csv`` (16 rows) look inconsistent with the
compared ``..._1_4_16_32_64nant.csv`` if read in that file's units
(linear ratios): LOS would sit 2.5 dB low and Rayleigh would saturate.
Hypothesis: they come from the *serial* generator
``reference/main_beampatterns_plotting/main_sdr_vs_ibo_vs_channel.py``,
whose ``n_ant_arr = [1, 4, 32, 64, 128]`` matches the row counts
(cumulative saves: 32nant = first 3 antenna counts, 128nant = all 5)
and which stores **dB values** (``to_db`` applied per symbol,
``:147-154``) instead of linear ratios.

This script measures our SDR curves at the serial antenna set and
scores both storage interpretations row by row; the winner (expected:
dB-stored, same physics) is recorded in
figs/profiling/legacy_sdr_identify.json for the comparator.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/identify_legacy_sdr.py
"""

import csv
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
RD = "/root/reference/figs/csv_results"
OUT = os.path.join(HERE, "..", "figs", "profiling",
                   "legacy_sdr_identify.json")

SERIAL_NANTS = (1, 4, 32, 64, 128)
CHANNELS = ("los", "two_path", "rayleigh")


def main():
    import jax
    from mimo_ofdm_tpu.models.analysis import sdr_vs_ibo_curve
    from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig,
                                            LinkConfig, PaConfig, ModemConfig)

    ibo = np.arange(0.0, 8.01, 0.25)
    our_db = {}
    for ai, n_ant in enumerate(SERIAL_NANTS):
        for ci, chan in enumerate(CHANNELS):
            cfg = LinkConfig(
                modem=ModemConfig(constel_size=64, n_fft=4096,
                                  n_sub_carr=2048, cp_len=128),
                array=ArrayConfig(n_elements=n_ant),
                channel=ChannelConfig(model=chan),
                pa=PaConfig(model="softlim", ibo_db=0.0))
            db, _ = sdr_vs_ibo_curve(
                cfg, jax.random.fold_in(jax.random.key(3), 10 * ai + ci),
                ibo, (212.0, 212.0, 1.5), n_snapshots=500)
            our_db[(n_ant, chan)] = db
            print(f"nant{n_ant} {chan}: SDR(dB)@ibo0 = {db[0]:.2f}",
                  flush=True)

    ev = {}
    for fname, nants in (("sdr_vs_ibo_per_channel_ibo0to7_32nant",
                          SERIAL_NANTS[:3]),
                         ("sdr_vs_ibo_per_channel_ibo0to8_128nant",
                          SERIAL_NANTS)):
        rows = [np.array([float(x) for x in r]) for r in
                csv.reader(open(os.path.join(RD, fname + ".csv")))]
        ref_ibo = rows[0]
        per_row = {}
        for ai, n_ant in enumerate(nants):
            for ci, chan in enumerate(CHANNELS):
                raw = np.interp(ibo, ref_ibo, rows[1 + ai * 3 + ci],
                                left=np.nan, right=np.nan)
                m = np.isfinite(raw)
                ours = our_db[(n_ant, chan)][m]
                e_db_stored = np.abs(ours - raw[m])
                e_lin_stored = np.abs(ours - 10 * np.log10(raw[m]))
                per_row[f"nant{n_ant}_{chan}"] = {
                    "db_stored_median_delta": float(np.median(e_db_stored)),
                    "lin_stored_median_delta": float(np.median(e_lin_stored)),
                }
        med_db = float(np.median([v["db_stored_median_delta"]
                                  for v in per_row.values()]))
        med_lin = float(np.median([v["lin_stored_median_delta"]
                                   for v in per_row.values()]))
        print(f"{fname}: median|Delta| dB-stored {med_db:.2f} dB, "
              f"linear-stored {med_lin:.2f} dB", flush=True)
        ev[fname + ".csv"] = {"per_row": per_row,
                              "summary": {"db_stored_median": med_db,
                                          "lin_stored_median": med_lin,
                                          "nants": list(nants)}}

    with open(OUT, "w") as f:
        json.dump(ev, f, indent=1)


if __name__ == "__main__":
    main()
