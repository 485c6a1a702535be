"""GSCM vs TDL channel-arm throughput (interleaved A/B medians).

VERDICT r4 item 1 "done" criterion: the geometric channel must stay
within ~1.5x of the TDL arm's throughput. Measures the canonical CNC-8
round (64 ant, 4096 FFT, batch 1024) with channel = tdl_3gpp vs gscm,
alternating short windows (tunnel drift discipline, CLAUDE.md).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/gscm_throughput.py
Writes figs/profiling/gscm_throughput.json.
"""

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "figs", "profiling", "gscm_throughput.json")


def main():
    import jax
    import jax.numpy as jnp
    from mimo_ofdm_tpu.utils.config import canonical_miso_cnc, ChannelConfig
    from mimo_ofdm_tpu.models.link import make_round_fn

    cfg0, _ = canonical_miso_cnc()
    key = jax.random.key(0)
    snr = jnp.float32(15.0)
    batch = 1024

    def consume(c):
        return int(np.asarray(c.clean_err)) + int(np.asarray(c.dist_err)[0])

    arms = {}
    for name, chan in (("tdl_3gpp", ChannelConfig(model="tdl_3gpp")),
                       ("gscm", ChannelConfig(model="gscm",
                                              gscm_scenario="uma_los"))):
        fn = make_round_fn(cfg0.replace(channel=chan), n_iters=8, batch=batch)
        consume(fn(key, snr))
        for i in range(3):
            consume(fn(jax.random.fold_in(key, i), snr))
        arms[name] = fn
        print(f"compiled {name}", flush=True)

    wins = {name: [] for name in arms}
    for w in range(5):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            n = 0
            pend = []
            for _ in range(2):
                pend.append(fn(jax.random.fold_in(key, 100 * w + n), snr))
                n += 1
            while time.perf_counter() - t0 < 2.5:
                pend.append(fn(jax.random.fold_in(key, 100 * w + n), snr))
                n += 1
                consume(pend.pop(0))
            for p in pend:
                consume(p)
            wins[name].append(n * batch / (time.perf_counter() - t0))
    med = {name: float(np.median(v)) for name, v in wins.items()}
    ratio = med["tdl_3gpp"] / med["gscm"]
    print(f"medians: {med}  tdl/gscm ratio = {ratio:.2f}", flush=True)
    with open(OUT, "w") as f:
        json.dump({"windows": wins, "medians": med, "tdl_over_gscm": ratio},
                  f, indent=1)


if __name__ == "__main__":
    main()
