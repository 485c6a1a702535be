"""Interleaved A/B: CNC round batch 768 vs 1024.

The round-4 sequential batch sweep (docs/PERF.md) read 768 at 15,508 and
1024 at 15,296-15,440 frames/s — within the tunnel's drift band, so it
could not distinguish them. This probe applies the interleaved-window
discipline (same as ``scripts/ablation_recheck.py`` / ``bench.py``):
alternating 3-s windows per variant over N cycles, per-variant medians.
Output: ``figs/profiling/batch_ab.json``.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/batch_ab_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimo_ofdm_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mimo_ofdm_tpu.utils.config import canonical_miso_cnc, ChannelConfig
from mimo_ofdm_tpu.models.link import make_round_fn


def measure_window(round_fn, batch, key, snr, window_s=3.0, depth=3,
                   fold_offset=0):
    def consume(c):
        return int(np.asarray(c.clean_err))

    t0 = time.perf_counter()
    n = 0
    pending = []
    for _ in range(depth - 1):
        pending.append(round_fn(jax.random.fold_in(key, fold_offset + n), snr))
        n += 1
    while time.perf_counter() - t0 < window_s:
        pending.append(round_fn(jax.random.fold_in(key, fold_offset + n), snr))
        n += 1
        consume(pending.pop(0))
    for p in pending:
        consume(p)
    return n * batch / (time.perf_counter() - t0)


def main():
    cfg, _ = canonical_miso_cnc()
    cfg = cfg.replace(channel=ChannelConfig(model="rayleigh"))
    key = jax.random.key(0)
    snr = jnp.float32(15.0)

    batches = ([int(a) for a in sys.argv[1:]] if len(sys.argv) > 1
               else [768, 1024])
    fns = {b: make_round_fn(cfg, n_iters=8, batch=b) for b in batches}
    # warmup (compile + steady state)
    for b, fn in fns.items():
        for i in range(4):
            int(np.asarray(fn(jax.random.fold_in(key, 900 + i), snr).clean_err))
        print(f"warm batch {b}", flush=True)

    n_cycles = 7
    windows = {b: [] for b in batches}
    for c in range(n_cycles):
        for b in batches:
            fps = measure_window(fns[b], b, key, snr,
                                 fold_offset=1000 * (c + 1) + b)
            windows[b].append(round(fps, 1))
            print(f"cycle {c} batch {b}: {fps:.0f} frames/s", flush=True)

    out = {str(b): {"windows": windows[b],
                    "median": float(np.median(windows[b]))}
           for b in batches}
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "figs", "profiling", "batch_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
