"""Interleaved A/B re-measurement of the contested ablation variants.

The axon tunnel's round-trip latency drifts on multi-minute timescales,
so sequential 6-s windows (scripts/profile_breakdown.py) can misorder
variants whose true delta is ~10%. This script interleaves the variants
round-robin over several cycles and reports the per-variant *median*
frames/s, which cancels the drift: each variant samples every phase of
the tunnel's latency cycle.

Writes ``figs/profiling/ablation_recheck.json``.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ablation_recheck.py
"""

import json
import os
import statistics
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def timed_window(round_fn, key, snr, batch, min_s=4.0):
    import jax

    def consume(c):
        return int(np.asarray(c.clean_err)) + int(np.asarray(c.dist_err)[0])

    t0 = time.perf_counter()
    n = 0
    pending = round_fn(jax.random.fold_in(key, n), snr)
    n += 1
    while time.perf_counter() - t0 < min_s:
        nxt = round_fn(jax.random.fold_in(key, n), snr)
        n += 1
        consume(pending)
        pending = nxt
    consume(pending)
    dt = time.perf_counter() - t0
    return n * batch / dt


def main():
    import jax
    import jax.numpy as jnp

    from mimo_ofdm_tpu.utils.config import canonical_miso_cnc, ChannelConfig
    from mimo_ofdm_tpu.models.link import make_round_fn

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    n_iters = 8
    cycles = int(os.environ.get("RECHECK_CYCLES", "7"))
    cfg, _ = canonical_miso_cnc()
    cfg = cfg.replace(channel=ChannelConfig(model="rayleigh"))
    key = jax.random.key(0)
    snr = jnp.float32(15.0)

    variants = {
        "full": cfg,
        "mxu_f32": cfg.replace(mxu_fft_storage="float32"),
        "chan_c64": cfg.replace(channel_storage="complex64"),
        "los_channel": cfg.replace(channel=ChannelConfig(model="los")),
    }
    fns = {}
    for name, c in variants.items():
        fns[name] = make_round_fn(c, n_iters=n_iters, batch=batch)
        # compile + warm
        timed_window(fns[name], key, snr, batch, min_s=1.0)
        print(f"compiled {name}", flush=True)

    samples = {name: [] for name in variants}
    for cyc in range(cycles):
        for name in variants:
            fps = timed_window(fns[name], jax.random.fold_in(key, cyc),
                               snr, batch)
            samples[name].append(round(fps, 1))
            print(f"cycle {cyc} {name:12s} {fps:9.1f} frames/s", flush=True)

    out = {"batch": batch, "n_iters": n_iters, "cycles": cycles,
           "samples": samples,
           "median_frames_per_s": {n: statistics.median(s)
                                   for n, s in samples.items()}}
    med = out["median_frames_per_s"]
    out["derived"] = {
        "bf16_vs_f32_storage_speedup": round(med["full"] / med["mxu_f32"], 3),
        "planar_chan_vs_c64_speedup": round(med["full"] / med["chan_c64"], 3),
        "rayleigh_vs_los_ratio": round(med["full"] / med["los_channel"], 3),
    }
    path = os.path.join(HERE, "..", "figs", "profiling",
                        "ablation_recheck.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["median_frames_per_s"], indent=1))
    print(json.dumps(out["derived"], indent=1))


if __name__ == "__main__":
    main()
