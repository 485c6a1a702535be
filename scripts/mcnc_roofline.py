"""Measure (not estimate) the MCNC arm's roofline position.

VERDICT r4 weak-item 3: PERF.md's MCNC bytes/frame hand-corrects XLA
``cost_analysis``'s scan-body undercount. This measures it instead:

1. **n_iters slope**: time the canonical MCNC round at n_iters
   {1, 2, 4, 8}. Time per frame is affine in the iteration count
   (t = a + b * n_iters); the slope ``b`` is the true per-replica-chain
   wall cost, free of the undercount, and with the probe's measured
   streaming ceiling (figs/profiling/roofline_probe.json) gives the
   per-iteration bytes actually moved: bytes_iter = b * BW_ceiling is an
   *upper bound* at full saturation; conversely the model bytes/iter
   (planar chain traffic) / b gives achieved GB/s.
2. **batch sweep** at n_iters 8 over {256, 384, 512, 640, 768, 1024}
   to refine the throughput sweet spot.

All timings use the interleaved-window discipline: every (config)
measured in short windows round-robin, medians reported — sequential
6-s windows drift ~15% on the tunnel (CLAUDE.md).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/mcnc_roofline.py
Writes figs/profiling/mcnc_roofline.json.
"""

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "figs", "profiling", "mcnc_roofline.json")


def main():
    import jax
    import jax.numpy as jnp
    from mimo_ofdm_tpu.utils.config import (canonical_miso_cnc, ChannelConfig,
                                            RxConfig)
    from mimo_ofdm_tpu.models.link import make_round_fn

    cfg, _ = canonical_miso_cnc()
    cfg = cfg.replace(channel=ChannelConfig(model="rayleigh"),
                      rx=RxConfig(algorithm="mcnc"))
    key = jax.random.key(0)
    snr = jnp.float32(15.0)

    def consume(c):
        return int(np.asarray(c.clean_err)) + int(np.asarray(c.dist_err)[0])

    def make(n_iters, batch):
        fn = make_round_fn(cfg, n_iters=n_iters, batch=batch)
        consume(fn(key, snr))                      # compile
        for i in range(2):                         # warm
            consume(fn(jax.random.fold_in(key, i), snr))
        return fn

    def window(fn, batch, seconds=2.5, depth=3, off=0):
        t0 = time.perf_counter()
        n = 0
        pend = []
        for _ in range(depth - 1):
            pend.append(fn(jax.random.fold_in(key, off + n), snr))
            n += 1
        while time.perf_counter() - t0 < seconds:
            pend.append(fn(jax.random.fold_in(key, off + n), snr))
            n += 1
            consume(pend.pop(0))
        for p in pend:
            consume(p)
        return n * batch / (time.perf_counter() - t0)

    # --- n_iters sweep at batch 512, interleaved windows ---
    iters_list = [1, 2, 4, 8]
    fns = {k: make(k, 512) for k in iters_list}
    print("compiled n_iters variants", flush=True)
    wins = {k: [] for k in iters_list}
    for w in range(5):
        for k in iters_list:
            wins[k].append(window(fns[k], 512, off=1000 * k + 50 * w))
    med = {k: float(np.median(v)) for k, v in wins.items()}
    print("n_iters medians (frames/s):", med, flush=True)

    # affine fit: seconds/frame = a + b * n_iters
    x = np.array(iters_list, float)
    y = 1.0 / np.array([med[k] for k in iters_list])
    b, a = np.polyfit(x, y, 1)
    print(f"per-frame time = {a * 1e6:.1f} us + {b * 1e6:.1f} us/iteration",
          flush=True)

    # model traffic per replica chain (planar bf16 chain, bytes):
    # per iteration the replica runs detect + IFFT+clip+FFT over
    # [batch(=1 frame), 64 ant, n_sc/n_fft] — measured instead via the
    # slope against the probe ceiling
    probe_path = os.path.join(HERE, "..", "figs", "profiling",
                              "roofline_probe.json")
    ceiling = None
    if os.path.exists(probe_path):
        with open(probe_path) as f:
            ceiling = json.load(f).get("stream_gbps")

    # --- batch sweep at n_iters 8 ---
    batches = [256, 384, 512, 640, 768, 1024]
    bfns = {b_: make(8, b_) for b_ in batches}
    print("compiled batch variants", flush=True)
    bwins = {b_: [] for b_ in batches}
    for w in range(4):
        for b_ in batches:
            bwins[b_].append(window(bfns[b_], b_, off=7000 + b_ + 10 * w))
    bmed = {b_: float(np.median(v)) for b_, v in bwins.items()}
    print("batch medians (frames/s):", bmed, flush=True)

    out = {
        "n_iters_windows": {str(k): v for k, v in wins.items()},
        "n_iters_median_fps": {str(k): v for k, v in med.items()},
        "affine_fit_us": {"intercept": a * 1e6, "slope_per_iter": b * 1e6},
        "batch_windows": {str(k): v for k, v in bwins.items()},
        "batch_median_fps": bmed,
        "probe_ceiling_gbps": ceiling,
    }
    if ceiling:
        # bytes/iteration upper bound if the slope were fully
        # bandwidth-limited at the measured ceiling
        out["bytes_per_iter_at_ceiling_MB"] = b * ceiling * 1e9 / 1e6
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
