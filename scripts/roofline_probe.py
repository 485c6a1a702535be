"""Roofline evidence for the canonical round: measured HBM ceiling vs
sustained traffic, plus the MCNC-arm throughput.

Three measurements on the attached TPU:

1. **Streaming-bandwidth ceiling**: ``out = a + b`` over large bf16
   arrays created ON DEVICE (no tunnel transfer), timed over many
   iterations -> the practically achievable HBM GB/s on this chip through
   this dispatch path. This is the honest roofline denominator (the paper
   0.82 TB/s is never reachable by a real kernel).
2. **Round cost**: XLA ``cost_analysis`` FLOPs / bytes of the compiled
   canonical CNC round -> MB/frame, so sustained GB/s = frames/s x
   MB/frame.
3. **MCNC arm**: frames/s + bytes of the canonical frame with the MCNC
   receiver (the full TX+channel replica per iteration).

Writes ``figs/profiling/roofline_probe.json`` and prints as it goes.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/roofline_probe.py
"""

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def consume(c):
    return int(np.asarray(c.clean_err)) + int(np.asarray(c.dist_err)[0])


def cost(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def throughput(round_fn, key, snr, batch, depth=3, min_s=6.0):
    import jax
    consume(round_fn(key, snr))
    for i in range(3):
        consume(round_fn(jax.random.fold_in(key, i), snr))
    t0 = time.perf_counter()
    n = 0
    pending = []
    for _ in range(depth - 1):
        pending.append(round_fn(jax.random.fold_in(key, 100 + n), snr))
        n += 1
    while time.perf_counter() - t0 < min_s:
        pending.append(round_fn(jax.random.fold_in(key, 100 + n), snr))
        n += 1
        consume(pending.pop(0))
    for p in pending:
        consume(p)
    return n * batch / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp

    from mimo_ofdm_tpu.utils.config import (canonical_miso_cnc, ChannelConfig,
                                            RxConfig)
    from mimo_ofdm_tpu.models.link import make_round_fn

    out = {}
    key = jax.random.key(0)
    snr = jnp.float32(15.0)

    # 1) streaming ceiling — a single dispatch runs a device-side loop of
    #    elementwise passes (3 x 256 MB traffic per iteration) so the
    #    tunnel's per-dispatch latency is fully amortized; the multiply
    #    prevents algebraic folding of the loop
    n = 128 * 1024 * 1024  # bf16 elements -> 256 MB per array
    reps = 64

    @jax.jit
    def stream_loop():
        a = jnp.full((n,), 1.0, jnp.bfloat16)
        b = jnp.full((n,), 1e-3, jnp.bfloat16)

        def body(_, c):
            return c * jnp.bfloat16(0.999) + b

        return jax.lax.fori_loop(0, reps, body, a)[0]

    float(stream_loop())           # compile + warm
    t0 = time.perf_counter()
    v = stream_loop()
    float(v)
    dt = time.perf_counter() - t0
    out["stream_gbps"] = reps * 3 * n * 2 / dt / 1e9
    print(f"streaming ceiling: {out['stream_gbps']:,.0f} GB/s "
          f"({dt:.3f}s window, one dispatch)", flush=True)

    # 2) canonical CNC round cost + throughput
    cfg, _ = canonical_miso_cnc()
    cfg = cfg.replace(channel=ChannelConfig(model="rayleigh"))
    batch = 1024
    rf = make_round_fn(cfg, n_iters=8, batch=batch)
    fl, by = cost(rf, key, snr)
    fps = throughput(rf, key, snr, batch)
    out["cnc"] = {"batch": batch, "frames_per_s": fps,
                  "gflop_per_round": fl / 1e9, "gb_per_round": by / 1e9,
                  "mb_per_frame": by / batch / 1e6,
                  "intensity_flop_per_byte": fl / by,
                  "sustained_gbps": fps * by / batch / 1e9,
                  "pct_of_stream_ceiling":
                      100.0 * fps * by / batch / 1e9 / out["stream_gbps"]}
    print(json.dumps(out["cnc"], indent=1), flush=True)

    # 3) MCNC arm
    for mb in (512, 1024):
        rfm = make_round_fn(cfg.replace(rx=RxConfig(algorithm="mcnc")),
                            n_iters=8, batch=mb)
        flm, bym = cost(rfm, key, snr)
        fpsm = throughput(rfm, key, snr, mb)
        out[f"mcnc_b{mb}"] = {
            "batch": mb, "frames_per_s": fpsm,
            "mb_per_frame": bym / mb / 1e6,
            "intensity_flop_per_byte": flm / bym,
            "sustained_gbps": fpsm * bym / mb / 1e9,
            "pct_of_stream_ceiling":
                100.0 * fpsm * bym / mb / 1e9 / out["stream_gbps"]}
        print(json.dumps(out[f"mcnc_b{mb}"], indent=1), flush=True)

    path = os.path.join(HERE, "..", "figs", "profiling",
                        "roofline_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
