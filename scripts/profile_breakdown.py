"""Stage-level profile of the canonical Monte-Carlo round on the real TPU.

Produces the committed evidence behind docs/PERF.md: wall-time ablations of
the canonical MISO CNC round (the bench.py workload,
``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ebn0.py:37-58``),
an XLA ``cost_analysis`` FLOP count where the backend exposes one, an
analytic FLOP/byte model of the fused MXU transform chain, and a batch-size
sweep. Writes ``figs/profiling/breakdown_tpu.json`` and prints a Markdown
table.

Ablation method: every stage is fused under one ``jit``, so stages are
isolated by *difference of variants* (re-jitting with a stage removed), the
standard fusion-respecting ablation. Timing uses the same depth-2 pipelined
host-fetch loop as ``bench.py`` (axon's ``block_until_ready`` is a no-op, so
sync = fetch counters to host).
"""

import dataclasses
import json
import os
import time

import numpy as np


def timed_rounds(round_fn, key, snr, batch, min_s=6.0):
    import jax

    def consume(c):
        return int(np.asarray(c.clean_err)) + int(np.asarray(c.dist_err)[0])

    consume(round_fn(key, snr))  # compile + warmup
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
    return dt / n, n * batch / dt


def try_cost_analysis(round_fn, key, snr):
    """XLA's own FLOP/byte estimate for the compiled round, if exposed."""
    try:
        ca = round_fn.lower(key, snr).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {k: ca[k] for k in ("flops", "bytes accessed")
                if ca and k in ca}
    except Exception as e:  # axon backends may not expose cost analysis
        return {"error": str(e)[:120]}


def analytic_model(n_ant=64, n_fft=4096, n_iters=8, n_sc=2048):
    """FLOPs/bytes per frame of the fused 4-step transform chains (the
    dominant term). Each fused IFFT->PA->FFT on one length-4096 stream is
    4 Karatsuba complex einsums = 12 real [64,64]@[64,64] matmuls."""
    r = int(np.sqrt(n_fft))
    matmul_flops = 2 * r * r * r                     # one real [R,R]@[R,R]
    chain_flops = 12 * matmul_flops                  # 4 einsums x 3 Karatsuba
    tx_flops = n_ant * chain_flops                   # per-antenna TX chain
    rx_flops = n_iters * chain_flops                 # replica chains (1 stream)
    # bf16 planar storage: each einsum reads+writes 2 planes of [R,R] bf16
    chain_bytes = 4 * (2 * 2 * n_fft * 2)            # rd+wr, 2 planes, 2 B
    return {
        "fused_chain_flops": chain_flops,
        "tx_flops_per_frame": tx_flops,
        "replica_flops_per_frame": rx_flops,
        "transform_flops_per_frame": tx_flops + rx_flops,
        "chain_bytes_bf16": chain_bytes,
        "arith_intensity_flops_per_byte": chain_flops / chain_bytes,
    }


def main():
    import jax
    import jax.numpy as jnp

    from mimo_ofdm_tpu.utils.config import canonical_miso_cnc, ChannelConfig
    from mimo_ofdm_tpu.models.link import make_round_fn

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    n_iters = 8
    cfg, _ = canonical_miso_cnc()
    cfg = cfg.replace(channel=ChannelConfig(model="rayleigh"))
    key = jax.random.key(0)
    snr = jnp.float32(15.0)

    variants = {
        "full": (cfg, dict(n_iters=n_iters)),
        "cnc0_iters": (cfg, dict(n_iters=0)),
        "no_clean_run": (cfg, dict(n_iters=n_iters, incl_clean=False)),
        "rx_none": (cfg.replace(rx=dataclasses.replace(cfg.rx, algorithm="none")),
                    dict(n_iters=n_iters)),
        "jnp_fft": (cfg.replace(use_mxu_fft=False), dict(n_iters=n_iters)),
        "mxu_f32": (cfg.replace(mxu_fft_storage="float32"),
                    dict(n_iters=n_iters)),
        # reference-exact complex64 channel block (no planar bf16 fades):
        # isolates the planar channel-storage gain that landed late in r2
        "chan_c64": (cfg.replace(channel_storage="complex64"),
                     dict(n_iters=n_iters)),
        # geometric channel: no per-frame fade PRNG (isolates the cost of
        # drawing 64 x 2048 complex normals per frame for Rayleigh)
        "los_channel": (cfg.replace(channel=ChannelConfig(model="los")),
                        dict(n_iters=n_iters)),
        # flat unit channel: no channel generation at all
        "awgn_channel": (cfg.replace(channel=ChannelConfig(model="awgn")),
                         dict(n_iters=n_iters)),
    }

    sections = set(os.environ.get("PROFILE_SECTIONS",
                                  "variants,micro,batch").split(","))
    prev = {}
    json_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "figs", "profiling", "breakdown_tpu.json")
    if os.path.exists(json_path):
        with open(json_path) as f:
            prev = json.load(f)

    out = {"batch": batch, "n_iters": n_iters, "device": str(jax.devices()[0]),
           "variants": prev.get("variants", {}),
           "microbench": prev.get("microbench", {}),
           "batch_sweep": prev.get("batch_sweep", {}),
           "derived_pct_of_full": prev.get("derived_pct_of_full", {})}
    if "variants" not in sections:
        variants = {}
    for name, (c, kw) in variants.items():
        rf = make_round_fn(c, batch=batch, **kw)
        dt, fps = timed_rounds(rf, key, snr, batch)
        out["variants"][name] = {"round_s": round(dt, 5),
                                 "frames_per_s": round(fps, 1)}
        print(f"{name:14s} {dt*1e3:8.2f} ms/round  {fps:9.1f} frames/s",
              flush=True)

    if "full" in out["variants"]:
        vr = out["variants"]
        full = vr["full"]["round_s"]
        out["derived_pct_of_full"] = {
            "cnc_8_replica_iters":
                round(100 * (full - vr["cnc0_iters"]["round_s"]) / full, 1),
            "clean_run":
                round(100 * (full - vr["no_clean_run"]["round_s"]) / full, 1),
            "tx_chain_channel_agc":
                round(100 * vr["rx_none"]["round_s"] / full, 1),
            "mxu_vs_jnp_fft_speedup":
                round(vr["jnp_fft"]["round_s"] / full, 2),
            "bf16_vs_f32_storage_speedup":
                round(vr["mxu_f32"]["round_s"] / full, 2),
            "planar_chan_vs_c64_speedup":
                round(vr["chan_c64"]["round_s"] / full, 2)
                if "chan_c64" in vr else None,
            "rayleigh_channel_gen":
                round(100 * (full - vr["los_channel"]["round_s"]) / full, 1),
            "channel_block_total":
                round(100 * (full - vr["awgn_channel"]["round_s"]) / full, 1),
        }

    # microbenches: TX fused chain alone, and the Rayleigh-fade PRNG alone
    from mimo_ofdm_tpu.models import transmit
    from mimo_ofdm_tpu.models.link import FrameCounters
    from mimo_ofdm_tpu.ops import noise as noise_ops

    n_ant, n_fft = cfg.array.n_elements, cfg.modem.n_fft
    # host numpy complex constant: eager complex device ops are
    # UNIMPLEMENTED on axon, and embedding a *device* complex array as a jit
    # closure constant fails at the transfer point — numpy embeds cleanly
    v = np.ones((n_ant, cfg.modem.n_sub_carr), np.complex64)

    def _counters(x):
        # tiny reduction so timed_rounds' host fetch syncs the device
        return FrameCounters(
            clean_err=jnp.sum(jnp.abs(x[..., :8]) > 0, dtype=jnp.int32),
            dist_err=jnp.zeros((1,), jnp.int32))

    @jax.jit
    def tx_only(k, _snr):
        ks = jax.random.split(k, batch)
        bits = jax.vmap(lambda kk: jax.random.bernoulli(
            kk, 0.5, (cfg.modem.n_bits_per_ofdm_sym,)).astype(jnp.int8))(ks)
        fd = jax.vmap(lambda b: transmit.array_transmit_fd(
            b, constel_size=cfg.modem.constel_size, n_fft=n_fft, v=v,
            pa_model="softlim", sat_power=1.0, use_mxu_fft=True,
            mxu_storage="bfloat16"))(bits)
        return _counters(fd)

    @jax.jit
    def prng_only(k, _snr):
        ks = jax.random.split(k, batch)
        h = jax.vmap(lambda kk: noise_ops.complex_normal(
            kk, (n_ant, cfg.modem.n_sub_carr), jnp.complex64))(ks)
        return _counters(h)

    micro = (("tx_chain_only", tx_only), ("rayleigh_prng_only", prng_only)) \
        if "micro" in sections else ()
    for name, fn in micro:
        dt, fps = timed_rounds(fn, key, snr, batch)
        out["microbench"][name] = {"round_s": round(dt, 5),
                                   "frames_per_s": round(fps, 1)}
        print(f"{name:18s} {dt*1e3:8.2f} ms/round  {fps:9.1f} frames/s",
              flush=True)

    # batch sweep on the full config (4096 exceeds HBM: the fused TX chain
    # materializes [batch, 64, 64, 64] planes — recorded as oom)
    for b in (64, 128, 256, 512, 1024, 2048, 4096) if "batch" in sections else ():
        try:
            rf = make_round_fn(cfg, n_iters=n_iters, batch=b)
            dt, fps = timed_rounds(rf, key, snr, b)
            out["batch_sweep"][b] = {"round_s": round(dt, 5),
                                     "frames_per_s": round(fps, 1)}
            print(f"batch {b:5d}   {dt*1e3:8.2f} ms/round  {fps:9.1f} frames/s",
                  flush=True)
        except Exception as e:
            out["batch_sweep"][b] = {"error": str(e)[:100]}
            print(f"batch {b:5d}   FAILED: {str(e)[:80]}", flush=True)

    out["analytic"] = analytic_model()
    full_fn = make_round_fn(cfg, n_iters=n_iters, batch=batch)
    out["xla_cost_analysis"] = try_cost_analysis(full_fn, key, snr)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "figs", "profiling", "breakdown_tpu.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
