"""Headline benchmark: canonical MISO CNC Monte-Carlo throughput on TPU.

Workload = the reference's canonical BER frame
(``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ebn0.py:37-58``):
64-QAM, n_fft 4096, n_sub_carr 2048, 64-antenna array, soft-limiter PA at
IBO 0 dB, MRT precoding, Rayleigh channel rerolled per frame, clean run +
8-iteration CNC receive, per-iteration BER counters.

Prints ONE JSON line: frames/s on this chip, with ``vs_baseline`` the
speedup over the reference-style CPU implementation (per-antenna Python
loop + per-call FFTs), measured once on this machine and cached in
``BASELINE_CPU.json``. The line also carries ``mcnc_frames_per_s`` — the
same canonical frame with the MCNC receiver (replica = the full
64-antenna TX + channel chain per iteration, ~K x the CNC replica cost,
``reference/main_misc_evals/comp_complexity_eval.py:30-35``) — and the
per-window values behind each median. Set ``BENCH_SKIP_MCNC=1`` to skip
the MCNC arm.

Drift discipline: the axon tunnel's throughput drifts ~15% between
sequential multi-second windows (CLAUDE.md), so a single 10-s window is
not reproducible evidence. The bench therefore measures **interleaved
short windows** — alternating CNC and MCNC windows round-robin, the same
protocol ``scripts/ablation_recheck.py`` uses for ablations — and
reports the per-arm **median**, with the raw window lists included for
drift inspection.
"""

import json
import os
import time


def _measure_window(round_fn, consume, key_base, snr, batch, window_s, depth,
                    fold_offset):
    """One pipelined measurement window; returns frames/s."""
    t0 = time.perf_counter()
    n_rounds = 0
    pending = []
    # idx_arg rounds: the key fold happens inside the round executable,
    # so each launch is ONE dispatch (no eager fold_in per round)
    for _ in range(depth - 1):
        pending.append(round_fn(key_base, fold_offset + n_rounds, snr))
        n_rounds += 1
    while time.perf_counter() - t0 < window_s:
        pending.append(round_fn(key_base, fold_offset + n_rounds, snr))
        n_rounds += 1
        consume(pending.pop(0))
    for p in pending:
        consume(p)
    dt = time.perf_counter() - t0
    return n_rounds * batch / dt


def main():
    import jax
    import numpy as np
    import jax.numpy as jnp

    # persistent compile cache: the measured windows are unaffected
    # (warmup is untimed) but a repeat bench process skips the ~15-60 s
    # per-arm XLA compiles (utils/compile_cache.py; 15.5 s -> 2.9 s
    # first-call measured for the CNC arm)
    from mimo_ofdm_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from mimo_ofdm_tpu.utils.config import (canonical_miso_cnc, ChannelConfig,
                                            RxConfig)
    from mimo_ofdm_tpu.models.link import make_round_fn

    n_iters = 8
    # batch 512 is the measured optimum (interleaved medians, figs/
    # profiling/batch_ab.json): 512 -> 16.6-16.7k, 768 -> 16.4k,
    # 1024 -> 15.4k frames/s, with non-multiples of 256 (384/640/704/832)
    # all 1.5-2k lower — an XLA tiling effect the round-4 sequential
    # sweep could not resolve inside the tunnel drift band
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    cfg, _ = canonical_miso_cnc()
    cfg = cfg.replace(channel=ChannelConfig(model="rayleigh"))

    # flat=True: the round returns ONE pre-packed counter vector so the
    # consume below is a single tunnel round-trip — separate per-field
    # fetches cost one round-trip each, which at batch 768 (47 ms rounds)
    # made the host the bottleneck (15.2k vs 16.4k frames/s measured,
    # figs/profiling/consume_ab.json)
    round_fn = make_round_fn(cfg, n_iters=n_iters, batch=batch, flat=True,
                             idx_arg=True)
    key = jax.random.key(0)
    snr = jnp.float32(15.0)

    def consume(c):
        # fetch the packed counters to host: forces real device sync (the
        # axon backend's block_until_ready does not) and matches how the
        # Monte-Carlo driver consumes rounds
        return int(np.asarray(c)[0])

    # depth-3 pipelined rounds, matching parallel.montecarlo.run_point:
    # two rounds stay in flight while round k's host fetch (a tunnel
    # round-trip) completes — measured 9.8k -> 11.2k frames/s vs depth 2
    depth = int(os.environ.get("BENCH_PIPELINE_DEPTH", "3"))
    # 7 windows: batch 512's windows are noisier (~3% spread) than 768's,
    # so a wider median damps single-window outliers
    n_windows = int(os.environ.get("BENCH_WINDOWS", "7"))
    window_s = float(os.environ.get("BENCH_WINDOW_S", "3.0"))

    skip_mcnc = bool(os.environ.get("BENCH_SKIP_MCNC"))
    arms = [("cnc", round_fn, batch, 10_000)]
    if not skip_mcnc:
        # batch 512 is the MCNC sweet spot (2.2k vs 1.3k frames/s at 256
        # and 2.0k at 1024 — the 8 live replica chains raise HBM pressure)
        mcnc_batch = int(os.environ.get("BENCH_MCNC_BATCH", "512"))
        mcnc_round = make_round_fn(cfg.replace(rx=RxConfig(algorithm="mcnc")),
                                   n_iters=n_iters, batch=mcnc_batch,
                                   flat=True, idx_arg=True)
        arms.append(("mcnc", mcnc_round, mcnc_batch, 30_000))

    # compile + warmup each arm: a few untimed pipelined rounds bring the
    # device, allocator and tunnel to steady state before measurement
    for _, fn, _, off in arms:
        consume(fn(key, 0, snr))
        warm = [fn(key, off + 1000 + i, snr) for i in range(4)]
        for w in warm:
            consume(w)

    # interleaved windows: arm order a,b,a,b,... so every arm samples the
    # same drift environment; medians are the committed numbers
    windows = {name: [] for name, _, _, _ in arms}
    for w in range(n_windows):
        for name, fn, b, off in arms:
            fps = _measure_window(fn, consume, key, snr, b, window_s, depth,
                                  fold_offset=off + 100 * w)
            windows[name].append(round(fps, 2))

    frames_per_s = float(np.median(windows["cnc"]))

    # CPU baseline (cached)
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_CPU.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f)["frames_per_s"]
    else:
        from mimo_ofdm_tpu.utils.baseline_cpu import measure_baseline_frames_per_s
        baseline = measure_baseline_frames_per_s(cfg, n_iters)
        with open(base_path, "w") as f:
            json.dump({"frames_per_s": baseline,
                       "note": "reference-style per-antenna-loop CPU implementation, "
                               "canonical 64-ant 4096-FFT CNC-8 frame"}, f)

    out = {
        "metric": "canonical_miso_cnc_frames_per_s",
        "value": round(frames_per_s, 2),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / baseline, 2),
        "windows": windows["cnc"],
    }
    if not skip_mcnc:
        out["mcnc_frames_per_s"] = float(np.median(windows["mcnc"]))
        out["mcnc_windows"] = windows["mcnc"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
