"""Scaling-efficiency benchmark harness (BASELINE.md target: >80%
samples/s scaling efficiency at 1 chip / 1 host / N hosts).

Measures Monte-Carlo frames/s of the canonical round on growing
``dp``-mesh sizes with fixed per-device batch (weak scaling); efficiency
= throughput(N) / (N * throughput(1)).
"""

from __future__ import annotations

import time

import numpy as np
import jax

from mimo_ofdm_tpu.parallel.sharded import make_mesh, make_sharded_round_fn
from mimo_ofdm_tpu.utils.config import LinkConfig


def measure_round_throughput(round_fn, batch: int, key, snr_db: float = 22.0,
                             min_seconds: float = 5.0) -> float:
    """Frames/s with per-round host sync (realistic driver usage)."""
    def run(k):
        c = round_fn(k, snr_db)
        return int(np.asarray(c.clean_err))

    run(key)  # compile + warmup
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < min_seconds:
        run(jax.random.fold_in(key, n))
        n += 1
    return n * batch / (time.perf_counter() - t0)


def weak_scaling_sweep(cfg: LinkConfig, n_iters: int = 8,
                       batch_per_device: int = 128,
                       device_counts: list[int] | None = None,
                       n_tp: int = 1, snr_db: float = 22.0,
                       verbose: bool = True) -> dict:
    """Frames/s and efficiency vs dp-mesh size over available devices."""
    n_dev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d * n_tp <= n_dev]
    results = {}
    base = None
    for d in device_counts:
        mesh = make_mesh(n_dp=d, n_tp=n_tp)
        batch = batch_per_device * d
        rf = make_sharded_round_fn(cfg, n_iters, batch, mesh)
        fps = measure_round_throughput(rf, batch, jax.random.key(0), snr_db)
        if base is None:
            base = fps
        eff = fps / (base * d)
        results[d] = {"frames_per_s": fps, "efficiency": eff}
        if verbose:
            print(f"dp={d:3d} (x{n_tp}tp): {fps:10.1f} frames/s  "
                  f"efficiency={eff * 100:5.1f}%")
    return results
