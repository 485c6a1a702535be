"""Monte-Carlo BER driver: batched rounds + host-side stop criteria.

Replaces the reference's process fan-out with lock-protected shared
counters (``reference/mp_model.py:89-222``,
``reference/main_mp_clipping_noise_cancellation/main_mp_miso_cnc_ber_vs_ebn0.py:119-132``)
with the TPU-native pattern:

* a **jitted round** simulates ``batch`` frames at once (vmap), optionally
  sharded across a device mesh (see :mod:`mimo_ofdm_tpu.parallel.mesh`);
* the **host** accumulates integer counters between rounds and applies the
  per-iteration early-exit semantics (``ite_use_flags``,
  ``reference/mp_model.py:181-187``) at round granularity: an iteration
  counter stops accumulating once it reached ``n_err_min`` errors or
  ``bits_sent_max`` bits, and the sweep point stops when every counter is
  done.

Determinism: every round key is ``fold_in(master_key, round_index)`` and
every frame key is a split of the round key, so results are reproducible
for a given (seed, batch size, device count) — the analogue of the
reference's per-process seed arrays
(``reference/main_mp_clipping_noise_cancellation/main_mp_miso_cnc_ber_vs_ebn0.py:122``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import jax

from mimo_ofdm_tpu.utils.config import LinkConfig, SweepConfig
from mimo_ofdm_tpu.models.link import make_round_fn


def _fetch_counters(counters) -> np.ndarray:
    """Fetch one round's counters to the host with the MINIMUM number of
    device round-trips; returns the flat int64 ``[n_counters]`` vector
    (``[clean_err, dist_err...]`` — the layout of the reference's shared
    arrays, ``reference/mp_model.py:132-134``).

    On the axon-tunneled TPU every separate host fetch is a tunnel
    round-trip and every *eager jit dispatch* costs about one more
    (measured at batch 768, interleaved windows: single-array fetch
    16,380 frames/s, two sequential fetches 15,237, an extra packing-jit
    dispatch per round 10,455 — `figs/profiling/consume_ab.json`). So
    rounds built with ``make_round_fn(..., flat=True)`` return ONE
    pre-packed vector from inside the round executable (single fetch,
    zero extra dispatch); named ``FrameCounters`` rounds remain supported
    with the two-fetch path.
    """
    if isinstance(counters, jax.Array):
        return np.asarray(counters).astype(np.int64)
    return np.concatenate([np.atleast_1d(np.asarray(counters.clean_err)),
                           np.asarray(counters.dist_err)]).astype(np.int64)


@dataclass
class PointResult:
    """Counters for one sweep point (e.g. one Eb/N0 value)."""
    n_err: np.ndarray        # [n_counters] int64
    n_bits: np.ndarray       # [n_counters] int64
    n_rounds: int
    wall_time_s: float

    @property
    def ber(self) -> np.ndarray:
        return self.n_err / np.maximum(self.n_bits, 1)


@dataclass
class SweepResult:
    """BER vs swept parameter, reference CSV row convention
    (row 0 = swept param, following rows = metric per config;
    ``reference/docs/source/usage.rst:40-47``)."""
    param_values: np.ndarray
    points: list[PointResult] = field(default_factory=list)

    @property
    def ber_matrix(self) -> np.ndarray:
        """[n_counters, n_points]"""
        return np.stack([p.ber for p in self.points], axis=1)

    @property
    def frames_per_s(self) -> float:
        tot_t = sum(p.wall_time_s for p in self.points)
        tot_bits = sum(int(p.n_bits.max()) for p in self.points)
        return tot_bits / max(tot_t, 1e-9)


def run_point(round_fn, key, snr_db: float, *, n_counters: int,
              n_bits_per_frame: int, batch: int, n_err_min: int,
              bits_sent_max: int, max_rounds: int = 100_000,
              pipeline_depth: int = 3, idx_arg: bool = False) -> PointResult:
    """Accumulate rounds until every counter hit a stop criterion.

    ``round_fn(key, snr_db) -> FrameCounters`` with int32 sums per counter.
    Counter 0 is the clean run; counters 1.. are CNC iterations 0..n_iters
    (matching the shared-array layout in ``reference/mp_model.py:132-134``).

    Rounds are **pipelined**: up to ``pipeline_depth`` rounds are kept in
    flight on the device, so the host-side fetch (a tunnel round-trip on
    remote TPUs) and counter bookkeeping of round ``k`` overlap with the
    device executing round ``k+1``. Depth 3 (measured on the axon v5e:
    9.8k -> 11.2k frames/s at batch 1024 vs depth 2) keeps the device
    busy even when one fetch straddles two round times; deeper adds
    nothing. The stop check uses the counters
    accumulated so far — the same cooperative staleness as the reference's
    workers re-reading the shared arrays without the lock
    (``reference/mp_model.py:177-187``): at most ``pipeline_depth - 1``
    extra rounds are accumulated past the stop point.
    """
    from collections import deque

    n_err = np.zeros(n_counters, np.int64)
    n_bits = np.zeros(n_counters, np.int64)
    t0 = time.perf_counter()
    launched = 0
    in_flight: deque = deque()

    def active_mask():
        return (n_err < n_err_min) & (n_bits < bits_sent_max)

    while True:
        # keep the pipeline full (dispatch is async; no device sync
        # here). idx_arg rounds fold the round key INSIDE the executable
        # (one dispatch per launch instead of fold_in + round; same key
        # derivation bit-for-bit, see make_round_fn(idx_arg=True))
        while (launched < max_rounds and len(in_flight) < pipeline_depth
               and active_mask().any()):
            if idx_arg:
                counters = round_fn(key, launched, snr_db)
            else:
                counters = round_fn(jax.random.fold_in(key, launched), snr_db)
            in_flight.append((counters, active_mask()))
            launched += 1
        if not in_flight:
            break
        counters, mask = in_flight.popleft()
        # the fetch is the real sync point (block_until_ready is a no-op
        # on some transports); flat rounds cost ONE round-trip here
        errs = _fetch_counters(counters)
        n_err += np.where(mask, errs, 0)
        n_bits += np.where(mask, batch * n_bits_per_frame, 0)
    return PointResult(n_err=n_err, n_bits=n_bits, n_rounds=launched,
                       wall_time_s=time.perf_counter() - t0)


def run_sweep_pipelined(round_fn, key, snr_db_values, *, n_counters: int,
                        n_bits_per_frame: int, batch: int, n_err_min: int,
                        bits_sent_max: int, max_rounds: int = 100_000,
                        pipeline_depth: int = 3,
                        idx_arg: bool = False) -> list[PointResult]:
    """Sequence of :func:`run_point`-equivalent sweep points with the
    device pipeline kept full ACROSS points.

    :func:`run_point` drains its in-flight rounds when a point finishes,
    so between sweep points the device idles for ~``depth`` host fetches
    (tunnel round-trips) plus the next point's pipeline refill. Here the
    scheduler launches point ``k+1``'s first rounds while point ``k``'s
    tail results are still being fetched, removing those bubbles — the
    round-3 ROADMAP "cross-point pipelining" item.

    Key derivation, per-point masks, and the depth-1 cooperative
    stop-staleness are identical to ``run_point(fold_in(key, i), ...)``
    per point, so the accumulated counters are reproducible and unbiased
    (each round's contribution mask is fixed at launch). ``snr_db`` is a
    traced scalar of ``round_fn``, so no recompilation occurs across
    points. Per-point ``wall_time_s`` spans first-launch to last-fetch
    and may overlap between adjacent points.
    """
    from collections import deque

    n_pts = len(snr_db_values)
    point_keys = [None] * n_pts   # fold_in(key, i), derived once per point
    n_err = [np.zeros(n_counters, np.int64) for _ in range(n_pts)]
    n_bits = [np.zeros(n_counters, np.int64) for _ in range(n_pts)]
    launched = np.zeros(n_pts, np.int64)
    t_start = [None] * n_pts
    t_end = [0.0] * n_pts
    in_flight: deque = deque()
    launch_idx = 0

    def active_mask(i):
        return (n_err[i] < n_err_min) & (n_bits[i] < bits_sent_max)

    while True:
        while launch_idx < n_pts and (launched[launch_idx] >= max_rounds
                                      or not active_mask(launch_idx).any()):
            launch_idx += 1
        while len(in_flight) < pipeline_depth and launch_idx < n_pts:
            i = launch_idx
            if t_start[i] is None:
                t_start[i] = time.perf_counter()
            if point_keys[i] is None:
                point_keys[i] = jax.random.fold_in(key, i)
            if idx_arg:
                # fold_in(point_key, round) runs inside the executable —
                # bit-identical keys, one dispatch per launch
                counters = round_fn(point_keys[i], int(launched[i]),
                                    float(snr_db_values[i]))
            else:
                counters = round_fn(
                    jax.random.fold_in(point_keys[i], int(launched[i])),
                    float(snr_db_values[i]))
            in_flight.append((i, counters, active_mask(i)))
            launched[i] += 1
            if launched[i] >= max_rounds:
                launch_idx += 1
        if not in_flight:
            break
        i, counters, mask = in_flight.popleft()
        # the fetch is the real sync point (block_until_ready is a no-op
        # on some transports); flat rounds cost ONE round-trip here
        errs = _fetch_counters(counters)
        n_err[i] += np.where(mask, errs, 0)
        n_bits[i] += np.where(mask, batch * n_bits_per_frame, 0)
        t_end[i] = time.perf_counter()
    return [PointResult(n_err=n_err[i], n_bits=n_bits[i],
                        n_rounds=int(launched[i]),
                        wall_time_s=t_end[i] - (t_start[i] or t_end[i]))
            for i in range(n_pts)]


def run_ber_sweep(cfg: LinkConfig, sweep: SweepConfig, n_iters: int,
                  seed: int = 0, snr_db_values: np.ndarray | None = None,
                  round_fn=None, verbose: bool = False) -> SweepResult:
    """BER vs Eb/N0 sweep — the canonical workload
    (``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ebn0.py:86-250``)."""
    from mimo_ofdm_tpu.ops.metrics import ebn0_to_snr

    ebn0 = np.arange(sweep.ebn0_min, sweep.ebn0_max + sweep.ebn0_step / 2,
                     sweep.ebn0_step)
    if snr_db_values is None:
        # Canonical reference convention: the conversion references the
        # noise to the data band only — every reference sweep passes
        # n_sub_carr for BOTH n_fft and n_sub_carr, i.e. SNR = Eb/N0 *
        # log2(M) (reference/main_clipping_noise_cancellation/
        # main_miso_cnc_ber_vs_ebn0.py:99, main_mp_*:112).
        snr_db_values = ebn0_to_snr(ebn0, cfg.modem.n_sub_carr,
                                    cfg.modem.n_sub_carr,
                                    cfg.modem.constel_size)
    if round_fn is None:
        round_fn = make_round_fn(cfg, n_iters, sweep.batch_frames,
                                 incl_clean=sweep.incl_clean_run,
                                 reroll=sweep.reroll_channel, flat=True,
                                 idx_arg=True)
        idx_arg = True
    else:
        idx_arg = False
    n_counters = 1 + n_iters + 1
    result = SweepResult(param_values=ebn0)
    key = jax.random.key(seed)
    result.points = run_sweep_pipelined(
        round_fn, key, snr_db_values, n_counters=n_counters,
        n_bits_per_frame=cfg.modem.n_bits_per_ofdm_sym,
        batch=sweep.batch_frames, n_err_min=sweep.n_err_min,
        bits_sent_max=sweep.bits_sent_max, idx_arg=idx_arg)
    if verbose:
        for i, pt in enumerate(result.points):
            print(f"Eb/N0={ebn0[i]:5.1f} dB  rounds={pt.n_rounds:5d}  "
                  f"BER={np.array2string(pt.ber, precision=3)}")
    return result
