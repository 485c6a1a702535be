"""Profiling helpers — replacing the reference's wall-clock ``time.time()``
brackets (``reference/main_clipping_noise_cancellation/
main_miso_cnc_ber_vs_ebn0.py:102-103,257``) with ``jax.profiler`` traces
and throughput counters (SURVEY.md section 5 "Tracing / profiling")."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def wallclock(label: str = "", verbose: bool = True):
    """Wall-clock bracket, reference-style print format."""
    t0 = time.time()
    yield
    if verbose:
        print(f"--- Computation time: {time.time() - t0:f} --- {label}")


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mimo_ofdm_tpu_trace"):
    """``jax.profiler`` trace context (view with TensorBoard/XProf). Falls
    back to a no-op when the backend does not support profiling."""
    import jax
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield logdir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class ThroughputMeter:
    """Frames/s and bits/s counter for sweep points."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.frames = 0
        self.bits = 0

    def add(self, frames: int, bits: int):
        self.frames += frames
        self.bits += bits

    @property
    def frames_per_s(self) -> float:
        return self.frames / max(time.perf_counter() - self.t0, 1e-9)

    @property
    def bits_per_s(self) -> float:
        return self.bits / max(time.perf_counter() - self.t0, 1e-9)
