"""Multi-host (multi-process) bootstrap for pod-scale Monte-Carlo.

The reference's "distributed runtime" is N OS processes on one machine
racing on lock-protected shared BER counters
(``reference/main_mp_clipping_noise_cancellation/main_mp_miso_cnc_ber_vs_ebn0.py:119-132``,
``reference/mp_model.py:89-99``). The TPU-native equivalent spans hosts:
``jax.distributed`` brings every process into one JAX runtime, the device
mesh covers the *global* device set, and the per-round ``psum`` over the
``dp`` axis replaces the shared-memory counter (riding ICI within a slice
and DCN across hosts).

Key properties:

* **Single-controller SPMD**: every process executes the same host loop on
  the same (replicated) counter values, so the stop criterion
  (:mod:`mimo_ofdm_tpu.parallel.montecarlo`) needs no changes and no extra
  host-to-host communication.
* **Determinism across topologies**: frame keys are
  ``jax.random.split(fold_in(key, round), global_batch)`` computed inside
  ``jit`` from the *global* round key, so the set of simulated frames — and
  therefore the summed counters — is bit-identical for any process count
  or mesh shape that preserves the global batch (verified by
  ``tests/test_multihost.py`` against the single-process result).
* Works on real pods (TPU backend) and on multi-process CPU for testing
  (``gloo`` cross-process collectives + ``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

import jax

from mimo_ofdm_tpu.parallel.sharded import make_mesh, make_sharded_round_fn
from mimo_ofdm_tpu.utils.config import LinkConfig


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Join this process to the global JAX runtime
    (``jax.distributed.initialize``). On TPU pods all arguments are
    auto-detected from the environment; on CPU/GPU test rigs pass them
    explicitly. Call once, before any other JAX API."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def global_mesh(n_tp: int = 1):
    """``(dp, tp)`` mesh over the *global* device set (all hosts). The
    ``dp`` axis spans hosts — BER-counter ``psum`` crosses DCN once per
    round; the ``tp`` (antenna) axis should stay within a host/slice so
    per-frame channel combines ride ICI only."""
    return make_mesh(n_tp=n_tp)


def make_multihost_round_fn(cfg: LinkConfig, n_iters: int,
                            global_batch: int, n_tp: int = 1, **kw):
    """Sharded round over all hosts' devices. ``global_batch`` frames are
    simulated per round across the whole job; the returned counters are
    replicated on every process (identical values), so the caller's
    Monte-Carlo accumulation loop is process-count agnostic."""
    mesh = global_mesh(n_tp)
    return make_sharded_round_fn(cfg, n_iters, global_batch, mesh, **kw), mesh


def process_info() -> dict:
    """Topology summary for logging/JSON evidence."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }
