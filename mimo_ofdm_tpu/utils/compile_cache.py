"""Persistent XLA compilation cache across processes.

The canonical full-size round costs ~15-60 s of (remote) XLA compilation
on the axon-tunneled TPU, and JAX's in-memory jit cache is per-process —
so every new experiment process historically re-paid the compile for the
exact same executable (the reference has the same pathology in spirit:
its per-worker Numba JIT re-warms in every spawned process,
``reference/speedup.py:3-19``, ``reference/mp_model.py:89``).

:func:`enable_persistent_cache` turns on JAX's on-disk compilation cache
so identical programs compile once per *machine* instead of once per
process. Measured on this environment (axon TPU v5e, canonical 64-ant
batch-1024 CNC-8 round): first call 15.5 s cold -> 2.9 s warm in a fresh
process, with bit-identical counters. The cache key covers the program,
compile options and backend, so config changes or code edits miss
cleanly and recompile.

Call it once at process start, before the first jitted call (the config
flags apply to later compiles only — anything already compiled in this
process stays in memory anyway). The experiments CLI
(``python -m mimo_ofdm_tpu.experiments``), ``bench.py`` and the driver
entry hooks all enable it by default; set
``MIMO_OFDM_TPU_COMPILE_CACHE=off`` to disable, or point it at a custom
directory.
"""

from __future__ import annotations

import os

_DISABLE_VALUES = ("0", "off", "none", "disabled")
DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "mimo_ofdm_tpu", "xla")


def enable_persistent_cache(cache_dir: str | None = None, *,
                            min_compile_time_secs: float = 1.0,
                            min_entry_size_bytes: int = 0) -> str | None:
    """Enable JAX's persistent compilation cache; returns the cache
    directory, or ``None`` when disabled via the environment or when the
    runtime lacks the cache config (the call never raises).

    ``cache_dir`` defaults to ``$MIMO_OFDM_TPU_COMPILE_CACHE`` or
    ``~/.cache/mimo_ofdm_tpu/xla``. Compiles shorter than
    ``min_compile_time_secs`` are not persisted (they are cheaper to
    redo than to deserialize); ``min_entry_size_bytes=0`` keeps JAX's
    default size floor, ``-1`` persists every entry.

    Safe under concurrent processes (JAX writes cache entries
    atomically) and idempotent within a process.
    """
    env = os.environ.get("MIMO_OFDM_TPU_COMPILE_CACHE", "")
    if env.strip().lower() in _DISABLE_VALUES and env:
        return None
    if cache_dir is None:
        cache_dir = env or DEFAULT_CACHE_DIR
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_time_secs))
        if min_entry_size_bytes:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              int(min_entry_size_bytes))
        try:
            # the cache module latches its state at the process's FIRST
            # compile; if anything compiled before this call (config dir
            # unset at that point), the new dir is silently ignored until
            # the module re-initializes
            from jax._src import compilation_cache as _cc
            _cc.reset_cache()
        except Exception:
            pass   # private API; entry points enable before any compile
        return cache_dir
    except Exception:
        # never let cache plumbing break a run (read-only HOME, old jax…)
        return None
