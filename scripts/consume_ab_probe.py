"""Interleaved A/B of host consume styles for the canonical CNC round
at batch 768: one fetch of one output array vs the historical two
sequential fetches vs an extra eager flat-pack jit dispatch per round.

Result (figs/profiling/consume_ab.json): 16,380 / 15,237 / 10,455
frames/s medians -- each extra sequential fetch costs ~1 tunnel RTT and
an eager jit dispatch is effectively synchronous (~26 ms), hence
``make_round_fn(flat=True)`` packs the counters inside the round
executable (docs/PERF.md "Single-fetch flat counters").

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/consume_ab_probe.py
"""
import json, sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mimo_ofdm_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
import numpy as np
from mimo_ofdm_tpu.utils.config import canonical_miso_cnc, ChannelConfig
from mimo_ofdm_tpu.models.link import make_round_fn

cfg, _ = canonical_miso_cnc()
cfg = cfg.replace(channel=ChannelConfig(model="rayleigh"))
batch = 768
fn = make_round_fn(cfg, n_iters=8, batch=batch)
key = jax.random.key(0)
snr = jnp.float32(15.0)

def c_scalar(c):   return int(np.asarray(c.clean_err))
def c_array(c):    return int(np.asarray(c.dist_err)[0])
def c_two(c):      return int(np.asarray(c.clean_err)) + int(np.asarray(c.dist_err)[0])
import jax.numpy as jnp

@jax.jit
def _flat_pack(c):
    return jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(c)])

def c_packed(c):   return int(np.asarray(_flat_pack(c))[0])

variants = [("scalar", c_scalar), ("array", c_array),
            ("two", c_two), ("packed", c_packed)]

def window(consume, fold0, window_s=3.0, depth=3):
    t0 = time.perf_counter()
    n = 0
    pending = []
    for _ in range(depth - 1):
        pending.append(fn(jax.random.fold_in(key, fold0 + n), snr)); n += 1
    while time.perf_counter() - t0 < window_s:
        pending.append(fn(jax.random.fold_in(key, fold0 + n), snr)); n += 1
        consume(pending.pop(0))
    for p in pending:
        consume(p)
    return n * batch / (time.perf_counter() - t0)

for i in range(4):
    c = fn(jax.random.fold_in(key, 900 + i), snr)
    for _, fcon in variants: fcon(c)
print("warm", flush=True)

out = {name: [] for name, _ in variants}
for cyc in range(5):
    for name, fcon in variants:
        fps = window(fcon, 1000 * (cyc + 1) + hash(name) % 97)
        out[name].append(round(fps, 1))
        print(f"cycle {cyc} {name}: {fps:.0f}", flush=True)
print(json.dumps({k: {"windows": v, "median": float(np.median(v))}
                  for k, v in out.items()}))
