"""Microbenchmark: fused MXU-matmul IFFT->PA->FFT vs stock jnp.fft chain
on the canonical [batch, 64, 4096] TX workload. Run on the real TPU.

Axon caveats (CLAUDE.md): complex values must be built inside jit
(eager complex transfer hits UNIMPLEMENTED) and sync is via host fetch of
a *real* array.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mimo_ofdm_tpu.ops import ofdm, pa
from mimo_ofdm_tpu.models import transmit


def timeit(fn, xr, xi, n=10):
    _ = np.asarray(fn(xr, xi))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(xr, xi)
    _ = np.asarray(out)
    return (time.perf_counter() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((batch, 64, 4096)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((batch, 64, 4096)), jnp.float32)
    sat = 0.5

    @jax.jit
    def ref_fn(ar, ai):
        a = jax.lax.complex(ar, ai)
        out = ofdm.td_to_fd(pa.apply_pa(ofdm.fd_to_td(a), "softlim", sat, 1.1, 0.0))
        return jnp.sum(jnp.abs(out), axis=(-1, -2))      # [batch] real

    @jax.jit
    def mxu_fn(ar, ai):
        a = jax.lax.complex(ar, ai)
        out = transmit.ifft_pa_fft(a, "softlim", sat, use_mxu_fft=True)
        return jnp.sum(jnp.abs(out), axis=(-1, -2))

    print("compiling ref...", flush=True)
    t_ref = timeit(ref_fn, xr, xi)
    print(f"jnp.fft chain : {t_ref*1e3:8.2f} ms "
          f"({batch*64/t_ref:,.0f} transform-pairs/s)", flush=True)
    print("compiling mxu...", flush=True)
    t_mxu = timeit(mxu_fn, xr, xi)
    print(f"mxu chain     : {t_mxu*1e3:8.2f} ms "
          f"({batch*64/t_mxu:,.0f} transform-pairs/s)", flush=True)
    print(f"speedup: {t_ref/t_mxu:.2f}x", flush=True)

    a = np.asarray(ref_fn(xr, xi))
    b = np.asarray(mxu_fn(xr, xi))
    rel = np.abs(a - b).max() / np.abs(a).max()
    print(f"on-device |sum| rel diff vs jnp.fft: {rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
