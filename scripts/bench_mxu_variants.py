"""Compare jnp.fft vs MXU-matmul fused chain at HIGH/HIGHEST precision."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mimo_ofdm_tpu.ops import mxu_fft, ofdm, pa
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

    def chain(a, prec):
        pa_fn = lambda p: pa.apply_pa(p, "softlim", sat, 1.1, 0.0)
        if prec is None:
            return ofdm.td_to_fd(pa_fn(ofdm.fd_to_td(a)))
        if prec in ("float32", "bfloat16"):
            return transmit.ifft_pa_fft(a, "softlim", sat, use_mxu_fft=True,
                                        mxu_storage=prec)
        return mxu_fft.fused_ifft_pa_fft(a, pa_fn, precision=prec)

    results = {}
    for name, prec in [("jnpfft", None),
                       ("mxu_highest", jax.lax.Precision.HIGHEST),
                       ("planar_f32", "float32"),
                       ("planar_bf16", "bfloat16")]:
        @jax.jit
        def fn(ar, ai, prec=prec):
            out = chain(jax.lax.complex(ar, ai), prec)
            return jnp.sum(jnp.abs(out), axis=(-1, -2))
        t = timeit(fn, xr, xi)
        results[name] = (t, np.asarray(fn(xr, xi)))
        base = results["jnpfft"][0]
        print(f"{name:12s}: {t*1e3:8.2f} ms  ({batch*64/t:,.0f} pairs/s) "
              f"speedup {base/t:.2f}x", flush=True)

    ref = results["jnpfft"][1]
    for name in ("mxu_highest", "planar_f32", "planar_bf16"):
        rel = np.abs(results[name][1] - ref).max() / np.abs(ref).max()
        print(f"{name}: |sum| rel diff {rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
