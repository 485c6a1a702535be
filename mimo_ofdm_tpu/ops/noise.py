"""Complex AWGN generation from explicit JAX PRNG keys.

Replaces the stateful per-object ``np.random.default_rng`` streams of the
reference (``reference/noise.py:17-27``) with functional keys; the noise
amplitude convention is identical to ``Awgn.process``
(``reference/noise.py:45-66``): per-complex-sample noise power equals
``avg_sample_pow / 10^(snr_db/10)`` (the reference draws two unit normals,
scales by ``0.5 * sqrt(2 * avg_pow / snr_lin)`` per real dimension).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def complex_normal(key: Array, shape: tuple[int, ...], dtype=jnp.complex64) -> Array:
    """Circular complex Gaussian with unit variance (0.5 per real dim)."""
    rdtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    re, im = jax.random.normal(key, (2, *shape), dtype=rdtype)
    return (re + 1j * im).astype(dtype) * jnp.sqrt(jnp.asarray(0.5, rdtype)).astype(dtype)


def awgn(key: Array, in_sig: Array, snr_db: Array | float,
         avg_sample_pow: Array | float = 1.0) -> Array:
    """Add AWGN at the given SNR against ``avg_sample_pow``
    (``reference/noise.py:45-66``, SNR branch)."""
    noise_pow = jnp.asarray(avg_sample_pow) / (10.0 ** (jnp.asarray(snr_db) / 10.0))
    noise = complex_normal(key, in_sig.shape, in_sig.dtype)
    return in_sig + noise * jnp.sqrt(noise_pow).astype(in_sig.dtype)


def awgn_fixed_power(key: Array, in_sig: Array, noise_p_dbm: Array | float) -> Array:
    """Add AWGN with fixed power in dBm
    (``reference/noise.py:59-60``: per-sample noise power
    ``2 * 0.001 * 10^(dBm/10) / 2``)."""
    noise_pow = 0.001 * 10.0 ** (jnp.asarray(noise_p_dbm) / 10.0)
    noise = complex_normal(key, in_sig.shape, in_sig.dtype)
    return in_sig + noise * jnp.sqrt(noise_pow).astype(in_sig.dtype)
