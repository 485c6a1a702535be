"""Square-QAM constellation, Gray mapping, modulation and detection.

Reimplements the reference modem (``reference/modulation.py``) as pure,
batched, jittable functions:

* Constellation construction matches ``QamModem.__init__``
  (``reference/modulation.py:239-242``): PAM levels ``-(n-1)..(n-1)`` step 2,
  arranged in a column-snake, then remapped by binary-reflected Gray code
  (``reference/modulation.py:110-114``) so that ``constellation[b]`` is the
  symbol for the MSB-first bit pattern ``b``.
* ``modulate_bits`` replaces the ``np.vectorize`` per-symbol map
  (``reference/modulation.py:13-25``) with pack-to-int + gather.
* ``hard_detect`` replaces the O(M) min-distance scan
  (``reference/modulation.py:76,145``) with an O(1) per-axis PAM
  quantization that is exact for square Gray-snake QAM (ties, a
  measure-zero event, may differ from NumPy's first-argmin convention).
* ``soft_llr`` replaces the scalar triple loop (``reference/modulation.py:30-59``)
  with a vectorized log-sum-exp that is mathematically identical to the
  reference's ``log(sum exp / sum exp)`` but numerically stable.

All functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import Array
from jax.scipy.special import logsumexp

from mimo_ofdm_tpu.ops.bits import bits_to_ints, ints_to_bits


@functools.lru_cache(maxsize=None)
def _constellation_np(constel_size: int) -> np.ndarray:
    """Gray-mapped square-QAM constellation as a host numpy array (c128).

    ``constellation[b]`` is the complex symbol transmitted for the
    MSB-first bit group with integer value ``b``.
    """
    n = int(np.sqrt(constel_size))
    if n * n != constel_size:
        raise ValueError("only square QAM supported (constel_size must be a perfect square)")
    pam = np.arange(-n + 1, n, 2)
    # column-snake arrangement (reference/modulation.py:239-242)
    snake = np.tile(np.hstack((pam, pam[::-1])), n // 2) * 1j + pam.repeat(n)
    gray = np.arange(constel_size) ^ (np.arange(constel_size) >> 1)
    return snake[gray.argsort()].astype(np.complex128)


def qam_constellation(constel_size: int, dtype=jnp.complex64) -> Array:
    """Gray-mapped square-QAM constellation indexed by bit pattern."""
    return jnp.asarray(_constellation_np(constel_size), dtype=dtype)


def avg_symbol_power(constel_size: int) -> float:
    """Mean constellation symbol power, e.g. 42.0 for 64-QAM
    (``reference/modulation.py:218`` via ``td_signal_power``)."""
    c = _constellation_np(constel_size)
    return float(np.mean(np.abs(c) ** 2))


def bits_per_symbol(constel_size: int) -> int:
    b = int(np.log2(constel_size))
    if 2 ** b != constel_size:
        raise ValueError("constellation size must be a power of 2")
    return b


def modulate_bits(bits: Array, constel_size: int, dtype=jnp.complex64) -> Array:
    """Map bits ``[..., n_sym * bps]`` (MSB first) to symbols ``[..., n_sym]``.

    Equivalent to ``modulate`` (``reference/modulation.py:13-25``).
    """
    bps = bits_per_symbol(constel_size)
    idx = bits_to_ints(bits, bps)
    constellation = qam_constellation(constel_size, dtype)
    return jnp.take(constellation, idx, axis=0)


def _pam_quantize(x: Array, n: int) -> Array:
    """Quantize real values to the nearest index of the PAM grid
    ``-(n-1), -(n-3), .., (n-1)`` (step 2), clipped to the grid edges."""
    idx = jnp.round((x + (n - 1)) * 0.5)
    return jnp.clip(idx, 0, n - 1).astype(jnp.int32)


def hard_detect_index(symbols: Array, constel_size: int, alpha: Array | float = 1.0) -> Array:
    """Nearest-constellation-point detection, returning the bit-pattern index.

    Exact for Gray-snake square QAM; O(1) per symbol instead of the O(M)
    distance argmin in the reference (``reference/modulation.py:76``).
    ``alpha`` shrinks the reference constellation (Bussgang-corrected
    detection, ``reference/modulation.py:167-176``); detection against an
    ``alpha``-scaled grid equals detection of ``symbols / alpha`` against
    the unit grid.
    """
    n = int(np.sqrt(constel_size))
    y = symbols / alpha
    r = _pam_quantize(jnp.real(y), n)
    i = _pam_quantize(jnp.imag(y), n)
    # column-snake: for even real-index columns the imag index runs forward,
    # for odd columns it is reversed (reference/modulation.py:242 tiling).
    c = jnp.where(r % 2 == 0, i, n - 1 - i)
    lin = n * r + c
    return jnp.bitwise_xor(lin, lin >> 1)  # Gray encode -> bit pattern


def hard_detect_symbols(symbols: Array, constel_size: int, alpha: Array | float = 1.0,
                        dtype=jnp.complex64) -> Array:
    """Hard symbol detection (``Modem.symbol_detection``,
    ``reference/modulation.py:138-146``). Returns ``alpha``-scaled
    constellation points, as the reference detects against the scaled
    constellation."""
    idx = hard_detect_index(symbols, constel_size, alpha)
    constellation = qam_constellation(constel_size, dtype)
    return jnp.take(constellation, idx, axis=0) * alpha


def demodulate_bits(symbols: Array, constel_size: int, alpha: Array | float = 1.0) -> Array:
    """Hard demodulation to bits ``[..., n_sym * bps]``
    (``reference/modulation.py:63-77``)."""
    idx = hard_detect_index(symbols, constel_size, alpha)
    return ints_to_bits(idx, bits_per_symbol(constel_size))


def detect_symbols_and_bits(symbols: Array, constel_size: int, alpha: Array | float = 1.0,
                            dtype=jnp.complex64) -> tuple[Array, Array]:
    """Fused hard detection returning both constellation points and bits
    (single quantization, used in the CNC loop where the reference calls
    ``symbol_detection`` then ``symbols_to_bits``,
    ``reference/corrector.py:78-82``)."""
    idx = hard_detect_index(symbols, constel_size, alpha)
    constellation = qam_constellation(constel_size, dtype)
    return (jnp.take(constellation, idx, axis=0) * alpha,
            ints_to_bits(idx, bits_per_symbol(constel_size)))


def hard_detect_index_argmin(symbols: Array, constellation: Array) -> Array:
    """Reference-faithful O(M) min-distance detection
    (``reference/modulation.py:76``). Used by tests to cross-check the
    fast path and for arbitrary (non-square) constellations."""
    d2 = jnp.abs(symbols[..., None] - constellation) ** 2
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def soft_llr(symbols: Array, constel_size: int, noise_var: Array | float,
             alpha: Array | float = 1.0) -> Array:
    """Exact per-bit log-likelihood ratios, MSB-first bit order.

    Matches ``soft_decoding`` (``reference/modulation.py:30-59``):
    ``llr[k] = log( sum_{b: bit k=1} e^{-|y-s_b|^2/nv} /
                    sum_{b: bit k=0} e^{-|y-s_b|^2/nv} )``
    where output position ``k`` is MSB-first (the reference writes bit
    ``bit_index`` to position ``bps-1-bit_index``,
    ``reference/modulation.py:54-57``). Positive LLR favours bit=1.
    Computed with log-sum-exp for stability (identical in exact math).

    ``noise_var`` broadcasts against ``symbols``; returns
    ``[..., n_sym * bps]`` float32.
    """
    bps = bits_per_symbol(constel_size)
    constellation = qam_constellation(constel_size, jnp.complex64) * alpha
    nv = jnp.asarray(noise_var)
    neg_d2 = -(jnp.abs(symbols[..., None] - constellation) ** 2) / nv[..., None]
    m = constel_size
    b_idx = np.arange(m)
    # mask[k, b] = bit k (MSB-first) of pattern b
    mask = ((b_idx[None, :] >> (bps - 1 - np.arange(bps)[:, None])) & 1).astype(bool)
    neg_inf = jnp.asarray(-jnp.inf, neg_d2.dtype)
    # [..., n_sym, bps]
    num = logsumexp(jnp.where(mask[np.newaxis, ...], neg_d2[..., None, :], neg_inf), axis=-1)
    den = logsumexp(jnp.where(~mask[np.newaxis, ...], neg_d2[..., None, :], neg_inf), axis=-1)
    llr = num - den
    return llr.reshape(*symbols.shape[:-1], symbols.shape[-1] * bps)
