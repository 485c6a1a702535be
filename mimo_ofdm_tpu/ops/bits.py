"""Bit packing/unpacking and bit-level metrics, vectorized for TPU.

Replaces the reference's scalar per-symbol loops
(``reference/utilities.py:18-67`` ``dec2bitarray``/``bitarray2dec``) with
shift-and-mask ops over whole arrays; replaces
``count_mismatched_bits`` (``reference/utilities.py:95-104``) with a fused
XOR + sum.

Bit-order convention (identical to the reference): MSB first within a
symbol's bit group — ``bitarray2dec([b0, b1, ..])`` treats ``b0`` as the
most significant bit (``reference/utilities.py:54-67``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def random_payload_bits(key: Array, shape: int | tuple[int, ...]) -> Array:
    """IID Bernoulli(1/2) payload bits as int8, drawn as packed 32-bit
    words and unpacked with shift/mask — 32x fewer threefry invocations
    than a per-bit ``jax.random.bernoulli`` (which burns a full uniform
    draw per bit). Replaces the reference's ``bit_rng.choice`` payload
    draw (``reference/mp_model.py:156,190``); any fixed bit-extraction of
    uniform words is itself an IID fair-bit stream, so the statistics are
    identical (the stream differs for a given key, which only matters to
    tests pinning exact streams — none do)."""
    if isinstance(shape, int):
        shape = (shape,)
    n_bits = 1
    for s in shape:
        n_bits *= s
    n_words = (n_bits + 31) // 32
    words = jax.random.bits(key, (n_words,), jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (words[:, None] >> shifts[None, :]) & jnp.uint32(1)
    return b.reshape(-1)[:n_bits].astype(jnp.int8).reshape(shape)


def bits_to_ints(bits: Array, bits_per_word: int) -> Array:
    """Pack groups of ``bits_per_word`` bits (MSB first) into integers.

    ``bits`` has shape ``[..., n_words * bits_per_word]``; returns int32
    ``[..., n_words]``. Equivalent to looping ``bitarray2dec`` over
    consecutive groups (``reference/modulation.py:22-24``).
    """
    *lead, n = bits.shape
    if n % bits_per_word:
        raise ValueError(f"bit count {n} not divisible by {bits_per_word}")
    grouped = bits.reshape(*lead, n // bits_per_word, bits_per_word).astype(jnp.int32)
    weights = (1 << jnp.arange(bits_per_word - 1, -1, -1, dtype=jnp.int32))
    return jnp.sum(grouped * weights, axis=-1)


def ints_to_bits(ints: Array, bits_per_word: int) -> Array:
    """Unpack integers into bit arrays, MSB first.

    ``ints`` has shape ``[..., n_words]``; returns int8
    ``[..., n_words * bits_per_word]``. Equivalent to
    ``dec2bitarray`` (``reference/utilities.py:18-51``).
    """
    shifts = jnp.arange(bits_per_word - 1, -1, -1, dtype=ints.dtype)
    bits = (ints[..., None] >> shifts) & 1
    return bits.reshape(*ints.shape[:-1], ints.shape[-1] * bits_per_word).astype(jnp.int8)


def count_bit_errors(tx_bits: Array, rx_bits: Array, axis=None) -> Array:
    """Number of mismatched bits (``reference/utilities.py:95-104``)."""
    return jnp.sum(jnp.bitwise_xor(tx_bits.astype(jnp.int32), rx_bits.astype(jnp.int32)),
                   axis=axis)


def gray_encode(x: Array) -> Array:
    """Binary-reflected Gray code ``x ^ (x >> 1)``
    (``reference/modulation.py:112``)."""
    return jnp.bitwise_xor(x, x >> 1)
