"""QAM constellation / modulation / detection unit tests against closed
forms and a NumPy re-derivation of the reference constellation convention
(``reference/modulation.py:110-114,239-242``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.ops import qam
from mimo_ofdm_tpu.ops.bits import bits_to_ints, ints_to_bits, count_bit_errors


def reference_constellation(m: int) -> np.ndarray:
    """Independent re-derivation of the Gray-snake square QAM layout."""
    n = int(np.sqrt(m))
    pam = np.arange(-n + 1, n, 2)
    snake = np.tile(np.hstack((pam, pam[::-1])), n // 2) * 1j + pam.repeat(n)
    gray = np.array([x ^ (x >> 1) for x in range(m)])
    return snake[gray.argsort()]


@pytest.mark.parametrize("m", [4, 16, 64, 256])
def test_constellation_matches_reference_convention(m):
    ours = np.asarray(qam.qam_constellation(m, jnp.complex128))
    np.testing.assert_allclose(ours, reference_constellation(m), rtol=0, atol=0)


@pytest.mark.parametrize("m,expected", [(4, 2.0), (16, 10.0), (64, 42.0), (256, 170.0)])
def test_avg_symbol_power(m, expected):
    assert qam.avg_symbol_power(m) == pytest.approx(expected)


def test_gray_neighbors_differ_by_one_bit():
    """Adjacent constellation points on the I/Q grid differ by exactly one
    bit — the defining property of the Gray mapping."""
    m = 64
    c = np.asarray(qam.qam_constellation(m, jnp.complex128))
    for b in range(m):
        for b2 in range(b + 1, m):
            d = abs(c[b] - c[b2])
            if abs(d - 2.0) < 1e-9:  # grid neighbors
                assert bin(b ^ b2).count("1") == 1, (b, b2)


def test_bits_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(3, 5 * 6)).astype(np.int8)
    ints = bits_to_ints(jnp.asarray(bits), 6)
    back = ints_to_bits(ints, 6)
    np.testing.assert_array_equal(np.asarray(back), bits)
    # MSB-first convention: [1,0,...,0] == 2^(w-1)
    one_hot = jnp.zeros((6,), jnp.int8).at[0].set(1)
    assert int(bits_to_ints(one_hot, 6)[0]) == 32


def test_modulate_demodulate_roundtrip():
    rng = np.random.default_rng(1)
    for m in (4, 16, 64):
        bps = qam.bits_per_symbol(m)
        bits = rng.integers(0, 2, size=(128 * bps,)).astype(np.int8)
        sym = qam.modulate_bits(jnp.asarray(bits), m, jnp.complex128)
        out = qam.demodulate_bits(sym, m)
        np.testing.assert_array_equal(np.asarray(out), bits)


@pytest.mark.parametrize("m", [4, 16, 64, 256])
def test_fast_detect_matches_argmin(m):
    """O(1) Gray-snake quantizer must agree with the reference's O(M)
    min-distance scan (``reference/modulation.py:76``) on noisy symbols."""
    rng = np.random.default_rng(2)
    c = np.asarray(qam.qam_constellation(m, jnp.complex128))
    idx_true = rng.integers(0, m, size=4096)
    noisy = c[idx_true] + (rng.normal(size=4096) + 1j * rng.normal(size=4096)) * 0.9
    fast = np.asarray(qam.hard_detect_index(jnp.asarray(noisy), m))
    ref = np.asarray(qam.hard_detect_index_argmin(jnp.asarray(noisy),
                                                  jnp.asarray(c)))
    np.testing.assert_array_equal(fast, ref)


def test_fast_detect_with_alpha():
    m = 64
    alpha = 0.7
    rng = np.random.default_rng(3)
    c = np.asarray(qam.qam_constellation(m, jnp.complex128)) * alpha
    idx_true = rng.integers(0, m, size=2048)
    noisy = c[idx_true] + (rng.normal(size=2048) + 1j * rng.normal(size=2048)) * 0.3
    fast = np.asarray(qam.hard_detect_index(jnp.asarray(noisy), m, alpha))
    ref = np.asarray(qam.hard_detect_index_argmin(jnp.asarray(noisy),
                                                  jnp.asarray(c)))
    np.testing.assert_array_equal(fast, ref)


def test_soft_llr_matches_bruteforce():
    """LLR must equal the reference's exact sum-exp ratio
    (``reference/modulation.py:30-59``) including the MSB-first bit order."""
    m = 16
    bps = 4
    rng = np.random.default_rng(4)
    c = np.asarray(qam.qam_constellation(m, jnp.complex128))
    y = (rng.normal(size=32) + 1j * rng.normal(size=32)) * 3.0
    nv = 1.7
    llr = np.asarray(qam.soft_llr(jnp.asarray(y), m, nv))
    # brute force per reference loop semantics
    expected = np.zeros(32 * bps)
    for i, yy in enumerate(y):
        for bit_index in range(bps):
            num = sum(np.exp(-abs(yy - s) ** 2 / nv)
                      for b, s in enumerate(c) if (b >> bit_index) & 1)
            den = sum(np.exp(-abs(yy - s) ** 2 / nv)
                      for b, s in enumerate(c) if not (b >> bit_index) & 1)
            expected[i * bps + bps - 1 - bit_index] = np.log(num / den)
    np.testing.assert_allclose(llr, expected, rtol=1e-4, atol=1e-5)


def test_count_bit_errors():
    a = jnp.asarray([0, 1, 1, 0, 1], jnp.int8)
    b = jnp.asarray([0, 1, 0, 0, 0], jnp.int8)
    assert int(count_bit_errors(a, b)) == 2
