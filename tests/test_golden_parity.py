"""Golden parity tests: our jitted receivers vs an independent NumPy
re-implementation of the reference algorithms (written here from the
reference's documented math, ``reference/corrector.py:52-207``), on
identical inputs in float64. This is the "golden-value" layer of the test
strategy (SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.ops import ofdm, pa, qam
from mimo_ofdm_tpu.models import receivers


M, N_FFT, N_SC = 64, 256, 128
BPS = 6


def np_constellation():
    n = int(np.sqrt(M))
    pam = np.arange(-n + 1, n, 2)
    snake = np.tile(np.hstack((pam, pam[::-1])), n // 2) * 1j + pam.repeat(n)
    gray = np.arange(M) ^ (np.arange(M) >> 1)
    return snake[gray.argsort()]


def np_embed(sym, n_fft=N_FFT):
    out = np.zeros(n_fft, np.complex128)
    out[-(N_SC // 2):] = sym[: N_SC // 2]
    out[1: N_SC // 2 + 1] = sym[N_SC // 2:]
    return out


def np_extract(fd, n_sc=N_SC):
    return np.concatenate((fd[-(n_sc // 2):], fd[1: n_sc // 2 + 1]))


def np_clip(x, sat):
    p = np.abs(x) ** 2
    return np.where(p <= sat, x, x * np.sqrt(sat / np.where(p > 0, p, 1.0)))


def np_detect(sym, constellation):
    idx = np.abs(sym - constellation[:, None]).argmin(0)
    return constellation[idx], idx


def np_cnc_receive(rx_sc, n_iters, ibo_db):
    """Reference CNC loop (``reference/corrector.py:52-112``) in NumPy."""
    constellation = np_constellation()
    avg_sym_pow = np.mean(np.abs(constellation) ** 2)
    upsample = N_FFT / N_SC
    sat = 10 ** (ibo_db / 10) * avg_sym_pow / upsample
    alpha = float(pa.bussgang_alpha(ibo_db))
    d_est = np.zeros(N_SC, np.complex128)
    bits_per_iter, sym_per_iter = [], []
    for _ in range(n_iters + 1):
        corr = rx_sc - d_est
        det, idx = np_detect(corr, constellation)
        bits = ((idx[:, None] >> np.arange(BPS - 1, -1, -1)) & 1).ravel()
        bits_per_iter.append(bits)
        sym_per_iter.append(det)
        td = np.fft.ifft(np_embed(det), norm="ortho")
        rep = np_extract(np.fft.fft(np_clip(td, sat), norm="ortho"))
        d_est = rep / alpha - det
    return np.stack(bits_per_iter), np.stack(sym_per_iter)


def np_mcnc_receive(rx_sc, n_iters, h_sc, v, agc_sc, sat):
    """Reference MCNC loop (``reference/corrector.py:165-207``) in NumPy."""
    constellation = np_constellation()
    d_est = np.zeros(N_SC, np.complex128)
    bits_per_iter = []
    for _ in range(n_iters + 1):
        corr = rx_sc - d_est
        det, idx = np_detect(corr, constellation)
        bits = ((idx[:, None] >> np.arange(BPS - 1, -1, -1)) & 1).ravel()
        bits_per_iter.append(bits)
        # full TX replica per antenna
        per_ant = v * det
        rep_sc = np.zeros(N_SC, np.complex128)
        for a in range(v.shape[0]):
            td = np.fft.ifft(np_embed(per_ant[a]), norm="ortho")
            rep_sc += h_sc[a] * np_extract(np.fft.fft(np_clip(td, sat),
                                                      norm="ortho"))
        rep_sc = rep_sc / agc_sc
        d_est = rep_sc - det
    return np.stack(bits_per_iter)


@pytest.fixture
def rx_input():
    rng = np.random.default_rng(0)
    constellation = np_constellation()
    tx_idx = rng.integers(0, M, N_SC)
    tx_sym = constellation[tx_idx]
    # distorted observation: clipped + noise
    td = np.fft.ifft(np_embed(tx_sym), norm="ortho")
    avg_sym_pow = np.mean(np.abs(constellation) ** 2)
    sat = 10 ** (0 / 10) * avg_sym_pow / (N_FFT / N_SC)
    rx_fd = np.fft.fft(np_clip(td, sat), norm="ortho")
    alpha = float(pa.bussgang_alpha(0.0))
    rx_sc = np_extract(rx_fd) / alpha
    rx_sc += (rng.normal(size=N_SC) + 1j * rng.normal(size=N_SC)) * 0.05
    return rx_sc


def test_cnc_bit_exact_vs_numpy_reference(rx_input):
    n_iters = 4
    gold_bits, gold_sym = np_cnc_receive(rx_input, n_iters, ibo_db=0.0)

    replica = receivers.make_cnc_replica(M, N_FFT, N_SC, ibo_db=0.0)
    bits, sym = receivers.cnc_iterate(jnp.asarray(rx_input, jnp.complex128),
                                      n_iters, M, replica)
    np.testing.assert_allclose(np.asarray(sym), gold_sym, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(bits), gold_bits)


def test_mcnc_bit_exact_vs_numpy_reference(rx_input):
    rng = np.random.default_rng(1)
    n_ant, n_iters = 4, 3
    h_sc = (rng.normal(size=(n_ant, N_SC))
            + 1j * rng.normal(size=(n_ant, N_SC))) / np.sqrt(2)
    v = np.conj(h_sc) / np.sqrt(np.sum(np.abs(h_sc) ** 2, axis=0))
    avg_sym_pow = float(np.mean(np.abs(np_constellation()) ** 2))
    avg_samp_pow = avg_sym_pow * N_SC / N_FFT
    sat = 10 ** (0 / 10) * avg_samp_pow * np.mean(np.abs(v) ** 2)
    vk_pow = np.sum(np.abs(v) ** 2, axis=1)
    ak = np.asarray(pa.bussgang_alpha(
        10 * np.log10(10 ** 0 * N_SC / (vk_pow * n_ant))))
    agc_sc = np.sum(ak[:, None] * h_sc * v, axis=0)

    gold = np_mcnc_receive(rx_input, n_iters, h_sc, v, agc_sc, sat)

    replica = receivers.make_mcnc_replica(
        jnp.asarray(h_sc), jnp.asarray(v), jnp.asarray(agc_sc),
        constel_size=M, n_fft=N_FFT, n_sc=N_SC, sat_power=sat)
    bits, _ = receivers.cnc_iterate(jnp.asarray(rx_input, jnp.complex128),
                                    n_iters, M, replica)
    np.testing.assert_array_equal(np.asarray(bits), gold)


def test_cnc_mu_matches_numpy(rx_input):
    """CNCWI: equal-power combined replica (``reference/corrector.py:288-345``)."""
    rng = np.random.default_rng(2)
    constellation = np_constellation()
    other = constellation[rng.integers(0, M, N_SC)]
    n_iters = 2
    # numpy gold
    avg_sym_pow = np.mean(np.abs(constellation) ** 2)
    sat = avg_sym_pow / (N_FFT / N_SC)
    alpha = float(pa.bussgang_alpha(0.0))
    d_est = np.zeros(N_SC, np.complex128)
    gold = []
    w = np.sqrt(2) / 2
    for _ in range(n_iters + 1):
        corr = rx_input - d_est
        det, idx = np_detect(corr, constellation)
        gold.append(((idx[:, None] >> np.arange(BPS - 1, -1, -1)) & 1).ravel())
        comb = w * det + w * other
        td = np.fft.ifft(np_embed(comb), norm="ortho")
        rep = np_extract(np.fft.fft(np_clip(td, sat), norm="ortho")) / alpha
        d_est = rep - det
    gold = np.stack(gold)

    replica = receivers.make_cnc_mu_replica(
        jnp.asarray(other), constel_size=M, n_fft=N_FFT, n_sc=N_SC, ibo_db=0.0)
    bits, _ = receivers.cnc_iterate(jnp.asarray(rx_input, jnp.complex128),
                                    n_iters, M, replica)
    np.testing.assert_array_equal(np.asarray(bits), gold)


def test_mcnc_mu_bit_exact_vs_numpy_reference(rx_input):
    """MCNCWI: the replica transmit stacks the detected own-user symbols
    with the known other-user symbols in original user order, runs the
    full MU-precoded TX + channel + own-user AGC
    (``reference/corrector.py:405-451``)."""
    rng = np.random.default_rng(3)
    constellation = np_constellation()
    n_ant, n_usr, n_iters, usr_idx = 4, 2, 3, 0
    other = constellation[rng.integers(0, M, N_SC)]

    h_mu = (rng.normal(size=(n_usr, n_ant, N_SC))
            + 1j * rng.normal(size=(n_usr, n_ant, N_SC))) / np.sqrt(2)
    # MU-MRT with joint normalization (reference/antenna_array.py:201-220)
    norm = np.sqrt(np.sum(np.abs(h_mu) ** 2, axis=(0, 1)))
    v_mu = np.transpose(np.conj(h_mu) / norm, (1, 0, 2))   # [n_ant, n_usr, n_sc]

    avg_sym_pow = float(np.mean(np.abs(constellation) ** 2))
    avg_samp_pow = avg_sym_pow * N_SC / N_FFT
    sat = avg_samp_pow * np.mean(np.sum(np.abs(v_mu) ** 2, axis=1))
    # per-antenna alpha from total precoder power over users
    # (reference/corrector.py:379-384)
    vk_pow = np.sum(np.abs(v_mu) ** 2, axis=(1, 2))
    ak = np.asarray(pa.bussgang_alpha(
        10 * np.log10(10 ** 0 * N_SC / (vk_pow * n_ant))))
    h_u = h_mu[usr_idx]
    agc_sc = np.sum(ak[:, None] * h_u * v_mu[:, usr_idx, :], axis=0)

    # --- independent numpy MCNC-MU loop ---
    d_est = np.zeros(N_SC, np.complex128)
    gold = []
    for _ in range(n_iters + 1):
        corr = rx_input - d_est
        det, idx = np_detect(corr, constellation)
        gold.append(((idx[:, None] >> np.arange(BPS - 1, -1, -1)) & 1).ravel())
        sym_mu = np.stack([det, other]) if usr_idx == 0 else np.stack([other, det])
        per_ant = np.einsum("aus,us->as", v_mu, sym_mu)    # [n_ant, n_sc]
        rep_sc = np.zeros(N_SC, np.complex128)
        for a in range(n_ant):
            td = np.fft.ifft(np_embed(per_ant[a]), norm="ortho")
            rep_sc += h_u[a] * np_extract(np.fft.fft(np_clip(td, sat),
                                                     norm="ortho"))
        d_est = rep_sc / agc_sc - det
    gold = np.stack(gold)

    replica = receivers.make_mcnc_mu_replica(
        jnp.asarray(other), usr_idx, jnp.asarray(h_u), jnp.asarray(v_mu),
        jnp.asarray(agc_sc), constel_size=M, n_fft=N_FFT, n_sc=N_SC,
        sat_power=sat)
    bits, _ = receivers.cnc_iterate(jnp.asarray(rx_input, jnp.complex128),
                                    n_iters, M, replica)
    np.testing.assert_array_equal(np.asarray(bits), gold)
