"""Reference-style CPU baseline for benchmarking.

A faithful re-creation of the reference's computation pattern — Python
loop over antennas with per-call torch FFT round trips
(``reference/antenna_array.py:110-140``, ``reference/modulation.py:269-290``)
and an O(M) min-distance detector in the CNC loop
(``reference/modulation.py:76``, ``reference/corrector.py:52-112``) — used
only to time the baseline frames/s on CPU. Written from scratch against
the same math as :mod:`mimo_ofdm_tpu`; NOT a copy of the reference code.
"""

from __future__ import annotations

import time

import numpy as np

from mimo_ofdm_tpu.ops.qam import _constellation_np
from mimo_ofdm_tpu.utils.config import LinkConfig

try:
    import torch

    def _fft(x):
        return torch.fft.fft(torch.from_numpy(x), norm="ortho").numpy()

    def _ifft(x):
        return torch.fft.ifft(torch.from_numpy(x), norm="ortho").numpy()
except Exception:  # pragma: no cover
    def _fft(x):
        return np.fft.fft(x, norm="ortho")

    def _ifft(x):
        return np.fft.ifft(x, norm="ortho")


def _embed(sym, n_fft):
    out = np.zeros(n_fft, np.complex128)
    n_sc = sym.shape[-1]
    out[-(n_sc // 2):] = sym[: n_sc // 2]
    out[1: n_sc // 2 + 1] = sym[n_sc // 2:]
    return out


def _extract(fd, n_sc):
    return np.concatenate((fd[-(n_sc // 2):], fd[1: n_sc // 2 + 1]))


def _clip(x, sat_pow):
    p = np.abs(x) ** 2
    scale = np.sqrt(sat_pow / np.where(p > 0, p, 1.0))
    return np.where(p <= sat_pow, x, x * scale)


def run_baseline_frame(cfg: LinkConfig, n_iters: int, rng: np.random.Generator,
                       h_fd: np.ndarray, alpha: float) -> None:
    """One distorted frame + CNC receive, reference-style (per-antenna
    Python loop, one FFT call per antenna)."""
    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements
    constellation = _constellation_np(m)
    bps = int(np.log2(m))

    bits = rng.integers(0, 2, n_sc * bps)
    idx = bits.reshape(-1, bps) @ (1 << np.arange(bps - 1, -1, -1))
    sym = constellation[idx]

    # MRT precoding from the channel (per-subcarrier)
    h_sc = np.stack([_extract(h_fd[a], n_sc) for a in range(n_ant)])
    v = np.conj(h_sc) / np.sqrt(np.sum(np.abs(h_sc) ** 2, axis=0))
    sat = 10 ** (cfg.pa.ibo_db / 10) * cfg.modem.avg_sample_power \
        * np.mean(np.abs(v) ** 2)

    # per-antenna TX loop (the reference's hot loop)
    out_fd = np.empty((n_ant, n_fft), np.complex128)
    for a in range(n_ant):
        fd = _embed(v[a] * sym, n_fft)
        td = _ifft(fd)
        out_fd[a] = _fft(_clip(td, sat))

    rx = np.sum(out_fd * h_fd, axis=0)
    rx = rx + (rng.standard_normal(n_fft) + 1j * rng.standard_normal(n_fft)) * 0.1

    agc = np.ones(n_fft, np.complex128)
    hv = np.sum(h_sc * v, axis=0)
    agc[-(n_sc // 2):] = hv[: n_sc // 2]
    agc[1: n_sc // 2 + 1] = hv[n_sc // 2:]
    rx = rx / agc

    # CNC loop with O(M) detection (reference/corrector.py:52-112)
    rx_sc = _extract(rx, n_sc)
    sat_cnc = 10 ** (cfg.pa.ibo_db / 10) * cfg.modem.avg_symbol_power * n_sc / n_fft
    d_est = np.zeros(n_sc, np.complex128)
    for _ in range(n_iters + 1):
        corr = rx_sc - d_est
        det_idx = np.abs(corr - constellation[:, None]).argmin(0)
        det = constellation[det_idx]
        rep = _extract(_fft(_clip(_ifft(_embed(det, n_fft)), sat_cnc)), n_sc)
        d_est = rep / alpha - det


def measure_baseline_frames_per_s(cfg: LinkConfig, n_iters: int,
                                  min_seconds: float = 5.0) -> float:
    from mimo_ofdm_tpu.ops.pa import bussgang_alpha

    rng = np.random.default_rng(0)
    n_ant, n_fft = cfg.array.n_elements, cfg.modem.n_fft
    h_fd = (rng.standard_normal((n_ant, n_fft))
            + 1j * rng.standard_normal((n_ant, n_fft))) / np.sqrt(2)
    alpha = float(bussgang_alpha(cfg.pa.ibo_db))
    # warmup
    run_baseline_frame(cfg, n_iters, rng, h_fd, alpha)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < min_seconds:
        run_baseline_frame(cfg, n_iters, rng, h_fd, alpha)
        n += 1
    return n / (time.perf_counter() - t0)
