"""Fused OFDM-PA Pallas kernel: IFFT-4096 -> per-sample PA clip -> FFT-4096
in one VMEM-resident pass per batch tile.

Motivation: the distorted-TX chain (``reference/transceiver.py:111-174``
per antenna; here ``models/transmit.array_transmit_fd``) is dominated by
the back-to-back 4096-point transforms around the memoryless PA. XLA
executes them as separate multi-pass FFT ops with HBM round trips; this
kernel keeps each ``[tile, 4096]`` block in VMEM and computes both
transforms as MXU matmuls via the 4-step (Cooley-Tukey 64 x 64)
factorization.

Key trick — **permutation cancellation**: the intermediate time-domain
sample *ordering* is irrelevant because the PA is memoryless, so the IFFT
is computed into a digit-swapped layout and the FFT applies the exact
inverse chain (DFT-64 matrices are symmetric), restoring standard
frequency order without any index shuffles:

    X[a,b] --swap--> [b,a] --@W--> [b,c] --*TW--> --swap--> [c,b] --@W-->
    P[c,d] = x[c + 64 d]            (clip elementwise on P)
    P --@W*--> --swap--> --*TW*--> --@W*--> --swap--> X'[a,b]

Each complex matmul is 4 real ``[tile*64, 64] @ [64, 64]`` MXU matmuls in
float32 (complex dtypes and FFT primitives are unavailable in Mosaic).

Status: numerically validated (interpret mode, rel err ~4e-7 vs the
``jnp.fft`` chain). The axon-tunneled Mosaic compiler in this environment
rejects/hangs on MXU ``dot`` and cross-lane relayout ops, so the kernel is
OFF by default (``models/transmit`` keeps the XLA path); enable via
``fused_ifft_clip_fft`` on hardware with a full Mosaic toolchain.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
R = 64  # radix: N = R * R


@functools.lru_cache(maxsize=None)
def _tables():
    a = np.arange(R)
    w = np.exp(-2j * np.pi * np.outer(a, a) / R)           # DFT-64 (symmetric)
    tw = np.exp(-2j * np.pi * np.outer(a, a) / N)          # twiddle(b, c)
    # fold the ortho 1/sqrt(N) = 1/64 per direction into the twiddles
    wi = np.conj(w)                                        # IDFT-64 (x64 scale)
    twi = np.conj(tw) / R
    twf = tw / R
    return (w.real.astype(np.float32), w.imag.astype(np.float32),
            wi.real.astype(np.float32), wi.imag.astype(np.float32),
            twi.real.astype(np.float32), twi.imag.astype(np.float32),
            twf.real.astype(np.float32), twf.imag.astype(np.float32))


def _cmatmul(ar, ai, br, bi):
    """(ar + i ai) @ (br + i bi) -> 4 real MXU matmuls."""
    rr = jnp.dot(ar, br, preferred_element_type=jnp.float32) \
        - jnp.dot(ai, bi, preferred_element_type=jnp.float32)
    ri = jnp.dot(ar, bi, preferred_element_type=jnp.float32) \
        + jnp.dot(ai, br, preferred_element_type=jnp.float32)
    return rr, ri


def _stage(xr, xi, wr, wi, tile):
    """swap last-two-dims then DFT-64 over the last axis."""
    xr = jnp.swapaxes(xr.reshape(tile, R, R), -1, -2).reshape(tile * R, R)
    xi = jnp.swapaxes(xi.reshape(tile, R, R), -1, -2).reshape(tile * R, R)
    return _cmatmul(xr, xi, wr, wi)


def _fused_kernel(xr_ref, xi_ref, sat_ref, w_ref, tw_ref, or_ref, oi_ref, *,
                  tile):
    # w_ref: [4, 64, 64] = (Wr, Wi, WIr, WIi); tw_ref: [4, 64, 64] =
    # (TWIr, TWIi, TWFr, TWFi)
    wr, wi, wir, wii = (w_ref[0], w_ref[1], w_ref[2], w_ref[3])
    twir, twii, twfr, twfi = (tw_ref[0], tw_ref[1], tw_ref[2], tw_ref[3])
    xr = xr_ref[:]
    xi = xi_ref[:]

    # ---- IFFT (digit-swapped output) ----
    sr, si = _stage(xr, xi, wir, wii, tile)                 # [tile*R, R]
    tr = sr.reshape(tile, R, R)
    ti = si.reshape(tile, R, R)
    ur = tr * twir - ti * twii                              # twiddle (x 1/64)
    ui = tr * twii + ti * twir
    pr, pi = _stage(ur, ui, wir, wii, tile)                 # time samples P

    # ---- per-sample PA clip (soft limiter) ----
    sat = sat_ref[0, 0]
    pwr = pr * pr + pi * pi
    scale = jnp.where(pwr <= sat, 1.0, jnp.sqrt(sat / jnp.where(pwr > 0.0, pwr, 1.0)))
    pr = pr * scale
    pi = pi * scale

    # ---- FFT (inverse chain; restores standard FD order) ----
    qr, qi = _cmatmul(pr, pi, wr, wi)                       # [tile*R, R]
    vr = jnp.swapaxes(qr.reshape(tile, R, R), -1, -2)
    vi = jnp.swapaxes(qi.reshape(tile, R, R), -1, -2)
    er = vr * twfr - vi * twfi
    ei = vr * twfi + vi * twfr
    fr, fi = _cmatmul(er.reshape(tile * R, R), ei.reshape(tile * R, R), wr, wi)
    or_ref[:] = jnp.swapaxes(fr.reshape(tile, R, R), -1, -2).reshape(tile, N)
    oi_ref[:] = jnp.swapaxes(fi.reshape(tile, R, R), -1, -2).reshape(tile, N)


def fused_ifft_clip_fft(x_fd: Array, sat_power: Array | float,
                        tile: int = 128) -> Array:
    """``FFT(softlimit(IFFT(x_fd)))`` with ortho norms, fused in Pallas.

    ``x_fd``: complex64 ``[..., 4096]`` frequency-domain frames;
    ``sat_power``: scalar saturation power. Returns the same shape.
    """
    lead = x_fd.shape[:-1]
    total = int(np.prod(lead)) if lead else 1
    if total % tile:
        tile = int(np.gcd(total, tile)) or 1
    xr = jnp.real(x_fd).reshape(total, N).astype(jnp.float32)
    xi = jnp.imag(x_fd).reshape(total, N).astype(jnp.float32)
    sat = jnp.asarray(sat_power, jnp.float32).reshape(1, 1)
    (wr, wi, wir, wii, twir, twii, twfr, twfi) = _tables()
    w_tab = jnp.asarray(np.stack([wr, wi, wir, wii]))
    tw_tab = jnp.asarray(np.stack([twir, twii, twfr, twfi]))

    grid = (total // tile,)
    kernel = functools.partial(_fused_kernel, tile=tile)
    outr, outi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((4, R, R), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, R, R), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((total, N), jnp.float32),
                   jax.ShapeDtypeStruct((total, N), jnp.float32)],
    )(xr, xi, sat, w_tab, tw_tab)
    return jax.lax.complex(outr, outi).reshape(*lead, N).astype(x_fd.dtype)
