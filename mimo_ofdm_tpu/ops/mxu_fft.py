"""4-step (Cooley-Tukey R x R) FFT as plain-XLA MXU matmuls.

The reference's hot loop is back-to-back 4096-point transforms around the
memoryless PA (``reference/antenna_array.py:110-140`` per-antenna IFFT ->
clip -> FFT; ``reference/corrector.py:93-98`` per CNC iteration). XLA's
stock ``jnp.fft`` runs them as a multi-pass FFT on the VPU; here the same
transforms are re-expressed as 64x64 ``einsum`` matmuls so the FLOPs land
on the MXU (the systolic array), which on TPU has ~2 orders of magnitude
more f32 throughput than the FFT path needs.

Math (N = R^2, indices n = n1 + R n2, k = k1 + R k2, ortho norm):

    ortho-IFFT    x[n1 + R n2] = (1/R) sum_{k1} e^{+2i pi n1 k1 / N}
                      e^{+2i pi n2 k1 / R} sum_{k2} X[k1 + R k2] e^{+2i pi n1 k2 / R}

With ``Xr = X.reshape(R, R)`` (row k2, col k1), ``Wc[a,b] = e^{+2i pi ab/R}``
(symmetric), ``TW[a,b] = e^{+2i pi ab/N}`` (symmetric):

    Pt = ((Wc @ Xr) * TW) @ Wc / R          # Pt[n1, n2] = x[n2 R + n1]

i.e. the time samples come out in **digit-swapped order** — irrelevant for
a memoryless PA, which is the *permutation-cancellation* trick: the
forward FFT applied to the (clipped) digit-swapped samples

    Yr = (W @ ((Pt @ W) * conj(TW))) / R    # Yr = Y.reshape(R, R), natural

restores natural frequency order with **zero transposes** in the whole
fused IFFT -> PA -> FFT chain: four complex [.., R, R] @ [R, R] matmuls
plus two elementwise twiddles, all fused by XLA around the elementwise PA.

Precision: TPU f32 matmuls default to a single bf16 pass (~1e-2 rel err —
unusable for a 4096-point transform); ``Precision.HIGHEST`` (6-pass) gives
~1e-7, matching ``jnp.fft`` to float32 round-off. That is the default;
``Precision.HIGH`` (3-pass, ~1e-5) is selectable for speed.

Standalone ``fft_mxu`` / ``ifft_mxu`` (natural order, one batched [R, R]
transpose each) are provided for validation against ``jnp.fft``.
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array


def square_radix(n: int) -> int | None:
    """Return R with R*R == n (and R a multiple of 8, so the matmuls tile
    onto the MXU), else None — callers fall back to ``jnp.fft``."""
    r = math.isqrt(n)
    return r if r * r == n and r % 8 == 0 else None


@functools.lru_cache(maxsize=None)
def _tables_np(n: int):
    """(W, Wc, TW, TWc) in float64 numpy; W = DFT-R matrix (symmetric),
    TW = twiddle e^{-2i pi ab / N}. The 1/R ortho scale per direction is
    folded into the twiddles."""
    r = square_radix(n)
    assert r is not None, n
    a = np.arange(r)
    w = np.exp(-2j * np.pi * np.outer(a, a) / r)
    tw = np.exp(-2j * np.pi * np.outer(a, a) / n) / r
    return w, np.conj(w), tw, np.conj(tw)


def _tables(n: int, dtype):
    w, wc, tw, twc = _tables_np(n)
    return (jnp.asarray(w, dtype), jnp.asarray(wc, dtype),
            jnp.asarray(tw, dtype), jnp.asarray(twc, dtype))


_DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


def ifft_digit_swapped(x_fd: Array, precision=_DEFAULT_PRECISION) -> Array:
    """Ortho IFFT of ``[..., N]`` into digit-swapped ``[..., R, R]`` time
    samples ``Pt[..., n1, n2] = x[..., n2 * R + n1]``."""
    n = x_fd.shape[-1]
    r = square_radix(n)
    _, wc, _, twc = _tables(n, x_fd.dtype)
    xr = x_fd.reshape(*x_fd.shape[:-1], r, r)
    t1 = jnp.einsum("ab,...bc->...ac", wc, xr, precision=precision) * twc
    return jnp.einsum("...ab,bc->...ac", t1, wc, precision=precision)


def fft_from_digit_swapped(pt: Array, precision=_DEFAULT_PRECISION) -> Array:
    """Ortho FFT of digit-swapped ``[..., R, R]`` time samples back to a
    natural-order ``[..., N]`` spectrum (inverse of
    :func:`ifft_digit_swapped`)."""
    r = pt.shape[-1]
    n = r * r
    w, _, tw, _ = _tables(n, pt.dtype)
    t2 = jnp.einsum("...ab,bc->...ac", pt, w, precision=precision) * tw
    yr = jnp.einsum("ab,...bc->...ac", w, t2, precision=precision)
    return yr.reshape(*pt.shape[:-2], n)


def fused_ifft_pa_fft(x_fd: Array, pa_fn: Callable[[Array], Array],
                      precision=_DEFAULT_PRECISION) -> Array:
    """``FFT(pa_fn(IFFT(x_fd)))`` (ortho norms) with both transforms as MXU
    matmuls and the elementwise PA applied to the digit-swapped VMEM-
    friendly intermediate. ``pa_fn`` must be memoryless (position-
    independent elementwise), which every reference PA model is
    (``reference/distortion.py:9,102,202``). ``pa_fn`` receives
    ``[..., R, R]`` (flattened sample axis split in two)."""
    pt = ifft_digit_swapped(x_fd, precision)
    return fft_from_digit_swapped(pa_fn(pt), precision)


# ---------------------------------------------------------------------------
# Planar (split real/imag) fused chain.
#
# The complex-dtype chain above is HBM-bandwidth-bound on TPU (measured:
# Precision.HIGH == HIGHEST wall time), so the win is fewer/narrower memory
# passes, not more MXU throughput: operate on separate real/imag planes
# (avoids complex interleave shuffles), use the 3-multiplication complex
# product (25% fewer matmul passes), and optionally store planes in
# bfloat16 (halves traffic; quantization ~2^-8 relative = -40 dB error
# power, far below both the PA distortion and thermal noise at every
# operating point the reference sweeps).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _planar_tables(n: int, dtype_name: str):
    """Karatsuba-prepared DFT/twiddle constants as real numpy pairs."""
    w, wc, tw, twc = _tables_np(n)
    dt = np.dtype(jnp.bfloat16.dtype) if dtype_name == "bfloat16" else np.float32

    def prep(m):
        # k1 = (a_r + a_i) @ m_r ; k2 = a_r @ (m_i - m_r) ; k3 = a_i @ (m_r + m_i)
        # real = k1 - k3, imag = k1 + k2
        return (np.asarray(m.real, dt), np.asarray(m.imag - m.real, dt),
                np.asarray(m.real + m.imag, dt))

    return {"w": prep(w), "wc": prep(wc),
            "tw": (np.asarray(tw.real, dt), np.asarray(tw.imag, dt)),
            "twc": (np.asarray(twc.real, dt), np.asarray(twc.imag, dt))}


def _kara(ar, ai, m3, spec, precision):
    """Karatsuba complex product ``X (*) M`` where the real contraction is
    the einsum ``spec`` — either ``"...ab,bc->...ac"`` (contract the last
    axis) or ``"...ab,ac->...bc"`` (contract axis -2; output stays
    batch-leading so NO transpose is emitted, unlike a ``W @ X`` einsum
    whose dot output would be ``[w_free, batch, x_free]``)."""
    mr, mi_m_mr, mr_p_mi = m3
    k1 = jnp.einsum(spec, ar + ai, mr, precision=precision,
                    preferred_element_type=jnp.float32)
    k2 = jnp.einsum(spec, ar, mi_m_mr, precision=precision,
                    preferred_element_type=jnp.float32)
    k3 = jnp.einsum(spec, ai, mr_p_mi, precision=precision,
                    preferred_element_type=jnp.float32)
    return k1 - k3, k1 + k2


_CA = "...ab,ac->...bc"   # contract axis -2 (sum_a X[a,b] M[a,c])
_CB = "...ab,bc->...ac"   # contract axis -1 (X @ M)


def _cmul_planar(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def fused_ifft_pa_fft_planar(x_fd: Array, pa_fn_planar, *,
                             storage: str = "float32") -> Array:
    """Planar fused ``FFT(pa(IFFT(x)))``: complex in/out, real-plane
    internals. ``pa_fn_planar(pr, pi) -> (pr', pi')`` applies the
    memoryless PA on digit-swapped ``[..., R, R]`` planes.

    ``storage="bfloat16"`` keeps inter-stage planes in bf16 with f32
    matmul accumulation (DEFAULT matmul precision — the operands are
    already bf16 so a single MXU pass is exact in their precision);
    ``"float32"`` uses 6-pass HIGHEST for jnp.fft-equivalent accuracy."""
    n = x_fd.shape[-1]
    r = square_radix(n)
    bf16 = storage == "bfloat16"
    st = jnp.bfloat16 if bf16 else jnp.float32
    prec = jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST
    tabs = _planar_tables(n, "bfloat16" if bf16 else "float32")
    wc3 = tuple(jnp.asarray(t) for t in tabs["wc"])
    w3 = tuple(jnp.asarray(t) for t in tabs["w"])
    twcr, twci = (jnp.asarray(t) for t in tabs["twc"])
    twr, twi = (jnp.asarray(t) for t in tabs["tw"])

    lead = x_fd.shape[:-1]
    xr = jnp.real(x_fd).reshape(*lead, r, r).astype(st)   # [.., k2, k1]
    xi = jnp.imag(x_fd).reshape(*lead, r, r).astype(st)

    # IFFT to digit-swapped time samples. Index bookkeeping (axis -2, -1):
    #   X [k2, k1] --CA Wc--> B [k1, n1] --*TWc--> --CA Wc--> Pt [n1, n2]
    # with Pt[n1, n2] = x[n2 R + n1]; both contractions use the transpose-
    # free CA form, the symmetric twiddle needs no reorientation.
    br, bi = _kara(xr, xi, wc3, _CA, prec)
    br, bi = _cmul_planar(br, bi, twcr.astype(jnp.float32),
                          twci.astype(jnp.float32))
    pr, pi = _kara(br.astype(st), bi.astype(st), wc3, _CA, prec)

    pr, pi = pa_fn_planar(pr, pi)

    # FFT back:  Pt' [n1, n2] --CB W--> D [n1, k1] --*TW--> --CA W-->
    # F [k1, k2]; natural spectrum = F^T (the single unavoidable transpose,
    # fused by XLA into the output convert/consumer pass).
    dr, di = _kara(pr.astype(st), pi.astype(st), w3, _CB, prec)
    dr, di = _cmul_planar(dr, di, twr.astype(jnp.float32),
                          twi.astype(jnp.float32))
    fr, fi = _kara(dr.astype(st), di.astype(st), w3, _CA, prec)
    out = jax.lax.complex(jnp.swapaxes(fr, -1, -2).astype(jnp.float32),
                          jnp.swapaxes(fi, -1, -2).astype(jnp.float32))
    return out.reshape(*lead, n).astype(x_fd.dtype)


# ---------------------------------------------------------------------------
# Subcarrier-pruned fused chain.
#
# The TX/replica chains never observe the guard band: the IFFT input has
# data on only ``n_sc`` of ``n_fft`` bins (DC and the guard bins are zero,
# ``reference/modulation.py:264-267``) and the FFT output is immediately
# stripped back to the data bins (``reference/corrector.py:66``,
# ``reference/mp_model.py:299``). In the [R, R] digit decomposition the
# occupied bins are *whole rows*: bins 1..n_sc/2 fill rows 0..q-1 (plus a
# single straggler at bin n_sc/2, row q col 0, displaced by the unused DC
# bin) and bins n_fft-n_sc/2.. fill rows R-q..R-1, with q = (n_sc/2)/R.
# So the first matmul stage contracts a [2q+1, R] block instead of [R, R]
# (the straggler folded in as one extra row holding only X[n_sc/2]) and
# the last stage computes only 2q+1 output columns (the extra column is
# the straggler bin) — for the canonical n_sc = n_fft/2 this halves the
# first/last stage FLOPs and, more importantly on an HBM-bound chain,
# never materializes the full-band [.., n_fft] frames on either side.
# Folding the stragglers into the GEMMs (rather than a scatter-add +
# separate dot) keeps every reduction inside a fixed-shape contraction,
# so results stay bit-identical across shardings/batch layouts.
# ---------------------------------------------------------------------------


def sc_prune_eligible(n_fft: int, n_sc: int) -> bool:
    """Pruned-chain eligibility: square n_fft and half-band rows aligned
    to whole [R, R] rows."""
    r = square_radix(n_fft)
    return (r is not None and n_sc < n_fft and n_sc % 2 == 0
            and (n_sc // 2) % r == 0 and (n_sc // 2) >= r)


@functools.lru_cache(maxsize=None)
def _pruned_tables(n: int, n_sc: int, dtype_name: str):
    """Karatsuba-prepared constants for the pruned chain."""
    r = square_radix(n)
    q = (n_sc // 2) // r
    w, wc, tw, twc = _tables_np(n)
    dt = np.dtype(jnp.bfloat16.dtype) if dtype_name == "bfloat16" else np.float32
    # occupied rows/cols plus the straggler row/col q (bin n_sc/2); q never
    # collides with the occupied set since n_sc < n_fft
    rows = np.concatenate([np.arange(q), np.arange(r - q, r), [q]])

    def prep(m):
        return (np.asarray(m.real, dt), np.asarray(m.imag - m.real, dt),
                np.asarray(m.real + m.imag, dt))

    return {
        "q": q,
        "wc_rows": prep(wc[rows, :]),            # [2q+1, R] input-side block
        "w_cols": prep(w[:, rows]),              # [R, 2q+1] output-side block
        "w": prep(w), "wc": prep(wc),
        "tw": (np.asarray(tw.real, dt), np.asarray(tw.imag, dt)),
        "twc": (np.asarray(twc.real, dt), np.asarray(twc.imag, dt)),
    }


def fused_sc_ifft_pa_fft_planar(data_sc: Array, pa_fn_planar, n_fft: int, *,
                                storage: str = "float32") -> Array:
    """Planar fused ``extract_sc(FFT(pa(IFFT(map_sc(d)))))`` taking and
    returning ``[..., n_sc]`` data bins in the reference's extract order
    ``[negative bins | positive bins]`` (``reference/modulation.py:288-293``)
    — the full-band frame is never formed. Exactly equivalent to
    ``map_subcarriers -> fused chain -> extract_subcarriers`` (the pruned
    rows/columns only ever multiply zeros). Requires
    :func:`sc_prune_eligible`."""
    n_sc = data_sc.shape[-1]
    r = square_radix(n_fft)
    assert sc_prune_eligible(n_fft, n_sc), (n_fft, n_sc)
    h = n_sc // 2
    bf16 = storage == "bfloat16"
    st = jnp.bfloat16 if bf16 else jnp.float32
    prec = jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST
    tabs = _pruned_tables(n_fft, n_sc, "bfloat16" if bf16 else "float32")
    q = tabs["q"]
    wc_rows3 = tuple(jnp.asarray(t) for t in tabs["wc_rows"])
    w_cols3 = tuple(jnp.asarray(t) for t in tabs["w_cols"])
    wc3 = tuple(jnp.asarray(t) for t in tabs["wc"])
    w3 = tuple(jnp.asarray(t) for t in tabs["w"])
    twcr, twci = (jnp.asarray(t).astype(jnp.float32) for t in tabs["twc"])
    twr, twi = (jnp.asarray(t).astype(jnp.float32) for t in tabs["tw"])

    lead = data_sc.shape[:-1]
    dr = jnp.real(data_sc).astype(jnp.float32)
    di = jnp.imag(data_sc).astype(jnp.float32)
    neg_r, pos_r = dr[..., :h], dr[..., h:]
    neg_i, pos_i = di[..., :h], di[..., h:]
    # input block rows: [pos bins 0..h-1 (bin 0 = DC = 0) | neg bins |
    # straggler row: bin n_sc/2 at col 0, zeros elsewhere]
    zero = jnp.zeros((*lead, 1), jnp.float32)
    pad = jnp.zeros((*lead, r - 1), jnp.float32)
    xr = jnp.concatenate([zero, pos_r[..., : h - 1], neg_r,
                          pos_r[..., h - 1:], pad], axis=-1)
    xi = jnp.concatenate([zero, pos_i[..., : h - 1], neg_i,
                          pos_i[..., h - 1:], pad], axis=-1)
    xr = xr.reshape(*lead, 2 * q + 1, r).astype(st)
    xi = xi.reshape(*lead, 2 * q + 1, r).astype(st)

    # IFFT: stage 1 contracts only the occupied+straggler rows
    br, bi = _kara(xr, xi, wc_rows3, _CA, prec)
    br, bi = _cmul_planar(br, bi, twcr, twci)
    pr, pi = _kara(br.astype(st), bi.astype(st), wc3, _CA, prec)

    pr, pi = pa_fn_planar(pr, pi)

    # FFT back; final stage computes only the data+straggler columns
    er, ei = _kara(pr.astype(st), pi.astype(st), w3, _CB, prec)
    er, ei = _cmul_planar(er, ei, twr, twi)
    fr, fi = _kara(er.astype(st), ei.astype(st), w_cols3, _CA, prec)
    # fr/fi: [.., R(k1), 2q+1(k2-sel)]; col 2q is the straggler bin n_sc/2
    sor, soi = fr[..., 0, 2 * q], fi[..., 0, 2 * q]
    fr = jnp.swapaxes(fr[..., : 2 * q], -1, -2).astype(jnp.float32)
    fi = jnp.swapaxes(fi[..., : 2 * q], -1, -2).astype(jnp.float32)
    fr = fr.reshape(*lead, 2 * h)                      # bins [0..h-1 | N-h..N-1]
    fi = fi.reshape(*lead, 2 * h)
    # extract order [neg | pos]: neg = bins N-h.., pos = bins 1..h
    outr = jnp.concatenate([fr[..., h:], fr[..., 1:h], sor[..., None]], axis=-1)
    outi = jnp.concatenate([fi[..., h:], fi[..., 1:h], soi[..., None]], axis=-1)
    return jax.lax.complex(outr.astype(jnp.float32),
                           outi.astype(jnp.float32)).astype(data_sc.dtype)


def ifft_mxu(x_fd: Array, precision=_DEFAULT_PRECISION) -> Array:
    """Natural-order ortho IFFT over the last axis via MXU matmuls
    (drop-in for ``jnp.fft.ifft(norm="ortho")`` when N is a square)."""
    pt = ifft_digit_swapped(x_fd, precision)
    n = pt.shape[-1] * pt.shape[-2]
    return jnp.swapaxes(pt, -1, -2).reshape(*pt.shape[:-2], n)


def fft_mxu(x_td: Array, precision=_DEFAULT_PRECISION) -> Array:
    """Natural-order ortho FFT over the last axis via MXU matmuls."""
    n = x_td.shape[-1]
    r = square_radix(n)
    pt = jnp.swapaxes(x_td.reshape(*x_td.shape[:-1], r, r), -1, -2)
    return fft_from_digit_swapped(pt, precision)
