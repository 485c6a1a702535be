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


import os as _os

_CMUL_4MULT = _os.environ.get("MXU_FFT_CMUL", "karatsuba") == "4mult"


def _kara(ar, ai, m3, spec, precision, out_dtype=jnp.float32):
    """Complex product ``X (*) M`` where the real contraction is the einsum
    ``spec`` — either ``"...ab,bc->...ac"`` (contract the last axis) or
    ``"...ab,ac->...bc"`` (contract axis -2; output stays batch-leading so
    NO transpose is emitted, unlike a ``W @ X`` einsum whose dot output
    would be ``[w_free, batch, x_free]``).

    Default is Karatsuba (3 real GEMMs + the materialized ``ar + ai``
    operand); ``MXU_FFT_CMUL=4mult`` selects the schoolbook 4-GEMM form
    (more MXU FLOPs — free on a bandwidth-bound chain — but no extra
    operand tensor). Kept switchable for A/B measurement."""
    mr, mi_m_mr, mr_p_mi = m3
    if _CMUL_4MULT:
        mi = mi_m_mr + mr   # reconstructed; prep stores (mi - mr) exactly
        arr = jnp.einsum(spec, ar, mr, precision=precision,
                         preferred_element_type=out_dtype)
        aii = jnp.einsum(spec, ai, mi, precision=precision,
                         preferred_element_type=out_dtype)
        ari = jnp.einsum(spec, ar, mi, precision=precision,
                         preferred_element_type=out_dtype)
        air = jnp.einsum(spec, ai, mr, precision=precision,
                         preferred_element_type=out_dtype)
        return arr - aii, ari + air
    k1 = jnp.einsum(spec, ar + ai, mr, precision=precision,
                    preferred_element_type=out_dtype)
    k2 = jnp.einsum(spec, ar, mi_m_mr, precision=precision,
                    preferred_element_type=out_dtype)
    k3 = jnp.einsum(spec, ai, mr_p_mi, precision=precision,
                    preferred_element_type=out_dtype)
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
# ``reference/mp_model.py:299``). In an [n2 rows, n1 cols] digit
# decomposition (k = k1 + n1 k2) the occupied bins are *whole rows*: bins
# 1..n_sc/2 fill rows 0..q-1 (plus a single straggler at bin n_sc/2, row q
# col 0, displaced by the unused DC bin) and bins n_fft-n_sc/2.. fill rows
# n2-q..n2-1, with q = (n_sc/2)/n1. So the first matmul stage contracts a
# [2q+1, n2] block instead of [n2, n2] (the straggler folded in as one
# extra row holding only X[n_sc/2]) and the last stage computes only 2q+1
# output columns (the extra column is the straggler bin) — for the
# canonical n_sc = n_fft/2 this halves the first/last stage FLOPs and,
# more importantly on an HBM-bound chain, never materializes the full-band
# [.., n_fft] frames on either side.
# Folding the stragglers into the GEMMs (rather than a scatter-add +
# separate dot) keeps every reduction inside a fixed-shape contraction,
# so results stay bit-identical across shardings/batch layouts.
# ---------------------------------------------------------------------------


def prune_factors(n_fft: int, n_sc: int) -> tuple[int, int] | None:
    """``(n1, n2)`` factorization for the pruned chain (``n1`` = row
    length = lane dim of every stage tensor, ``n2 = n_fft / n1`` = rows),
    or ``None`` when ineligible.

    Prefers the square R x R split when ``n_fft`` is a perfect square:
    every stage tensor is then [R, R] and the measured end-to-end link
    throughput beats the 128-lane rectangular split by ~11% (11.3k vs
    10.0k frames/s on the canonical bench) — the rect chain's pruned
    stages carry 32- and (2q+1)-lane dims that pad to the 128-lane tile.
    An isolated-chain microbenchmark (``scripts/probe_layout.py``) ranks
    them the other way; the link-level A/B is what counts. For NON-square
    ``n_fft`` (2048, 8192, ...) the ``n1 = 128`` rectangular split is the
    only MXU option and replaces what used to be a jnp.fft fallback."""
    if n_sc >= n_fft or n_sc % 2:
        return None
    h = n_sc // 2
    r = square_radix(n_fft)
    if r is not None and h % r == 0 and h >= r:
        return r, r
    for n1 in (128,):
        n2 = n_fft // n1
        if (n_fft % n1 == 0 and n2 % 8 == 0 and h % n1 == 0
                and h >= n1 and 2 * (h // n1) + 1 <= n2):
            return n1, n2
    return None


def sc_prune_eligible(n_fft: int, n_sc: int) -> bool:
    """Pruned-chain eligibility: some [n2 rows, n1 cols] digit split with
    the half-band aligned to whole rows."""
    return prune_factors(n_fft, n_sc) is not None


@functools.lru_cache(maxsize=None)
def _pruned_tables(n: int, n_sc: int, n1: int, dtype_name: str):
    """Karatsuba-prepared constants for the pruned [n2, n1] chain.

    Index math (generalizing the verified square case, k = k1 + n1 k2,
    m = m2 + n2 m1, ortho norm; ``n1 = n2`` reproduces the module-docstring
    factorization exactly):

        T1[k1, m2] = sum_k2 X[k1 + n1 k2] . Wc2[k2, m2]        (CA, pruned rows)
        Pt[m2, m1] = sum_k1 (T1 . TWc)[k1, m2] . Wc1[k1, m1]   (CA)
                   = x[m2 + n2 m1]   (digit-swapped time samples)
        T3[m2, k1'] = sum_m1 pa(Pt)[m2, m1] . W1[m1, k1']      (CB)
        Y[k1' + n1 k2'] = sum_m2 (T3 . TW)[m2, k1'] . W2[m2, k2']  (CA, pruned cols)

    with TWc[k1, m2] = e^{+2i pi k1 m2 / n} / sqrt(n) and
    TW[m2, k1'] = e^{-2i pi m2 k1' / n} / sqrt(n)."""
    n2 = n // n1
    q = (n_sc // 2) // n1
    a1, a2 = np.arange(n1), np.arange(n2)
    w1 = np.exp(-2j * np.pi * np.outer(a1, a1) / n1)
    w2 = np.exp(-2j * np.pi * np.outer(a2, a2) / n2)
    tw = np.exp(-2j * np.pi * np.outer(a2, a1) / n) / math.sqrt(n)  # [n2, n1]
    dt = np.dtype(jnp.bfloat16.dtype) if dtype_name == "bfloat16" else np.float32
    # occupied rows/cols plus the straggler row/col q (bin n_sc/2); q never
    # collides with the occupied set since 2q + 1 <= n2
    rows = np.concatenate([np.arange(q), np.arange(n2 - q, n2), [q]])

    def prep(m):
        return (np.asarray(m.real, dt), np.asarray(m.imag - m.real, dt),
                np.asarray(m.real + m.imag, dt))

    return {
        "q": q,
        "wc2_rows": prep(np.conj(w2)[rows, :]),  # [2q+1, n2] input-side block
        "w2_cols": prep(w2[:, rows]),            # [n2, 2q+1] output-side block
        "w1": prep(w1), "wc1": prep(np.conj(w1)),
        # TWc applies on T1 [k1(n1), m2(n2)]; TW applies on T3 [m2(n2), k1'(n1)]
        "tw": (np.asarray(tw.real, dt), np.asarray(tw.imag, dt)),
        "twc": (np.asarray(np.conj(tw).T.real, dt),
                np.asarray(np.conj(tw).T.imag, dt)),
    }


def fused_sc_ifft_pa_fft_planar(data_sc: Array, pa_fn_planar, n_fft: int, *,
                                storage: str = "float32") -> Array:
    """Planar fused ``extract_sc(FFT(pa(IFFT(map_sc(d)))))`` taking and
    returning ``[..., n_sc]`` data bins in the reference's extract order
    ``[negative bins | positive bins]`` (``reference/modulation.py:288-293``)
    — the full-band frame is never formed. Exactly equivalent to
    ``map_subcarriers -> fused chain -> extract_subcarriers`` (the pruned
    rows/columns only ever multiply zeros). Requires
    :func:`sc_prune_eligible`; the digit split is whatever
    :func:`prune_factors` picked (128-lane rows when possible)."""
    dr = jnp.real(data_sc).astype(jnp.float32)
    di = jnp.imag(data_sc).astype(jnp.float32)
    outr, outi = fused_sc_ifft_pa_fft_planar_io(dr, di, pa_fn_planar, n_fft,
                                                storage=storage)
    return jax.lax.complex(outr.astype(jnp.float32),
                           outi.astype(jnp.float32)).astype(data_sc.dtype)


def fused_sc_ifft_pa_fft_planar_io(dr: Array, di: Array, pa_fn_planar,
                                   n_fft: int, *,
                                   storage: str = "float32"
                                   ) -> tuple[Array, Array]:
    """Planar-I/O core of :func:`fused_sc_ifft_pa_fft_planar`: takes and
    returns separate real/imag ``[..., n_sc]`` planes so callers that
    already hold planar data (the bf16 channel-block fast path,
    ``models/link_planar.py``) never materialize the complex frames at
    either end. Output planes are in the chain's storage dtype (bf16 when
    ``storage="bfloat16"``) — downstream reductions upconvert for free in
    their accumulation."""
    n_sc = dr.shape[-1]
    fac = prune_factors(n_fft, n_sc)
    assert fac is not None, (n_fft, n_sc)
    n1, n2 = fac
    h = n_sc // 2
    bf16 = storage == "bfloat16"
    st = jnp.bfloat16 if bf16 else jnp.float32
    prec = jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST
    # bf16 storage keeps the whole inter-stage epilogue (GEMM outputs,
    # Karatsuba combines, twiddle cmul) in bf16 too: the 3 k-tensors per
    # stage otherwise materialize in f32 and dominate HBM traffic —
    # measured 11.3k -> 13.2k frames/s on the canonical bench (+17.6%).
    # Accuracy cost: chain rel err -43.8 -> -41.7 dB, still ~-40 dB as
    # documented above.
    acc = st if bf16 else jnp.float32
    tabs = _pruned_tables(n_fft, n_sc, n1, "bfloat16" if bf16 else "float32")
    q = tabs["q"]
    wc2_rows3 = tuple(jnp.asarray(t) for t in tabs["wc2_rows"])
    w2_cols3 = tuple(jnp.asarray(t) for t in tabs["w2_cols"])
    wc13 = tuple(jnp.asarray(t) for t in tabs["wc1"])
    w13 = tuple(jnp.asarray(t) for t in tabs["w1"])
    twcr, twci = (jnp.asarray(t).astype(acc) for t in tabs["twc"])
    twr, twi = (jnp.asarray(t).astype(acc) for t in tabs["tw"])

    lead = dr.shape[:-1]
    in_dt = dr.dtype
    neg_r, pos_r = dr[..., :h], dr[..., h:]
    neg_i, pos_i = di[..., :h], di[..., h:]
    # input block rows (k2 = 0..q-1, n2-q..n2-1, then the straggler):
    # [pos bins 0..h-1 (bin 0 = DC = 0) | neg bins |
    #  straggler row: bin n_sc/2 at col 0, zeros elsewhere]
    zero = jnp.zeros((*lead, 1), in_dt)
    pad = jnp.zeros((*lead, n1 - 1), in_dt)
    xr = jnp.concatenate([zero, pos_r[..., : h - 1], neg_r,
                          pos_r[..., h - 1:], pad], axis=-1)
    xi = jnp.concatenate([zero, pos_i[..., : h - 1], neg_i,
                          pos_i[..., h - 1:], pad], axis=-1)
    xr = xr.reshape(*lead, 2 * q + 1, n1).astype(st)
    xi = xi.reshape(*lead, 2 * q + 1, n1).astype(st)

    # IFFT: stage 1 contracts only the occupied+straggler rows
    br, bi = _kara(xr, xi, wc2_rows3, _CA, prec, acc)   # [.., n1(k1), n2(m2)]
    br, bi = _cmul_planar(br, bi, twcr, twci)
    pr, pi = _kara(br.astype(st), bi.astype(st), wc13, _CA, prec, acc)
    # pr/pi: digit-swapped time samples [.., n2(m2), n1(m1)], 128-lane rows

    pr, pi = pa_fn_planar(pr, pi)

    # FFT back; final stage computes only the data+straggler columns
    er, ei = _kara(pr.astype(st), pi.astype(st), w13, _CB, prec, acc)
    er, ei = _cmul_planar(er, ei, twr, twi)        # [.., n2(m2), n1(k1')]
    fr, fi = _kara(er.astype(st), ei.astype(st), w2_cols3, _CA, prec, acc)
    # fr/fi: [.., n1(k1'), 2q+1(k2'-sel)]; col 2q is the straggler bin n_sc/2
    sor, soi = fr[..., 0, 2 * q], fi[..., 0, 2 * q]
    fr = jnp.swapaxes(fr[..., : 2 * q], -1, -2)
    fi = jnp.swapaxes(fi[..., : 2 * q], -1, -2)
    fr = fr.reshape(*lead, 2 * h)                      # bins [0..h-1 | N-h..N-1]
    fi = fi.reshape(*lead, 2 * h)
    # extract order [neg | pos]: neg = bins N-h.., pos = bins 1..h
    outr = jnp.concatenate([fr[..., h:], fr[..., 1:h], sor[..., None]], axis=-1)
    outi = jnp.concatenate([fi[..., h:], fi[..., 1:h], soi[..., None]], axis=-1)
    return outr, outi


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
