"""Transport-block chain for the coded link: CRC attachment, code-block
segmentation, LDPC encoding and circular-buffer rate matching.

This is the native replacement for the reference's MATLAB 5G-NR DL-SCH
chain (``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:149-154``:
CRC attach → ``nrCodeBlockSegmentLDPC`` → ``nrLDPCEncode`` →
``nrRateMatchLDPC``; decode reverse ``:170-179``: ``nrRateRecoverLDPC`` →
``nrLDPCDecode`` → desegment → CRC check), built in the 38.212 structural
family on top of the QC-LDPC engine in :mod:`mimo_ofdm_tpu.ops.ldpc`:

* **CRC** as a GF(2) matrix product: the 24/16-bit remainder of each input
  bit position is precomputed on host, so attachment/checking is one
  int32 matmul mod 2 — MXU-friendly, jittable, batched.
* **Segmentation** into ``C`` code blocks with per-block CRC24B when
  ``C > 1`` and zero filler bits up to the code's info length, exactly the
  38.212 recipe shape.
* **Rate matching** via a circular buffer with redundancy-version start
  offsets (rv0..rv3 at 0, 1/4, 1/2, 3/4 of the buffer) and filler-bit
  skipping; de-rate-matching scatter-adds LLRs back into the buffer (so
  repeated bits combine) and pins filler LLRs to a large known-zero value.

All sizes are resolved at chain-construction time (static shapes inside
``jit``); the per-frame ops are gathers/scatters with precomputed index
tables.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from mimo_ofdm_tpu.ops import ldpc, nr_ldpc

# 3GPP TS 38.212 §5.1 generator polynomials (MSB-first, degree bit implicit)
CRC24A = (24, 0x864CFB)
CRC24B = (24, 0x800063)
CRC16 = (16, 0x1021)

_FILLER_LLR = 64.0   # "known zero" LLR magnitude for filler bits


@functools.lru_cache(maxsize=None)
def _crc_matrix(n_in: int, length: int, poly: int) -> np.ndarray:
    """``[n_in, length]`` GF(2) matrix: row i is the CRC remainder of a
    message with a single one at position i (MSB-first message, remainder
    of ``m(x) * x^length mod g(x)``)."""
    g = (1 << length) | poly
    out = np.zeros((n_in, length), np.int8)
    # remainder of x^(n_in-1-i+length): iterate LFSR once, reuse shifts
    rem = 1  # x^0
    rems = {}
    for power in range(n_in + length):
        rems[power] = rem
        rem <<= 1
        if rem >> length:
            rem ^= g
    for i in range(n_in):
        r = rems[n_in - 1 - i + length]
        out[i] = [(r >> (length - 1 - b)) & 1 for b in range(length)]
    return out


def crc_remainder(bits: Array, length: int, poly: int) -> Array:
    """CRC remainder ``[..., length]`` of MSB-first ``bits [..., K]``."""
    mat = jnp.asarray(_crc_matrix(bits.shape[-1], length, poly), jnp.int32)
    return (bits.astype(jnp.int32) @ mat) % 2


def crc_attach(bits: Array, kind=CRC24A) -> Array:
    length, poly = kind
    return jnp.concatenate(
        [bits, crc_remainder(bits, length, poly).astype(bits.dtype)], axis=-1)


def crc_ok(bits_with_crc: Array, kind=CRC24A) -> Array:
    """True when the trailing CRC matches (remainder of the whole word is
    zero)."""
    length, poly = kind
    return jnp.all(crc_remainder(bits_with_crc, length, poly) == 0, axis=-1)


def _rv_start(rv: int, buf_len: int, z: int) -> int:
    """Redundancy-version start offset in the circular buffer, aligned to
    the lifting size (the 38.212 k0 pattern: rv0..rv3 at ~0, 1/4, 1/2,
    3/4 of the buffer). IRA codes only; NR codes use the exact
    Table 5.4.2.1-2 offsets (:func:`mimo_ofdm_tpu.ops.nr_ldpc.rv_k0`)."""
    frac = {0: 0.0, 1: 0.25, 2: 0.5, 3: 0.75}[rv]
    return (int(frac * buf_len) // z) * z


@dataclass(frozen=True)
class TransportChain:
    """Static plan: one transport block of ``a`` info bits into ``e_total``
    rate-matched bits using ``c`` code blocks of the given QC-LDPC code."""
    code: ldpc.QcLdpcCode
    a: int                 # transport block payload bits
    e_total: int           # total rate-matched bits (fills the OFDM frame)
    c: int                 # number of code blocks
    k_prime: int           # info bits per code block incl. CB-CRC, pre-filler
    n_filler: int          # filler zero-bits per code block
    rv: int = 0

    @property
    def cb_crc(self) -> bool:
        return self.c > 1

    @property
    def e_cb(self) -> int:
        return self.e_total // self.c

    @property
    def coded_rate(self) -> float:
        return self.a / self.e_total


def make_transport_chain(code: ldpc.QcLdpcCode, e_total: int,
                         target_rate: float | None = None,
                         a: int | None = None, rv: int = 0) -> TransportChain:
    """Resolve segmentation sizes for a transport block.

    Either ``a`` (payload size) or ``target_rate`` (payload ≈
    ``rate * e_total``) must be given. Mirrors the reference's transport
    sizing ``trgt_tb_size = ceil(n_bits_per_frame * code_rate)``
    (``mp_ldpc_model.py:99-104``) plus proper CRC/segmentation overhead.
    """
    auto = a is None
    if auto:
        if target_rate is None:
            raise ValueError("give a or target_rate")
        a = int(np.floor(target_rate * e_total)) - 24    # TB CRC overhead

    def plan(a):
        b = a + 24                                       # + CRC24A
        k_max = code.k
        if b <= k_max:
            c, l_cb = 1, 0
        else:
            l_cb = 24
            c = int(np.ceil(b / (k_max - l_cb)))
        b_prime = b + c * l_cb
        if b_prime % c or e_total % c:
            return None
        k_prime = b_prime // c
        if k_prime > k_max:
            return None
        return TransportChain(code=code, a=a, e_total=e_total, c=c,
                              k_prime=k_prime, n_filler=k_max - k_prime, rv=rv)

    if not auto:
        chain = plan(a)
        if chain is None:
            raise ValueError(
                f"a={a} infeasible for e_total={e_total}, K={code.k}: need "
                f"(a + 24 + 24*C) % C == 0 and e_total % C == 0")
        return chain
    # auto mode: largest feasible payload <= the target (the exact payload
    # is a plan detail; the realized rate is chain.coded_rate)
    for cand in range(a, max(a - 4096, 0), -1):
        chain = plan(cand)
        if chain is not None:
            return chain
    raise ValueError(f"no feasible transport size near a={a} for "
                     f"e_total={e_total}, K={code.k}")


@functools.lru_cache(maxsize=None)
def _rm_tables(chain: TransportChain):
    """(sel [e_cb] int32 buffer positions for the rate-matched bits,
    filler_mask [n] bool) — filler positions are skipped by selection."""
    code, z = chain.code, chain.code.z
    n = code.n
    filler = np.zeros(n, bool)
    if chain.n_filler:
        filler[chain.k_prime: code.k] = True
    if code.kind.startswith("nr"):
        # NR circular buffer: first 2 Zc systematic bits are never
        # transmitted (38.212 section 5.4.2.1), k0 per Table 5.4.2.1-2
        bg = int(code.kind[-1])
        n_punct = 2 * z
        n_cb = n - n_punct
        usable = np.flatnonzero(~filler)
        usable = usable[usable >= n_punct]
        start = n_punct + nr_ldpc.rv_k0(bg, chain.rv, n_cb, z)
        first = int(np.searchsorted(usable, start))
        order = np.concatenate([usable[first:], usable[:first]])
        reps = int(np.ceil(chain.e_cb / len(order)))
        sel = np.tile(order, reps)[: chain.e_cb].astype(np.int32)
        return sel, filler
    usable = np.flatnonzero(~filler)
    start = _rv_start(chain.rv, n, z)
    # rotate usable positions so selection starts at the first usable
    # position >= start, then wrap/repeat to e_cb bits
    first = int(np.searchsorted(usable, start))
    order = np.concatenate([usable[first:], usable[:first]])
    reps = int(np.ceil(chain.e_cb / len(order)))
    sel = np.tile(order, reps)[: chain.e_cb].astype(np.int32)
    # return numpy (not jnp): this cache is shared across jit traces, and a
    # jnp constant created inside one trace must not leak into another
    return sel, filler


def transport_encode(chain: TransportChain, payload: Array) -> Array:
    """``[..., A]`` payload bits -> ``[..., E_total]`` rate-matched coded
    bits (CRC24A → segment (+CRC24B) → QC-LDPC encode → circular-buffer
    select)."""
    code = chain.code
    lead = payload.shape[:-1]
    tb = crc_attach(payload, CRC24A)                       # [..., B]
    if chain.cb_crc:
        seg_payload = chain.k_prime - 24
        cbs = tb.reshape(*lead, chain.c, seg_payload)
        cbs = crc_attach(cbs, CRC24B)                      # [..., C, K']
    else:
        cbs = tb.reshape(*lead, 1, chain.k_prime)
    if chain.n_filler:
        fill = jnp.zeros((*lead, chain.c, chain.n_filler), cbs.dtype)
        cbs = jnp.concatenate([cbs, fill], axis=-1)        # [..., C, K]
    if code.kind.startswith("nr"):
        coded = nr_ldpc.encode(code, cbs)                  # [..., C, N]
    else:
        coded = ldpc.encode(code, cbs)                     # [..., C, N]
    sel, _ = _rm_tables(chain)
    rm = coded[..., sel]                                   # [..., C, E_cb]
    return rm.reshape(*lead, chain.e_total)


def transport_decode(chain: TransportChain, llr: Array,
                     n_iters: int = 25,
                     algorithm: str = "minsum",
                     serial_blocks: int = 0) -> tuple[Array, Array]:
    """``[..., E_total]`` LLRs (positive = bit 0) -> ``(payload [..., A],
    tb_crc_ok [...])``. De-rate-match scatter-adds repeated bits; filler
    positions get a large known-zero LLR.

    ``serial_blocks`` (chunk size; 0 = off) runs the per-code-block BP
    decode as a ``lax.map`` over the flattened leading+block axes in
    chunks of that many blocks, instead of one fully-batched decode.
    Mosaic SIGSEGVs compiling the fully-fused batched sum-product decoder
    for some (code, batch) shapes (see
    ``models/link_ldpc.make_transport_round_fn``); chunked bodies with
    the decoder's ``fusion_barrier`` compile, and chunk 16 costs ~20x
    less wall time than chunk 1. Bit-identical statistics either way."""
    code = chain.code
    lead = llr.shape[:-1]
    sel, filler = _rm_tables(chain)
    per_cb = llr.reshape(*lead, chain.c, chain.e_cb).astype(jnp.float32)
    buf = jnp.zeros((*lead, chain.c, code.n), jnp.float32)
    buf = buf.at[..., sel].add(per_cb)
    buf = jnp.where(filler, _FILLER_LLR, buf)
    if serial_blocks:
        g = int(serial_blocks)
        flat = buf.reshape(-1, code.n)
        n_items = flat.shape[0]
        pad = (-n_items) % g
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, code.n), jnp.float32)], axis=0)
        body = (lambda b: ldpc.decode(code, b, n_iters=n_iters,
                                      algorithm=algorithm,
                                      fusion_barrier=True))
        info = jax.lax.map(body, flat.reshape(-1, g, code.n))
        info = info.reshape(-1, code.k)[:n_items]
        info = info.reshape(*lead, chain.c, code.k)        # [..., C, K]
    else:
        info = ldpc.decode(code, buf, n_iters=n_iters,
                           algorithm=algorithm)            # [..., C, K]
    info = info[..., : chain.k_prime]
    if chain.cb_crc:
        info = info[..., : chain.k_prime - 24]             # strip CRC24B
    tb = info.reshape(*lead, -1)                           # [..., B]
    ok = crc_ok(tb, CRC24A)
    return tb[..., : chain.a], ok


def make_nr_transport_chain(e_total: int, *, bg: int = 1,
                            target_rate: float | None = None,
                            a: int | None = None, rv: int = 0) -> TransportChain:
    """NR DL-SCH sizing (TS 38.212 section 5.2.2, mirroring
    ``nrDLSCHInfo``, ``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:104``):
    segment against ``Kcb`` (8448 BG1 / 3840 BG2), pick ``Zc`` from the 8
    lifting sets via ``Kb Zc >= K'`` (BG2's Kb shrinking with payload),
    fill ``K - K'`` filler bits, rate-match into ``e_total`` bits.

    As in :func:`make_transport_chain`, equal-size code blocks are assumed
    (``C | B'`` and ``C | E``); auto mode searches downward from the
    target payload for a feasible size."""
    auto = a is None
    if auto:
        if target_rate is None:
            raise ValueError("give a or target_rate")
        a = int(np.floor(target_rate * e_total)) - 24

    def plan(a):
        b = a + 24
        kcb = KCB_NR[bg]
        if b <= kcb:
            c, l_cb = 1, 0
        else:
            l_cb = 24
            c = int(np.ceil(b / (kcb - l_cb)))
        b_prime = b + c * l_cb
        if b_prime % c or e_total % c:
            return None
        k_prime = b_prime // c
        _, i_ls, zc = nr_ldpc.select_lifting(bg, k_prime, b)
        code = nr_ldpc.make_nr_code(bg, zc, i_ls)
        if k_prime > code.k:
            return None
        return TransportChain(code=code, a=a, e_total=e_total, c=c,
                              k_prime=k_prime, n_filler=code.k - k_prime,
                              rv=rv)

    if not auto:
        chain = plan(a)
        if chain is None:
            raise ValueError(f"a={a} infeasible for e_total={e_total} (BG{bg})")
        return chain
    for cand in range(a, max(a - 4096, 0), -1):
        chain = plan(cand)
        if chain is not None:
            return chain
    raise ValueError(f"no feasible NR transport size near a={a} for "
                     f"e_total={e_total} (BG{bg})")


KCB_NR = nr_ldpc.KCB
