"""Native quasi-cyclic LDPC codec in JAX — the TPU replacement for the
reference's out-of-process MATLAB 5G-NR LDPC chain
(``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:91-179``:
``nrLDPCEncode``/``nrLDPCDecode`` via ``matlab.engine``).

Design: a protograph/QC-LDPC engine in the 5G-NR structural family —
an ``[m_b, n_b]`` base matrix of circulant shifts (``-1`` = zero block)
with lifting size ``Z`` and an accumulator (dual-diagonal / IRA-style)
parity part so encoding is a closed-form prefix-XOR. Any base graph in
this format can be plugged in (e.g. the 3GPP 38.212 BG1/BG2 shift tables
as an array); :func:`make_default_code` constructs a deterministic
rate-``k_b/n_b`` code of any lifting size so the coded-BER experiments are
self-contained without the 3GPP tables.

Decoding is flooding normalized min-sum belief propagation, laid out as
dense padded gather/scatter tables — check/variable updates are a few
batched gathers + reductions per iteration inside ``lax.scan``
(TPU-friendly: static shapes, no host sync).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array


@dataclass(frozen=True)
class QcLdpcCode:
    """Quasi-cyclic LDPC code: ``H`` built from ``base[i,j]``-shifted
    ``Z x Z`` identity circulants (``-1`` = zero block). Columns
    ``0..k_b-1`` are systematic; columns ``k_b..n_b-1`` are parity with an
    accumulator chain structure."""
    base: tuple            # [m_b][n_b] ints, hashable nested tuple
    z: int
    # "ira" = accumulator parity chain (encode via prefix-XOR, below);
    # "nr_bg1"/"nr_bg2" = 38.212 parity core (encode via ops.nr_ldpc)
    kind: str = "ira"

    @property
    def m_b(self) -> int:
        return len(self.base)

    @property
    def n_b(self) -> int:
        return len(self.base[0])

    @property
    def k_b(self) -> int:
        return self.n_b - self.m_b

    @property
    def n(self) -> int:
        return self.n_b * self.z

    @property
    def k(self) -> int:
        return self.k_b * self.z

    @property
    def rate(self) -> float:
        return self.k / self.n


def make_default_code(k_b: int = 12, m_b: int = 12, z: int = 32,
                      col_weight: int = 3, seed: int = 7) -> QcLdpcCode:
    """Deterministic QC-LDPC construction: random circulant shifts with
    ``col_weight`` checks per systematic column, plus an IRA accumulator
    parity part ``P[i,i] = 0``, ``P[i,i-1] = 0`` (dual-diagonal with zero
    shifts), which makes encoding a prefix-XOR over block rows."""
    rng = np.random.default_rng(seed)
    base = -np.ones((m_b, k_b + m_b), np.int64)
    for j in range(k_b):
        rows = rng.choice(m_b, size=min(col_weight, m_b), replace=False)
        for i in rows:
            base[i, j] = rng.integers(0, z)
    # accumulator parity part
    for i in range(m_b):
        base[i, k_b + i] = 0
        if i > 0:
            base[i, k_b + i - 1] = 0
    # guarantee every check row touches at least one systematic column
    for i in range(m_b):
        if np.all(base[i, :k_b] < 0):
            base[i, rng.integers(0, k_b)] = rng.integers(0, z)
    return QcLdpcCode(base=tuple(tuple(int(x) for x in row) for row in base),
                      z=z)


def encode(code: QcLdpcCode, info_bits: Array) -> Array:
    """Systematic encode ``[..., K] -> [..., N]`` (int bits).

    With the accumulator parity structure, parity block ``p_i`` satisfies
    ``p_i = p_{i-1} XOR s_i`` where ``s_i`` is the XOR of the shifted
    systematic blocks in check-row ``i`` (matching ``H c^T = 0``).
    """
    z, m_b, k_b = code.z, code.m_b, code.k_b
    base = code.base
    lead = info_bits.shape[:-1]
    c = info_bits.reshape(*lead, k_b, z).astype(jnp.uint8)

    # syndrome of the systematic part per check row
    s = []
    for i in range(m_b):
        acc = jnp.zeros((*lead, z), jnp.uint8)
        for j in range(k_b):
            sh = base[i][j]
            if sh >= 0:
                # H block = I shifted by sh acting on block j:
                # (P_sh c)_r = c_{(r+sh) mod Z}
                acc = acc ^ jnp.roll(c[..., j, :], -sh, axis=-1)
        s.append(acc)
    s = jnp.stack(s, axis=-2)                          # [..., m_b, z]
    # prefix XOR over block rows -> parity blocks (accumulator chain)
    p = jnp.cumsum(s.astype(jnp.int32), axis=-2) % 2
    p = p.astype(jnp.int8)
    out = jnp.concatenate([c.astype(jnp.int8).reshape(*lead, k_b * z),
                           p.reshape(*lead, m_b * z)], axis=-1)
    return out


@functools.lru_cache(maxsize=None)
def _decode_tables(code: QcLdpcCode):
    """Dense padded connectivity tables for min-sum BP.

    Returns (chk_var_idx [n_chk, dc_max], chk_mask, var_edge_idx
    [n_var, dv_max], var_mask, edge_var [n_edges], n_edges) where edges
    are enumerated row-major over (check, connected var).
    """
    z, m_b, n_b = code.z, code.m_b, code.n_b
    base = np.asarray(code.base)
    n_chk, n_var = m_b * z, n_b * z

    chk_vars: list[list[int]] = [[] for _ in range(n_chk)]
    for i in range(m_b):
        for j in range(n_b):
            sh = base[i, j]
            if sh < 0:
                continue
            rows = np.arange(z)
            cols = j * z + (rows + sh) % z
            for r, cvar in zip(rows, cols):
                chk_vars[i * z + r].append(int(cvar))

    dc_max = max(len(v) for v in chk_vars)
    chk_var_idx = np.zeros((n_chk, dc_max), np.int32)
    chk_mask = np.zeros((n_chk, dc_max), bool)
    edge_var = []
    edge_id = np.zeros((n_chk, dc_max), np.int32)
    e = 0
    for ci, vs in enumerate(chk_vars):
        for s_, vj in enumerate(vs):
            chk_var_idx[ci, s_] = vj
            chk_mask[ci, s_] = True
            edge_id[ci, s_] = e
            edge_var.append(vj)
            e += 1
    n_edges = e
    edge_var = np.asarray(edge_var, np.int32)

    var_edges: list[list[int]] = [[] for _ in range(n_var)]
    for eid, vj in enumerate(edge_var):
        var_edges[vj].append(eid)
    dv_max = max(max(len(v) for v in var_edges), 1)
    var_edge_idx = np.full((n_var, dv_max), n_edges, np.int32)  # pad -> zero msg
    var_mask = np.zeros((n_var, dv_max), bool)
    for vj, es in enumerate(var_edges):
        for s_, eid in enumerate(es):
            var_edge_idx[vj, s_] = eid
            var_mask[vj, s_] = True

    # inverse map: edge -> flat (check, slot) position, for gather-back
    edge_pos = np.zeros(n_edges, np.int32)
    for ci in range(n_chk):
        for s_ in range(dc_max):
            if chk_mask[ci, s_]:
                edge_pos[edge_id[ci, s_]] = ci * dc_max + s_

    # NOTE: return numpy, not jnp — this cache is shared across jit traces,
    # and a jnp constant materialized inside one trace leaks (tracer) into
    # the next trace that hits the cache.
    return (chk_var_idx, chk_mask, edge_id, var_edge_idx, var_mask,
            edge_var, edge_pos, n_edges)


def decode(code: QcLdpcCode, llr: Array, n_iters: int = 25,
           normalization: float = 0.75,
           algorithm: str = "minsum",
           fusion_barrier: bool = False) -> Array:
    """Flooding BP decode: normalized min-sum (default) or exact
    sum-product (``algorithm="sumprod"``, the tanh rule in the stable
    phi-function form — matches MATLAB ``nrLDPCDecode``'s default
    'Belief propagation', ``reference/main_cnc_mcnc_w_ldpc/
    mp_ldpc_model.py:174-175``, to within float32 clamping).

    ``llr [..., N]``: positive = bit 0 (decoder convention; the reference
    negates the demapper's positive=bit-1 LLRs before decoding,
    ``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:168-169``).
    Returns hard info bits ``[..., K]``.

    ``fusion_barrier`` inserts a semantics-neutral
    ``lax.optimization_barrier`` between the two phi passes of the
    sum-product check update. The Mosaic backend SIGSEGVs compiling the
    fully-fused batched sum-product for some (code, batch) shapes
    (observed: BG1 Zc=224 at any batch >= 2); the barrier splits the
    fusion and lets batch-16 bodies compile. Bit-identical output.
    """
    (chk_var_idx, chk_mask, edge_id, var_edge_idx, var_mask, edge_var,
     edge_pos, n_edges) = _decode_tables(code)
    lead = llr.shape[:-1]
    llr = llr.astype(jnp.float32)

    def iteration(c2v, _):
        # variable -> check: total belief minus own message
        c2v_pad = jnp.concatenate(
            [c2v, jnp.zeros((*lead, 1), jnp.float32)], axis=-1)
        per_var = jnp.where(var_mask,
                            c2v_pad[..., var_edge_idx], 0.0)   # [..., n_var, dv]
        var_total = llr + jnp.sum(per_var, axis=-1)            # [..., n_var]
        v2c = var_total[..., edge_var] - c2v                   # [..., n_edges]

        # check update over dense rows: signs + magnitudes
        row = v2c[..., edge_id]                                # [..., n_chk, dc]
        row = jnp.where(chk_mask, row, jnp.inf)
        sign_row = jnp.where(chk_mask, jnp.sign(row), 1.0)
        sign_row = jnp.where(sign_row == 0, 1.0, sign_row)
        prod_sign = jnp.prod(sign_row, axis=-1, keepdims=True)
        mag = jnp.abs(row)
        if algorithm == "sumprod":
            # phi(x) = -log(tanh(x/2)) is self-inverse; the extrinsic
            # magnitude is phi(sum_others phi(|v2c|)). Clamps keep float32
            # away from phi's poles at 0 and inf.
            m = jnp.clip(mag, 1e-6, 30.0)
            phi = -jnp.log(jnp.tanh(m / 2.0))
            phi = jnp.where(chk_mask, phi, 0.0)
            if fusion_barrier:
                phi = jax.lax.optimization_barrier(phi)
            excl = jnp.sum(phi, axis=-1, keepdims=True) - phi
            excl = jnp.clip(excl, 1e-6, 30.0)
            out_mag = -jnp.log(jnp.tanh(excl / 2.0))
            new_row = prod_sign * sign_row * out_mag
        else:
            min1 = jnp.min(mag, axis=-1, keepdims=True)
            arg1 = jnp.argmin(mag, axis=-1)
            mag2 = jnp.where(
                jax.nn.one_hot(arg1, mag.shape[-1], dtype=bool), jnp.inf, mag)
            min2 = jnp.min(mag2, axis=-1, keepdims=True)
            use_min = jnp.where(
                jax.nn.one_hot(arg1, mag.shape[-1], dtype=bool), min2, min1)
            new_row = normalization * prod_sign * sign_row * use_min
        new_row = jnp.where(chk_mask, new_row, 0.0)
        # gather rows back into the flat edge vector via the inverse map
        c2v_new = new_row.reshape(*lead, -1)[..., edge_pos]
        return c2v_new, None

    c2v0 = jnp.zeros((*lead, n_edges), jnp.float32)
    c2v, _ = jax.lax.scan(iteration, c2v0, None, length=n_iters)

    c2v_pad = jnp.concatenate([c2v, jnp.zeros((*lead, 1), jnp.float32)], axis=-1)
    per_var = jnp.where(var_mask, c2v_pad[..., var_edge_idx], 0.0)
    posterior = llr + jnp.sum(per_var, axis=-1)
    hard = (posterior < 0).astype(jnp.int8)                     # llr>0 -> bit 0
    return hard[..., : code.k]


def syndrome_ok(code: QcLdpcCode, codeword: Array) -> Array:
    """True when ``H c^T = 0`` (all checks satisfied)."""
    z, m_b, n_b = code.z, code.m_b, code.n_b
    base = code.base
    c = codeword.reshape(*codeword.shape[:-1], n_b, z).astype(jnp.int32)
    bad = jnp.zeros(codeword.shape[:-1], jnp.int32)
    for i in range(m_b):
        acc = jnp.zeros((*codeword.shape[:-1], z), jnp.int32)
        for j in range(n_b):
            sh = base[i][j]
            if sh >= 0:
                acc = acc ^ jnp.roll(c[..., j, :], -sh, axis=-1)
        bad = bad + jnp.sum(acc, axis=-1)
    return bad == 0
