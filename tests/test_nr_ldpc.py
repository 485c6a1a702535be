"""5G-NR LDPC (ops/nr_ldpc): encode validity across BG/Zc classes,
lifting selection, rate-matching offsets, and the coded waterfall."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.ops import ldpc, nr_ldpc, transport as tp


def np_syndrome_ok(code: ldpc.QcLdpcCode, cw: np.ndarray) -> bool:
    z, m_b, n_b = code.z, code.m_b, code.n_b
    base = np.asarray(code.base)
    c = cw.reshape(n_b, z)
    for i in range(m_b):
        acc = np.zeros(z, np.int64)
        for j in range(n_b):
            if base[i, j] >= 0:
                acc ^= np.roll(c[j], -base[i, j])
        if acc.any():
            return False
    return True


def np_encode(code: ldpc.QcLdpcCode, info: np.ndarray) -> np.ndarray:
    """Independent numpy encode: solve ALL parity bits by Gaussian
    elimination on the full H parity part — no shared code with
    nr_ldpc.encode beyond the base matrix itself."""
    z, m_b, n_b, k_b = code.z, code.m_b, code.n_b, code.k_b
    base = np.asarray(code.base)
    h = np.zeros((m_b * z, n_b * z), np.int8)
    eye = np.eye(z, dtype=np.int8)
    for i in range(m_b):
        for j in range(n_b):
            if base[i, j] >= 0:
                h[i * z:(i + 1) * z, j * z:(j + 1) * z] = np.roll(
                    eye, base[i, j], axis=1)
    syn = h[:, : k_b * z] @ info % 2
    hp = h[:, k_b * z:]
    # GF(2) solve hp @ p = syn
    aug = np.concatenate([hp, syn[:, None]], axis=1).astype(np.int8)
    n = m_b * z
    for col in range(n):
        piv = col + int(np.argmax(aug[col:, col]))
        assert aug[piv, col], "singular parity part"
        if piv != col:
            aug[[col, piv]] = aug[[piv, col]]
        mask = aug[:, col].copy()
        mask[col] = 0
        aug ^= np.outer(mask, aug[col])
    return np.concatenate([info, aug[:, -1]])


@pytest.mark.parametrize("bg", [1, 2])
def test_encode_hct_zero_all_lifting_sets(bg):
    rng = np.random.default_rng(0)
    for i_ls, zs in enumerate(nr_ldpc.LIFTING_SETS):
        for zc in (zs[0], zs[-1]):          # smallest + largest per set
            code = nr_ldpc.make_nr_code(bg, zc, i_ls)
            info = rng.integers(0, 2, code.k).astype(np.int8)
            cw = nr_ldpc.encode_np(code, info)
            assert np_syndrome_ok(code, cw), (bg, i_ls, zc)


def test_encode_matches_independent_gf2_solve():
    rng = np.random.default_rng(1)
    code = nr_ldpc.make_nr_code(2, 10)
    info = rng.integers(0, 2, code.k).astype(np.int8)
    got = np.asarray(jax.jit(lambda i: nr_ldpc.encode(code, i))(
        jnp.asarray(info)))
    want = np_encode(code, info)
    # parity solutions are unique when the parity part is invertible
    np.testing.assert_array_equal(got, want)
    # and the numpy twin agrees with the jitted device encoder
    np.testing.assert_array_equal(nr_ldpc.encode_np(code, info), want)


def test_dimensions_and_rate():
    c1 = nr_ldpc.make_nr_code(1, 32)
    assert (c1.m_b, c1.n_b, c1.k_b) == (46, 68, 22)
    assert c1.k == 22 * 32 and c1.n == 68 * 32
    c2 = nr_ldpc.make_nr_code(2, 32)
    assert (c2.m_b, c2.n_b, c2.k_b) == (42, 52, 10)


def test_select_lifting():
    # BG1: Kb=22; K'=6168 -> Zc=288 (22*280.4); 22*288=6336 >= 6168
    kb, i_ls, zc = nr_ldpc.select_lifting(1, 6168, 6168)
    assert kb == 22 and zc == 288
    assert 22 * zc >= 6168
    # next smaller lifting in any set (280 not available; 256 too small)
    assert 22 * 256 < 6168
    # BG2 payload-dependent Kb
    assert nr_ldpc.select_lifting(2, 100, 100)[0] == 6
    assert nr_ldpc.select_lifting(2, 300, 300)[0] == 8
    assert nr_ldpc.select_lifting(2, 600, 600)[0] == 9
    assert nr_ldpc.select_lifting(2, 700, 700)[0] == 10


def test_rv_k0_table():
    zc, n_cb = 288, 66 * 288
    assert nr_ldpc.rv_k0(1, 0, n_cb, zc) == 0
    assert nr_ldpc.rv_k0(1, 1, n_cb, zc) == (17 * n_cb // (66 * zc)) * zc
    assert nr_ldpc.rv_k0(1, 3, n_cb, zc) == (56 * n_cb // (66 * zc)) * zc
    zc2, n_cb2 = 52, 50 * 52
    assert nr_ldpc.rv_k0(2, 2, n_cb2, zc2) == (25 * n_cb2 // (50 * zc2)) * zc2


def test_nr_transport_chain_sizing():
    # canonical frame: 2048 SC x 6 bits = 12288 coded bits at rate ~1/2
    chain = tp.make_nr_transport_chain(12288, bg=1, target_rate=0.5)
    code = chain.code
    assert code.kind == "nr_bg1"
    assert chain.c == 1 and chain.e_total == 12288
    assert 22 * code.z >= chain.k_prime
    assert chain.n_filler == code.k - chain.k_prime
    # punctured systematic bits (first 2 Zc) never selected
    sel, _ = tp._rm_tables(chain)
    assert sel.min() >= 2 * code.z
    assert len(np.unique(sel)) == len(sel)  # Ncb > E: no repetition at rv0


def test_nr_transport_roundtrip_noiseless():
    chain = tp.make_nr_transport_chain(12288, bg=1, target_rate=0.5)
    rng = np.random.default_rng(3)
    pay = jnp.asarray(rng.integers(0, 2, chain.a), jnp.int8)
    enc = jax.jit(lambda p: tp.transport_encode(chain, p))
    coded = enc(pay)
    assert coded.shape == (12288,)
    llr = jnp.where(coded == 0, 8.0, -8.0)   # positive = bit 0
    dec = jax.jit(lambda l: tp.transport_decode(chain, l, n_iters=10))
    got, ok = dec(llr)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(pay))


def test_nr_transport_rv2_roundtrip():
    """rv2 starts mid-buffer (k0 = 25 Ncb / 50 for BG2); standalone rv2 is
    only self-decodable when E covers most of the circular buffer (in NR
    proper, low-E rv2 exists for HARQ combining), so use a low rate."""
    chain = tp.make_nr_transport_chain(6144, bg=2, target_rate=0.2, rv=2)
    code = chain.code
    sel, _ = tp._rm_tables(chain)
    k0 = nr_ldpc.rv_k0(2, 2, code.n - 2 * code.z, code.z)
    assert sel[0] == 2 * code.z + k0           # selection starts at k0
    rng = np.random.default_rng(4)
    pay = jnp.asarray(rng.integers(0, 2, chain.a), jnp.int8)
    coded = jax.jit(lambda p: tp.transport_encode(chain, p))(pay)
    llr = jnp.where(coded == 0, 8.0, -8.0)
    got, ok = jax.jit(lambda l: tp.transport_decode(chain, l, n_iters=30))(llr)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(pay))


def test_nr_waterfall_bg1():
    """Coded BER over a BPSK-style binary-input AWGN proxy must show a
    waterfall: near-half errors at very low SNR, zero errors at moderate
    SNR (textbook operating point for rate ~1/2 LDPC: ~2-4 dB Eb/N0)."""
    chain = tp.make_nr_transport_chain(12288, bg=1, target_rate=0.5)
    rng = np.random.default_rng(5)
    pay = rng.integers(0, 2, (4, chain.a)).astype(np.int8)
    coded = np.asarray(jax.jit(
        lambda p: tp.transport_encode(chain, p))(jnp.asarray(pay)))
    tx = 1.0 - 2.0 * coded                   # bit0 -> +1

    def run(ebn0_db):
        rate = chain.a / chain.e_total
        snr = 10 ** (ebn0_db / 10.0) * 2 * rate     # Es/N0 per BPSK dim
        sigma = np.sqrt(1.0 / snr)
        y = tx + sigma * rng.standard_normal(tx.shape)
        llr = 2.0 * y / sigma ** 2                   # positive = bit 0
        got, ok = jax.jit(lambda l: tp.transport_decode(chain, l, n_iters=30))(
            jnp.asarray(llr, jnp.float32))
        return int(np.sum(np.asarray(got) != pay)), np.asarray(ok)

    err_hi, ok_hi = run(4.0)
    assert err_hi == 0 and ok_hi.all(), f"no waterfall: {err_hi} errs at 4 dB"
    err_lo, _ = run(-2.0)
    assert err_lo > 0.2 * pay.size, "decoder suspiciously good at -2 dB"


def test_surrogate_draws_independent_but_structural():
    """set_surrogate_draw produces a different base-graph realization with
    identical structure (dims, parity core, row-degree profile), and
    restoring draw 0 restores the default tables exactly."""
    import numpy as np
    from mimo_ofdm_tpu.ops import nr_ldpc
    base0 = np.array(nr_ldpc._base_graph_cached(2, 0))
    try:
        nr_ldpc.set_surrogate_draw(1)
        base1 = np.array(nr_ldpc._base_graph_cached(2, 0))
    finally:
        nr_ldpc.set_surrogate_draw(0)
    back = np.array(nr_ldpc._base_graph_cached(2, 0))
    np.testing.assert_array_equal(base0, back)
    assert not np.array_equal(base0, base1)
    m_b, n_b, k_b = nr_ldpc.BG_DIMS[2]
    for b in (base0, base1):
        assert b.shape == (m_b, n_b)
        # same parity core in every draw
        assert b[0, k_b] == 1 and b[1, k_b] == 0 and b[3, k_b] == 1
        # identity extension columns
        assert np.all(np.diag(b[4:, k_b + 4:]) == 0)
    # same number of non-null blocks per draw in the core rows (degree
    # profile preserved)
    assert ((base0[:4] >= 0).sum(1) == (base1[:4] >= 0).sum(1)).all()
    # both draws encode + decode round-trip
    for d in (0, 1):
        try:
            nr_ldpc.set_surrogate_draw(d)
            code = nr_ldpc.make_nr_code(2, 16)
            rng = np.random.default_rng(3)
            info = rng.integers(0, 2, code.k).astype(np.int8)
            cw = nr_ldpc.encode_np(code, info)
            assert np_syndrome_ok(code, cw), d
        finally:
            nr_ldpc.set_surrogate_draw(0)


def test_true_table_hook_end_to_end():
    """`set_base_graph_tables` is the promised drop-in for the real TS
    38.212 Table 5.3.2-2/-3 data (unavailable in this environment): a
    synthetic full-size BG1 shift table — a *different surrogate draw*,
    structurally valid like the true tables — installed through the hook
    must (a) actually override the default protograph, and (b) run the
    complete transport chain encode -> rate-match -> decode round trip."""
    import jax
    import numpy as np
    from mimo_ofdm_tpu.ops import ldpc as ldpc_ops
    from mimo_ofdm_tpu.ops import nr_ldpc, transport as tp

    e_total = 768
    chain0 = tp.make_nr_transport_chain(e_total, bg=1, target_rate=0.5)
    zc = chain0.code.z
    i_ls = next(i for i, s in enumerate(nr_ldpc.LIFTING_SETS) if zc in s)

    # synthetic "true" table = surrogate draw 5's base graph (valid
    # double-diagonal parity core + identity extension like the standard)
    nr_ldpc.set_surrogate_draw(5)
    try:
        synthetic = np.array(nr_ldpc._base_graph_cached(1, i_ls))
    finally:
        nr_ldpc.set_surrogate_draw(0)
    assert synthetic.shape == (46, 68)

    base_cw = None
    try:
        payload = np.asarray(
            jax.random.bernoulli(jax.random.key(3), 0.5,
                                 (chain0.a,)), np.int8)
        base_cw = np.asarray(tp.transport_encode(chain0, payload))

        nr_ldpc.set_base_graph_tables(1, i_ls, synthetic)
        chain1 = tp.make_nr_transport_chain(e_total, bg=1, target_rate=0.5)
        cw = np.asarray(tp.transport_encode(chain1, payload))
        # (a) the installed table is used: parity differs from the default
        assert not np.array_equal(cw, base_cw)

        # (b) full chain round trip with the installed table: noiseless
        # LLRs decode to the payload with a passing TB CRC
        llr = (1.0 - 2.0 * cw.astype(np.float32)) * 8.0  # decoder sign: +=0
        hat, ok = tp.transport_decode(chain1, llr, n_iters=20,
                                      algorithm="sumprod")
        assert bool(np.asarray(ok))
        np.testing.assert_array_equal(np.asarray(hat), payload)

        # shape validation guard
        try:
            nr_ldpc.set_base_graph_tables(1, i_ls, synthetic[:, :10])
            raise AssertionError("bad shape accepted")
        except ValueError:
            pass
    finally:
        nr_ldpc._user_tables.pop((1, i_ls), None)
        nr_ldpc._base_graph_cached.cache_clear()

    # the override is cleanly removed: default protograph restored
    chain2 = tp.make_nr_transport_chain(e_total, bg=1, target_rate=0.5)
    payload2 = np.asarray(
        jax.random.bernoulli(jax.random.key(3), 0.5, (chain2.a,)), np.int8)
    assert np.array_equal(np.asarray(tp.transport_encode(chain2, payload2)),
                          base_cw)
