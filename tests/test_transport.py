"""Transport chain tests: CRC, segmentation, rate matching
(the native equivalent of the reference's MATLAB DL-SCH chain,
``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:149-179``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.ops import ldpc, transport
from mimo_ofdm_tpu.ops.transport import (CRC16, CRC24A, CRC24B, crc_attach,
                                         crc_ok, crc_remainder,
                                         make_transport_chain,
                                         transport_decode, transport_encode)


def _crc_bitwise(bits, length, poly):
    """Straightforward LFSR long-division reference."""
    g = (1 << length) | poly
    reg = 0
    for b in list(bits) + [0] * length:
        reg = (reg << 1) | int(b)
        if reg >> length:
            reg ^= g
    return np.array([(reg >> (length - 1 - i)) & 1 for i in range(length)])


@pytest.mark.parametrize("kind", [CRC24A, CRC24B, CRC16])
def test_crc_matches_bitwise_long_division(kind):
    length, poly = kind
    rng = np.random.default_rng(0)
    for n in (1, 24, 100):
        bits = rng.integers(0, 2, n).astype(np.int8)
        got = np.asarray(crc_remainder(jnp.asarray(bits), length, poly))
        np.testing.assert_array_equal(got, _crc_bitwise(bits, length, poly))


def test_crc_attach_check_and_error_detection():
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, (8, 120)).astype(np.int8))
    word = crc_attach(bits, CRC24A)
    assert word.shape == (8, 144)
    assert bool(jnp.all(crc_ok(word, CRC24A)))
    # flip one bit anywhere -> CRC must fail
    flipped = word.at[:, 7].set(1 - word[:, 7])
    assert not bool(jnp.any(crc_ok(flipped, CRC24A)))


def _small_code():
    return ldpc.make_default_code(k_b=8, m_b=8, z=24)  # K=192, N=384


def test_transport_roundtrip_noiseless_single_block():
    code = _small_code()
    chain = make_transport_chain(code, e_total=256, a=100)
    assert chain.c == 1 and not chain.cb_crc
    rng = np.random.default_rng(2)
    payload = jnp.asarray(rng.integers(0, 2, (4, chain.a)).astype(np.int8))
    tx = transport_encode(chain, payload)
    assert tx.shape == (4, 256)
    llr = (1.0 - 2.0 * tx.astype(jnp.float32)) * 8.0   # positive = bit 0
    rx, ok = transport_decode(chain, llr)
    np.testing.assert_array_equal(np.asarray(rx), np.asarray(payload))
    assert bool(jnp.all(ok))


def test_transport_roundtrip_segmented_with_cb_crc():
    code = _small_code()   # K=192 -> C>1 once payload > 168
    chain = make_transport_chain(code, e_total=1024, target_rate=0.5)
    assert chain.c > 1 and chain.cb_crc
    assert chain.c * chain.e_cb == chain.e_total
    rng = np.random.default_rng(3)
    payload = jnp.asarray(rng.integers(0, 2, (chain.a,)).astype(np.int8))
    tx = transport_encode(chain, payload)
    rx, ok = transport_decode(chain, (1.0 - 2.0 * tx.astype(jnp.float32)) * 8)
    np.testing.assert_array_equal(np.asarray(rx), np.asarray(payload))
    assert bool(ok)


def test_transport_decodes_under_noise_and_flags_failures():
    """BPSK over AWGN at moderate SNR: most blocks decode (CRC ok), and at
    very low SNR the CRC flags failures instead of passing garbage."""
    code = _small_code()
    chain = make_transport_chain(code, e_total=512, a=100)
    rng = np.random.default_rng(4)
    payload = jnp.asarray(rng.integers(0, 2, (16, chain.a)).astype(np.int8))
    tx = transport_encode(chain, payload)
    x = 1.0 - 2.0 * np.asarray(tx, np.float32)

    # high SNR (5 dB, rate ~0.2 coded): all decode
    sigma = 10 ** (-5 / 20)
    y = x + sigma * rng.normal(size=x.shape)
    rx, ok = transport_decode(chain, jnp.asarray(2 * y / sigma ** 2))
    assert bool(jnp.all(ok))
    np.testing.assert_array_equal(np.asarray(rx), np.asarray(payload))

    # hopeless SNR: CRC must catch essentially everything that fails
    y = x + 4.0 * rng.normal(size=x.shape)
    rx, ok = transport_decode(chain, jnp.asarray(2 * y / 16.0))
    ok = np.asarray(ok)
    errs = (np.asarray(rx) != np.asarray(payload)).any(axis=-1)
    # no undetected error: every erroneous block has CRC failed
    assert not np.any(errs & ok)
    assert errs.any()   # the channel was indeed hopeless for some blocks


def test_rate_matching_rv_offsets_and_repetition():
    code = _small_code()
    # repetition case: e_total > n - fillers
    chain0 = make_transport_chain(code, e_total=512, a=100, rv=0)
    sel0, filler = transport._rm_tables(chain0)
    assert int(filler.sum()) == chain0.n_filler
    # selection never hits a filler position
    assert not np.any(filler[sel0])
    # 512 > usable=384-filler -> wraps: first usable index reappears
    usable = code.n - chain0.n_filler
    assert chain0.e_cb > usable
    np.testing.assert_array_equal(np.asarray(sel0[usable:]),
                                  np.asarray(sel0[: chain0.e_cb - usable]))
    # rv2 starts half-way around the buffer, z-aligned
    chain2 = make_transport_chain(code, e_total=512, a=100, rv=2)
    sel2, _ = transport._rm_tables(chain2)
    start = int(np.asarray(sel2[0]))
    assert start >= code.n // 2 and start % code.z == 0
    # different rv -> different puncturing pattern, same decodability
    rng = np.random.default_rng(5)
    payload = jnp.asarray(rng.integers(0, 2, (chain2.a,)).astype(np.int8))
    tx2 = transport_encode(chain2, payload)
    rx2, ok2 = transport_decode(chain2,
                                (1.0 - 2.0 * tx2.astype(jnp.float32)) * 8)
    np.testing.assert_array_equal(np.asarray(rx2), np.asarray(payload))
    assert bool(ok2)


def test_transport_chain_sizing_errors():
    code = _small_code()
    with pytest.raises(ValueError):
        make_transport_chain(code, e_total=512)          # neither a nor rate
    with pytest.raises(ValueError):
        # a too large to ever fit: > C_max * (K-24) for any C dividing e_total
        make_transport_chain(code, e_total=10, a=5000)


@pytest.mark.parametrize("chunk", [1, 4])
def test_serial_decode_round_matches_vmapped(chunk):
    """The serial/chunked LDPC decode path (the Mosaic SIGSEGV workaround
    for the batched sum-product decoder, ``models/link_ldpc.
    make_transport_round_fn(serial_decode=...)`` + ``transport_decode(
    serial_blocks=...)``) must reproduce the fully-vmapped round's
    counters bit-exactly — only the device schedule changes."""
    from mimo_ofdm_tpu.models.link_ldpc import (make_transport_round_fn,
                                                transport_chain_for_modem)
    from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig,
                                            LinkConfig, ModemConfig,
                                            PaConfig, RxConfig)
    modem = ModemConfig(constel_size=16, n_fft=256, n_sub_carr=128, cp_len=16)
    cfg = LinkConfig(modem=modem, array=ArrayConfig(n_elements=4),
                     channel=ChannelConfig(model="rayleigh"),
                     precoding="mrt", pa=PaConfig(model="softlim", ibo_db=0.0),
                     rx=RxConfig(algorithm="cnc"))
    # family="ira" with n_blocks=2 segments into C=2 code blocks, covering
    # the flattened (frame, tap, block) item axis and the pad path
    chain = transport_chain_for_modem(cfg, code_rate=0.5, n_blocks=2,
                                      family="ira")
    assert chain.c == 2
    key = jax.random.key(7)
    ref = make_transport_round_fn(cfg, 2, 4, chain, ldpc_iters=6,
                                  ldpc_algorithm="sumprod")(key, 8.0)
    got = make_transport_round_fn(cfg, 2, 4, chain, ldpc_iters=6,
                                  ldpc_algorithm="sumprod",
                                  serial_decode=chunk)(key, 8.0)
    for f in ("clean_err", "clean_blk", "dist_err", "dist_blk"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, f)),
                                      np.asarray(getattr(got, f)))


def test_decode_fusion_barrier_bit_identical():
    """``ldpc.decode(..., fusion_barrier=True)`` only splits XLA fusion;
    hard outputs must be identical for both algorithms."""
    code = _small_code()
    rng = np.random.default_rng(3)
    llr = jnp.asarray(rng.normal(size=(4, code.n)).astype(np.float32)) * 2.0
    for alg in ("sumprod", "minsum"):
        a = ldpc.decode(code, llr, n_iters=8, algorithm=alg)
        b = ldpc.decode(code, llr, n_iters=8, algorithm=alg,
                        fusion_barrier=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
