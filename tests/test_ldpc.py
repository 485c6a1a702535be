"""Native QC-LDPC codec and coded-link tests (replacement for the MATLAB
5G-NR chain, ``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.ops import ldpc
from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig, LinkConfig,
                                        ModemConfig, PaConfig, RxConfig)
from mimo_ofdm_tpu.models.link_ldpc import code_for_modem, make_coded_round_fn
from mimo_ofdm_tpu.ops.metrics import ebn0_to_snr


@pytest.fixture(scope="module")
def code():
    return ldpc.make_default_code(k_b=12, m_b=12, z=32)


def test_encode_produces_valid_codewords(code):
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (16, code.k)).astype(np.int8)
    cw = ldpc.encode(code, jnp.asarray(info))
    assert cw.shape == (16, code.n)
    assert np.all(np.asarray(ldpc.syndrome_ok(code, cw)))
    # systematic: first K bits are the info bits
    np.testing.assert_array_equal(np.asarray(cw)[:, : code.k], info)


def test_encode_linear(code):
    """GF(2) linearity: enc(a XOR b) == enc(a) XOR enc(b)."""
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2, code.k).astype(np.int8)
    b = rng.integers(0, 2, code.k).astype(np.int8)
    ea = np.asarray(ldpc.encode(code, jnp.asarray(a)))
    eb = np.asarray(ldpc.encode(code, jnp.asarray(b)))
    eab = np.asarray(ldpc.encode(code, jnp.asarray(a ^ b)))
    np.testing.assert_array_equal(eab, ea ^ eb)


def test_decode_corrects_awgn_errors(code):
    """Coding gain over BPSK/AWGN: min-sum must correct all errors at an
    SNR where the uncoded stream has many."""
    rng = np.random.default_rng(2)
    info = rng.integers(0, 2, (8, code.k)).astype(np.int8)
    cw = np.asarray(ldpc.encode(code, jnp.asarray(info)))
    snr_db = 3.0
    sigma = np.sqrt(1 / (2 * 10 ** (snr_db / 10)))
    y = (1 - 2 * cw.astype(np.float64)) + rng.normal(size=cw.shape) * sigma
    llr = 2 * y / sigma ** 2
    hard = np.asarray(ldpc.decode(code, jnp.asarray(llr), n_iters=25))
    uncoded_errs = int(np.sum((y[:, : code.k] < 0) != info))
    assert uncoded_errs > 20
    assert np.array_equal(hard, info)


def test_decode_noiseless_identity(code):
    rng = np.random.default_rng(3)
    info = rng.integers(0, 2, code.k).astype(np.int8)
    cw = np.asarray(ldpc.encode(code, jnp.asarray(info)))
    llr = (1.0 - 2.0 * cw) * 20.0
    hard = np.asarray(ldpc.decode(code, jnp.asarray(llr), n_iters=5))
    np.testing.assert_array_equal(hard, info)


def test_coded_link_clean_and_cnc():
    cfg = LinkConfig(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128, cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="los"),
        precoding="mrt",
        pa=PaConfig(model="softlim", ibo_db=0.0),
        rx=RxConfig(algorithm="cnc"),
    )
    code = code_for_modem(cfg)
    assert code.n == cfg.modem.n_bits_per_ofdm_sym
    rf = make_coded_round_fn(cfg, 3, 8, code, ldpc_iters=20)
    snr = float(ebn0_to_snr(11.0, 256, 128, 64))
    c = rf(jax.random.key(0), snr)
    kbits = 8 * code.k
    assert int(c.clean_err) == 0                     # coded clean decodes
    dist = np.asarray(c.dist_err) / kbits
    assert dist[3] < dist[0]                         # CNC helps coded BER


def test_transport_coded_link_clean_and_cnc():
    """Full transport chain (CRC + segmentation + rate matching) through the
    distorted link with CNC taps (native DL-SCH pipeline,
    reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:149-179)."""
    from mimo_ofdm_tpu.models.link_ldpc import (make_transport_round_fn,
                                                transport_chain_for_modem)
    cfg = LinkConfig(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128, cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="los"),
        precoding="mrt",
        pa=PaConfig(model="softlim", ibo_db=0.0),
        rx=RxConfig(algorithm="cnc"),
    )
    chain = transport_chain_for_modem(cfg, code_rate=0.4, n_blocks=2,
                                      family="ira")
    assert chain.e_total == cfg.modem.n_bits_per_ofdm_sym
    assert chain.c >= 2                                # segmentation active
    rf = make_transport_round_fn(cfg, 3, 8, chain, ldpc_iters=25)
    snr = float(ebn0_to_snr(14.0, 256, 128, 64))
    c = rf(jax.random.key(0), snr)
    assert int(c.clean_err) == 0 and int(c.clean_blk) == 0
    dist = np.asarray(c.dist_err, np.float64) / (8 * chain.a)
    assert dist[3] < dist[0]                           # CNC helps
    # BLER counters consistent: a block with zero bit errors has CRC ok
    blk = np.asarray(c.dist_blk)
    assert np.all(blk[np.asarray(c.dist_err) == 0] == 0)
    assert np.all(blk <= 8)


def test_transport_coded_experiment_runs():
    from mimo_ofdm_tpu.experiments import EXPERIMENTS
    ebn0, ber, bler = EXPERIMENTS["transport_coded_ber"](
        n_ant=8, n_iters=2, ebn0_min=12.0, ebn0_max=12.0, n_err_min=50,
        bits_sent_max=20_000, batch=8, small=True, save_csv=False,
        verbose=False)
    assert ber.shape == (4, 1) and bler.shape == (4, 1)
    assert np.all(ber <= 1.0) and np.all(bler <= 1.0)


def test_transport_coded_link_nr_family():
    """NR (38.212) transport chain through the distorted link with CNC
    taps — the default coded family, mirroring the reference's MATLAB
    DL-SCH (reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:104,149-179)."""
    from mimo_ofdm_tpu.models.link_ldpc import (make_transport_round_fn,
                                                transport_chain_for_modem)
    cfg = LinkConfig(
        modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128, cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="los"),
        precoding="mrt",
        pa=PaConfig(model="softlim", ibo_db=0.0),
        rx=RxConfig(algorithm="cnc"),
    )
    # rate high enough that clipping distortion defeats the code at
    # iteration 0 (at low rates BG2 corrects the IBO-0 distortion outright)
    chain = transport_chain_for_modem(cfg, code_rate=0.75)
    assert chain.code.kind.startswith("nr_bg")
    assert chain.e_total == cfg.modem.n_bits_per_ofdm_sym
    rf = make_transport_round_fn(cfg, 3, 8, chain, ldpc_iters=25)
    snr = float(ebn0_to_snr(13.0, 256, 128, 64))
    c = rf(jax.random.key(0), snr)
    assert int(c.clean_err) == 0 and int(c.clean_blk) == 0
    dist = np.asarray(c.dist_err, np.float64) / (8 * chain.a)
    assert dist[0] > 0                                 # distortion bites
    assert dist[1:].min() < dist[0]                    # CNC helps
    blk = np.asarray(c.dist_blk)
    assert np.all(blk[np.asarray(c.dist_err) == 0] == 0)


def test_sumprod_decode_beats_minsum_in_waterfall():
    """The exact sum-product check rule (MATLAB nrLDPCDecode's default
    'Belief propagation', reference/main_cnc_mcnc_w_ldpc/
    mp_ldpc_model.py:174-175) must decode at least as well as normalized
    min-sum in the waterfall, and both must round-trip noiselessly."""
    from mimo_ofdm_tpu.ops import transport as tp
    chain = tp.make_nr_transport_chain(768, bg=2, a=384, rv=0)
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 2, (256, chain.a)), jnp.int8)
    coded = tp.transport_encode(chain, payload)
    x = 1.0 - 2.0 * np.asarray(coded, np.float32)
    sigma = float(np.sqrt(1.0 / (2 * 10 ** (1.5 / 10))))
    y = x + sigma * rng.standard_normal(x.shape).astype(np.float32)
    llr = jnp.asarray(2 * y / sigma ** 2)
    errs = {}
    for alg in ("minsum", "sumprod"):
        dec, _ = tp.transport_decode(chain, llr, n_iters=12, algorithm=alg)
        errs[alg] = int(jnp.sum(dec != payload))
        # noiseless: exact round-trip
        dec0, ok0 = tp.transport_decode(chain, jnp.asarray(40.0 * x),
                                        n_iters=4, algorithm=alg)
        np.testing.assert_array_equal(np.asarray(dec0), np.asarray(payload))
        assert bool(ok0.all())
    assert errs["sumprod"] <= errs["minsum"]
    assert errs["sumprod"] < 0.5 * 256 * chain.a  # actually decoding
