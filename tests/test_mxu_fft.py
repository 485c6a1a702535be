"""MXU-matmul 4-step FFT (ops/mxu_fft) correctness and link equivalence.

The fused IFFT->PA->FFT chain must be numerically interchangeable with the
stock ``jnp.fft`` path it replaces (``reference/antenna_array.py:110-140``,
``reference/corrector.py:93-98`` transforms).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.ops import mxu_fft, ofdm, pa
from mimo_ofdm_tpu.models import transmit
from mimo_ofdm_tpu.models.link import make_frame_fn, link_static
from mimo_ofdm_tpu.utils.config import (LinkConfig, ModemConfig, ArrayConfig,
                                        ChannelConfig)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 3, 4096)) + 1j * rng.standard_normal((4, 3, 4096))
    return jnp.asarray(x.astype(np.complex64))


def test_square_radix():
    assert mxu_fft.square_radix(4096) == 64
    assert mxu_fft.square_radix(64) == 8
    assert mxu_fft.square_radix(1024) == 32
    assert mxu_fft.square_radix(2048) is None   # not a square
    assert mxu_fft.square_radix(16) is None     # radix 4 < 8: no MXU tiling


def test_fft_ifft_match_jnp(frames):
    got_f = jax.jit(mxu_fft.fft_mxu)(frames)
    ref_f = jnp.fft.fft(frames, axis=-1, norm="ortho")
    assert float(jnp.linalg.norm(got_f - ref_f) / jnp.linalg.norm(ref_f)) < 1e-5

    got_i = jax.jit(mxu_fft.ifft_mxu)(frames)
    ref_i = jnp.fft.ifft(frames, axis=-1, norm="ortho")
    assert float(jnp.linalg.norm(got_i - ref_i) / jnp.linalg.norm(ref_i)) < 1e-5


def test_digit_swap_roundtrip_is_identity(frames):
    out = jax.jit(lambda x: mxu_fft.fused_ifft_pa_fft(x, lambda p: p))(frames)
    assert float(jnp.linalg.norm(out - frames) / jnp.linalg.norm(frames)) < 1e-5


def test_fused_chain_matches_unfused_softlim(frames):
    sat = 0.31
    ref = jax.jit(lambda x: ofdm.td_to_fd(
        pa.apply_pa(ofdm.fd_to_td(x), "softlim", sat, 1.1, 0.0)))(frames)
    got = jax.jit(lambda x: transmit.ifft_pa_fft(
        x, "softlim", sat, use_mxu_fft=True))(frames)
    assert float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref)) < 1e-5


def test_fused_chain_per_antenna_sat(frames):
    # per-antenna saturation powers must broadcast over the split sample axes
    sat = jnp.asarray([0.2, 0.5, 1.3])
    ref = jax.jit(lambda x: ofdm.td_to_fd(
        transmit.pa_transfer(ofdm.fd_to_td(x), "softlim", sat)))(frames)
    got = jax.jit(lambda x: transmit.ifft_pa_fft(
        x, "softlim", sat, use_mxu_fft=True))(frames)
    assert float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref)) < 1e-5


def test_non_square_nfft_falls_back(frames):
    x = frames[..., :2048]
    ref = ofdm.td_to_fd(pa.apply_pa(ofdm.fd_to_td(x), "softlim", 0.4, 1.1, 0.0))
    got = transmit.ifft_pa_fft(x, "softlim", 0.4, use_mxu_fft=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("algo", ["cnc", "mcnc"])
def test_link_counters_match_jnp_fft_path(algo):
    """Full frame (TX + receiver replica) with the MXU path must produce
    the same error counters as the jnp.fft path on identical keys."""
    import dataclasses
    cfg = LinkConfig(
        modem=ModemConfig(constel_size=16, n_fft=1024, n_sub_carr=512),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="rayleigh"),
        # pin the complex64 channel block: this test compares the two FFT
        # paths, not the planar channel storage (tests/test_link_planar.py)
        channel_storage="complex64",
    )
    cfg = cfg.replace(rx=dataclasses.replace(cfg.rx, algorithm=algo))
    tx_pos = link_static(cfg)[0]
    key = jax.random.key(3)
    snr = jnp.float32(12.0)
    out = {}
    for flag in (False, True):
        f = make_frame_fn(cfg.replace(use_mxu_fft=flag,
                                      mxu_fft_storage="float32"), n_iters=3)
        out[flag] = jax.jit(f)(key, snr, tx_pos)
    np.testing.assert_array_equal(np.asarray(out[False].clean_err),
                                  np.asarray(out[True].clean_err))
    # hard-decision bits: float32 round-off may flip a decision only for
    # samples exactly on a decision boundary — none at these SNRs
    np.testing.assert_array_equal(np.asarray(out[False].dist_err),
                                  np.asarray(out[True].dist_err))


def test_link_counters_bf16_storage_within_mc_noise():
    """bfloat16 inter-stage storage (-40 dB quantization) must leave the
    per-frame error counters statistically indistinguishable: over a batch
    of frames the total error counts agree within a small relative
    tolerance (quantization is ~20 dB below thermal noise here)."""
    import dataclasses
    cfg = LinkConfig(
        modem=ModemConfig(constel_size=16, n_fft=1024, n_sub_carr=512),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="rayleigh"),
    )
    keys = jax.random.split(jax.random.key(9), 64)
    tx_pos = link_static(cfg)[0]
    snr = jnp.float32(10.0)
    totals = {}
    for storage in ("float32", "bfloat16"):
        f = jax.jit(jax.vmap(
            make_frame_fn(cfg.replace(use_mxu_fft=True,
                                      mxu_fft_storage=storage), n_iters=2),
            in_axes=(0, None, None)))
        c = f(keys, snr, tx_pos)
        totals[storage] = np.asarray(c.dist_err).sum(axis=0)
    a, b = totals["float32"].astype(float), totals["bfloat16"].astype(float)
    assert np.all(np.abs(a - b) <= 0.05 * np.maximum(a, 100)), (a, b)


def _sc_chain_ref(data_sc, n_fft, pa_model="softlim", sat=0.31):
    fd = ofdm.map_subcarriers(data_sc, n_fft)
    fd_dist = ofdm.td_to_fd(pa.apply_pa(ofdm.fd_to_td(fd), pa_model, sat,
                                        1.1, 0.0))
    return ofdm.extract_subcarriers(fd_dist, data_sc.shape[-1])


@pytest.mark.parametrize("n_fft,n_sc", [(4096, 2048), (1024, 512), (1024, 256),
                                        (2048, 1024), (2048, 512)])
def test_sc_pruned_chain_matches_full_band(n_fft, n_sc):
    """Guard-band-pruned fused chain == map -> full chain -> extract
    (the pruned rows/columns only ever multiply zeros), including the
    straggler bin n_sc/2 displaced across the row boundary by the unused
    DC bin. Square n_fft uses the [R, R] split; non-square n_fft (2048)
    exercises the rectangular [n2, 128] split."""
    assert mxu_fft.sc_prune_eligible(n_fft, n_sc)
    rng = np.random.default_rng(11)
    d = rng.standard_normal((2, 3, n_sc)) + 1j * rng.standard_normal((2, 3, n_sc))
    d = jnp.asarray(d.astype(np.complex64))
    ref = jax.jit(lambda x: _sc_chain_ref(x, n_fft))(d)
    got = jax.jit(lambda x: transmit.ifft_pa_fft_sc(
        x, n_fft, "softlim", 0.31, use_mxu_fft=True,
        mxu_storage="float32"))(d)
    assert float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref)) < 1e-5


def test_sc_pruned_chain_straggler_only():
    """A frame with energy ONLY in the straggler bin (last positive data
    subcarrier = FFT bin n_sc/2) must round-trip exactly through both the
    rank-1 input correction and the output straggler dot."""
    n_fft, n_sc = 1024, 512
    d = jnp.zeros((n_sc,), jnp.complex64).at[-1].set(2.0 - 1.0j)
    ref = jax.jit(lambda x: _sc_chain_ref(x, n_fft, "none"))(d)
    got = jax.jit(lambda x: transmit.ifft_pa_fft_sc(
        x, n_fft, "none", 1.0, use_mxu_fft=True, mxu_storage="float32"))(d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # identity PA: output == input
    np.testing.assert_allclose(np.asarray(got), np.asarray(d), atol=1e-5)


def test_sc_pruned_ineligible_falls_back():
    # n_sc/2 not a multiple of R -> full-band fallback, same result
    n_fft, n_sc = 1024, 300
    assert not mxu_fft.sc_prune_eligible(n_fft, n_sc)
    rng = np.random.default_rng(5)
    d = jnp.asarray((rng.standard_normal((2, n_sc))
                     + 1j * rng.standard_normal((2, n_sc))).astype(np.complex64))
    ref = _sc_chain_ref(d, n_fft)
    got = transmit.ifft_pa_fft_sc(d, n_fft, "softlim", 0.31,
                                  use_mxu_fft=True, mxu_storage="float32")
    assert float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref)) < 1e-5


def test_sc_pruned_per_antenna_sat_and_toi():
    n_fft, n_sc = 1024, 512
    rng = np.random.default_rng(13)
    d = jnp.asarray((rng.standard_normal((4, 3, n_sc))
                     + 1j * rng.standard_normal((4, 3, n_sc))).astype(np.complex64))
    sat = jnp.asarray([0.2, 0.5, 1.3])
    ref = jax.jit(lambda x: ofdm.extract_subcarriers(ofdm.td_to_fd(
        transmit.pa_transfer(ofdm.fd_to_td(ofdm.map_subcarriers(x, n_fft)),
                             "softlim", sat)), n_sc))(d)
    got = jax.jit(lambda x: transmit.ifft_pa_fft_sc(
        x, n_fft, "softlim", sat, use_mxu_fft=True,
        mxu_storage="float32"))(d)
    assert float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref)) < 1e-5
    # TOI: cubic coefficient must reach the pruned chain
    coeff = 0.05
    ref_t = jax.jit(lambda x: ofdm.extract_subcarriers(ofdm.td_to_fd(
        pa.apply_pa(ofdm.fd_to_td(ofdm.map_subcarriers(x, n_fft)),
                    "toi", 1.0, 1.1, coeff)), n_sc))(d)
    got_t = jax.jit(lambda x: transmit.ifft_pa_fft_sc(
        x, n_fft, "toi", 1.0, toi_coeff=coeff, use_mxu_fft=True,
        mxu_storage="float32"))(d)
    assert float(jnp.linalg.norm(got_t - ref_t) / jnp.linalg.norm(ref_t)) < 1e-5
