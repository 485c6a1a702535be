"""Equivalence of the planar bf16 channel-block fast path
(models/link_planar.py) with the complex64 reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig, LinkConfig,
                                        ModemConfig, PaConfig, RxConfig)
from mimo_ofdm_tpu.models.link import link_static, make_frame_fn
from mimo_ofdm_tpu.models import link_planar


def _cfg(chan="rayleigh", pa_model="softlim", alg="cnc"):
    return LinkConfig(
        modem=ModemConfig(constel_size=16, n_fft=1024, n_sub_carr=512,
                          cp_len=64),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model=chan),
        precoding="mrt",
        pa=PaConfig(model=pa_model, ibo_db=0.0),
        rx=RxConfig(algorithm=alg),
        channel_storage="complex64",
    )


def _totals(cfg, n_frames=64, n_iters=2, snr=10.0):
    keys = jax.random.split(jax.random.key(7), n_frames)
    tx_pos = link_static(cfg)[0]
    f = jax.jit(jax.vmap(make_frame_fn(cfg, n_iters=n_iters),
                         in_axes=(0, None, None)))
    c = f(keys, jnp.float32(snr), tx_pos)
    return (np.asarray(c.clean_err).sum(),
            np.asarray(c.dist_err).sum(axis=0).astype(float))


def test_planar_eligibility_gate():
    assert link_planar.planar_eligible(_cfg())
    assert link_planar.planar_eligible(_cfg(chan="los", alg="none"))
    assert link_planar.planar_eligible(_cfg(alg="mcnc"))
    assert link_planar.planar_eligible(_cfg(chan="two_path"))
    assert not link_planar.planar_eligible(_cfg(chan="random_paths"))
    assert not link_planar.planar_eligible(_cfg().replace(precoding="zf"))
    assert not link_planar.planar_eligible(_cfg().replace(csi_epsilon=0.1))
    assert not link_planar.planar_eligible(
        _cfg().replace(rx=RxConfig(algorithm="cnc_mu")))
    # non-eligible config + planar storage must silently use the complex path
    cfg = _cfg(chan="random_paths").replace(channel_storage="bfloat16")
    make_frame_fn(cfg, n_iters=1)  # builds without error


def test_planar_mcnc_matches_complex_path():
    """MCNC via the planar replica (float32 planes, LOS: shared random
    streams) reproduces the complex-path counters up to rounding flips."""
    base = _totals(_cfg(chan="los", alg="mcnc"))
    plan = _totals(_cfg(chan="los", alg="mcnc").replace(
        channel_storage="float32"))
    assert abs(base[0] - plan[0]) <= 0.02 * base[0] + 20, (base, plan)
    np.testing.assert_allclose(plan[1], base[1], rtol=0.02, atol=20)


def test_planar_mcnc_bf16_within_mc_noise():
    base = _totals(_cfg(alg="mcnc"))
    plan = _totals(_cfg(alg="mcnc").replace(channel_storage="bfloat16"))
    assert abs(base[0] - plan[0]) <= 0.15 * base[0] + 60, (base, plan)
    np.testing.assert_allclose(plan[1], base[1], rtol=0.15, atol=60)


@pytest.mark.parametrize("chan", ["los", "two_path", "rayleigh"])
def test_planar_float32_matches_complex_path(chan):
    """Planar storage at float32 must reproduce the complex64 path's
    counters up to f32 rounding: the fade stream is SHARED for both
    channels (the planar Rayleigh draw ``normal(key, (2, n_ant, n_sc),
    f32) * sqrt(0.5)`` is bit-identical to ``complex_normal``'s draw; only
    the attenuation-multiply rounding order differs), so agreement is
    tight — a few detector-boundary bit flips, not Monte-Carlo-level
    deviation."""
    base = _totals(_cfg(chan=chan))
    plan = _totals(_cfg(chan=chan).replace(channel_storage="float32"))
    tol = 0.03 if chan == "rayleigh" else 0.02
    assert abs(base[0] - plan[0]) <= max(tol * base[0], 50), (base, plan)
    np.testing.assert_allclose(plan[1], base[1],
                               rtol=tol, atol=30 if chan == "rayleigh" else 10)


def test_planar_bf16_within_mc_noise():
    """bf16 planes (-42 dB quantization) leave the error counters
    statistically indistinguishable from the complex64 path."""
    base = _totals(_cfg())
    plan = _totals(_cfg().replace(channel_storage="bfloat16"))
    assert abs(base[0] - plan[0]) <= 0.15 * base[0] + 60, (base, plan)
    np.testing.assert_allclose(plan[1], base[1], rtol=0.15, atol=60)


def test_planar_bf16_deterministic():
    cfg = _cfg().replace(channel_storage="bfloat16")
    a = _totals(cfg)
    b = _totals(cfg)
    assert a[0] == b[0]
    np.testing.assert_array_equal(a[1], b[1])


def test_planar_pa_models():
    """TOI and linear (none) PA models run through the planar path and
    produce sane counters (linear PA -> distorted == clean statistics)."""
    tot_toi = _totals(_cfg(pa_model="toi").replace(
        pa=PaConfig(model="toi", ibo_db=25.0, alpha_estimate=1.0),
        channel_storage="bfloat16"))
    assert tot_toi[1][0] >= 0
    cfg_lin = _cfg(pa_model="none").replace(channel_storage="bfloat16")
    clean, dist = _totals(cfg_lin)
    # linear PA: iteration-0 BER should be close to the clean run's
    assert abs(dist[0] - clean) <= 0.25 * clean + 60, (clean, dist)
