"""Pallas fused-PA kernel numerics (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl
    import mimo_ofdm_tpu.kernels.fused_pa as fp
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(fp.pl, "pallas_call", patched)
    return fp


def test_fused_ifft_clip_fft_matches_jnp_chain(interpret_pallas):
    from mimo_ofdm_tpu.ops import pa as pa_ops
    fp = interpret_pallas
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(8, 4096))
         + 1j * rng.normal(size=(8, 4096))).astype(np.complex64)
    sat = 1.5
    ref = jnp.fft.fft(
        pa_ops.soft_limiter(jnp.fft.ifft(jnp.asarray(x), axis=-1, norm="ortho"),
                            sat), axis=-1, norm="ortho")
    out = fp.fused_ifft_clip_fft(jnp.asarray(x), sat, tile=4)
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err / scale < 1e-5


def test_fused_kernel_no_clipping_is_identity(interpret_pallas):
    fp = interpret_pallas
    rng = np.random.default_rng(1)
    x = ((rng.normal(size=(4, 4096)) + 1j * rng.normal(size=(4, 4096)))
         * 0.01).astype(np.complex64)
    out = fp.fused_ifft_clip_fft(jnp.asarray(x), 1e6, tile=4)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)
