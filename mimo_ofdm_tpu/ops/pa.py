"""Memoryless power-amplifier nonlinearities and the Bussgang shrink factor.

Pure elementwise functions over complex time-domain samples, replacing the
stateful classes in ``reference/distortion.py``. State (IBO, average sample
power) becomes explicit arguments so the per-antenna "constant IBO under
precoding" recalibration (``reference/antenna_array.py:313-360``) is just a
per-antenna ``sat_pow`` array broadcast against ``[.., n_ant, n_samples]``.

These are VPU-bound elementwise ops; XLA fuses them with the surrounding
scale/AGC arithmetic. A fused Pallas variant lives in
``mimo_ofdm_tpu.kernels``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array
from jax.scipy.special import erfc


def ibo_to_sat_power(ibo_db: Array | float, avg_sample_power: Array | float) -> Array:
    """Saturation power from input back-off:
    ``10^(ibo/10) * avg_sample_power`` (``reference/distortion.py:37``)."""
    return 10.0 ** (jnp.asarray(ibo_db) / 10.0) * avg_sample_power


def soft_limiter(x: Array, sat_power: Array | float) -> Array:
    """Amplitude clip at ``sqrt(sat_power)`` preserving phase
    (``_process_soft_lim``, ``reference/distortion.py:9-19``)."""
    p = jnp.real(x) ** 2 + jnp.imag(x) ** 2
    scale = jnp.sqrt(sat_power / jnp.where(p > 0, p, 1.0))
    return jnp.where(p <= sat_power, x, x * scale.astype(x.dtype))


def rapp(x: Array, sat_power: Array | float, p_hardness: float) -> Array:
    """Rapp soft-saturation model
    (``_process_rapp``, ``reference/distortion.py:102-113``)."""
    ratio = jnp.abs(x) / jnp.sqrt(sat_power)
    denom = (1.0 + ratio ** (2.0 * p_hardness)) ** (1.0 / (2.0 * p_hardness))
    return x / denom.astype(x.dtype)


def third_order(x: Array, cubic_coeff: Array | float) -> Array:
    """Third-order memoryless polynomial ``x - c * x * |x|^2``
    (``_process_toi``, ``reference/distortion.py:202-211``)."""
    mag2 = (jnp.real(x) ** 2 + jnp.imag(x) ** 2).astype(x.dtype)
    return x - cubic_coeff * x * mag2


def toi_to_cubic_coeff(toi_db: Array | float, avg_sample_power: Array | float) -> Array:
    """Cubic coefficient from third-order-intercept point:
    ``1 / 10^(toi/10) / avg_sample_power`` (``reference/distortion.py:228``)."""
    return 1.0 / (10.0 ** (jnp.asarray(toi_db) / 10.0)) / avg_sample_power


def bussgang_alpha(ibo_db: Array | float) -> Array:
    """Ochiai closed-form Bussgang gain of an ideal clipper:
    ``alpha = 1 - exp(-g^2) + (sqrt(pi) g / 2) erfc(g)``, ``g = 10^(ibo/20)``
    (gamma is a ratio of envelopes, not powers;
    ``reference/modulation.py:178-189``)."""
    gamma = 10.0 ** (jnp.asarray(ibo_db, jnp.float32) / 20.0)
    return 1.0 - jnp.exp(-gamma ** 2) + (jnp.sqrt(jnp.pi) * gamma / 2.0) * erfc(gamma)


def apply_pa_planar(xr: Array, xi: Array, model: str,
                    sat_power: Array | float = 1.0, p_hardness: float = 1.1,
                    cubic_coeff: Array | float = 0.0) -> tuple[Array, Array]:
    """Planar (split real/imag) variant of :func:`apply_pa` for the
    MXU-matmul fused transform path — identical math, the common scale
    factor applied to both planes. Computes in float32 regardless of the
    storage dtype of the planes."""
    pr = xr.astype(jnp.float32)
    pi = xi.astype(jnp.float32)
    pwr = pr * pr + pi * pi
    if model == "softlim":
        scale = jnp.where(pwr <= sat_power, 1.0,
                          jnp.sqrt(sat_power / jnp.where(pwr > 0, pwr, 1.0)))
    elif model == "rapp":
        ratio2 = pwr / sat_power
        scale = (1.0 + ratio2 ** p_hardness) ** (-1.0 / (2.0 * p_hardness))
    elif model == "toi":
        scale = 1.0 - cubic_coeff * pwr
    elif model == "none":
        return xr, xi
    else:
        raise ValueError(f"unknown PA model {model!r}")
    return (pr * scale).astype(xr.dtype), (pi * scale).astype(xi.dtype)


def apply_pa(x: Array, model: str, sat_power: Array | float = 1.0,
             p_hardness: float = 1.1, cubic_coeff: Array | float = 0.0) -> Array:
    """Dispatch by PA model name: ``"softlim" | "rapp" | "toi" | "none"``
    (names match the reference ``__str__`` tags used in CSV filenames,
    ``reference/distortion.py:39-40,134-135,230-231``)."""
    if model == "softlim":
        return soft_limiter(x, sat_power)
    if model == "rapp":
        return rapp(x, sat_power, p_hardness)
    if model == "toi":
        return third_order(x, cubic_coeff)
    if model == "none":
        return x
    raise ValueError(f"unknown PA model {model!r}")
