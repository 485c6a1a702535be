"""MISO frequency-domain channel generators, vectorized and keyed.

Each generator is a pure function producing an ``[n_ant, n_fft]`` complex
channel matrix; "rerolling" (``reference/channel.py:262-275``) is simply a
new PRNG key or RX position. ``propagate`` is the per-bin multiply + sum
over antennas used by every reference channel class
(``reference/channel.py:74-89``).

Channel models (see ``reference/channel.py``):

* ``los_channel``          — free-space LOS (:11-89)
* ``two_path_channel``     — LOS + ground reflection, coeff -1 (:92-184)
* ``rayleigh_channel``     — IID CN(0,1) x free-space attenuation (:187-292)
* ``random_paths_channel`` — sum of random-delay/DoA paths (:295-401),
  reproducing the reference's formula exactly (including its
  ``sin(angle / c)`` idiom at :342)
* ``tdl_channel``          — native stochastic 3GPP-like tapped-delay-line
  substitute for the MATLAB/Quadriga sidecar (:404-494); see
  ``TDL_PROFILES``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from mimo_ofdm_tpu.models.geometry import C_LIGHT
from mimo_ofdm_tpu.ops.noise import complex_normal


def propagate(channel_mat_fd: Array, in_sig_mat: Array, sum_signals: bool = True,
              ant_axis_name: str | None = None) -> Array:
    """``H o X`` then (optionally) sum over the antenna axis
    (``reference/channel.py:74-89``). Broadcasts over leading batch dims;
    the antenna axis is ``-2``. Under antenna parallelism the sum is a
    local reduce + ``psum`` over the antenna mesh axis — the TPU-native
    combine of the per-antenna signals (SURVEY.md section 2.3 P2)."""
    out = in_sig_mat * channel_mat_fd
    if not sum_signals:
        return out
    s = jnp.sum(out, axis=-2)
    if ant_axis_name is not None:
        s = jax.lax.psum(s, ant_axis_name)
    return s


def _distances(tx_pos: Array, rx_pos: Array) -> Array:
    """Euclidean TX-element -> RX distances, ``[n_ant]``
    (``reference/channel.py:56-58``)."""
    return jnp.sqrt(jnp.sum((tx_pos - rx_pos[..., None, :]) ** 2, axis=-1))


def _fs_attenuation(distances: Array, freqs: Array, tx_gain_db: float = 0.0,
                    rx_gain_db: float = 0.0) -> Array:
    """Free-space amplitude attenuation ``sqrt(10^((gt+gr)/10)) * c/(4 pi d f)``
    (``reference/channel.py:65-67``)."""
    gain = jnp.sqrt(10.0 ** ((tx_gain_db + rx_gain_db) / 10.0))
    return gain * (C_LIGHT / (4.0 * jnp.pi * distances[..., :, None] * freqs))


def los_channel(tx_pos: Array, rx_pos: Array, freqs: Array,
                skip_attenuation: bool = False, tx_gain_db: float = 0.0,
                rx_gain_db: float = 0.0, dtype=jnp.complex64) -> Array:
    """LOS channel ``H[a,f] = e^{2j pi d_a f / c} * att``
    (``MisoLosFd.calc_channel_mat``, ``reference/channel.py:35-72``)."""
    d = _distances(tx_pos, rx_pos)
    phase = jnp.exp(2j * jnp.pi * d[..., :, None] * freqs / C_LIGHT)
    if skip_attenuation:
        return phase.astype(dtype)
    return (phase * _fs_attenuation(d, freqs, tx_gain_db, rx_gain_db)).astype(dtype)


def two_path_channel(tx_pos: Array, rx_pos: Array, freqs: Array,
                     skip_attenuation: bool = False, tx_gain_db: float = 0.0,
                     rx_gain_db: float = 0.0, dtype=jnp.complex64) -> Array:
    """Two-path channel: LOS + ground reflection with coefficient -1
    (``MisoTwoPathFd.calc_channel_mat``, ``reference/channel.py:116-167``)."""
    d_los = _distances(tx_pos, rx_pos)
    rx = rx_pos[..., None, :]  # broadcast against the antenna axis
    tz = tx_pos[..., :, 2]
    rz = rx[..., 2]
    horiz = jnp.sqrt((tx_pos[..., :, 0] - rx[..., 0]) ** 2
                     + (tx_pos[..., :, 1] - rx[..., 1]) ** 2)
    elev = jnp.arctan((tz + rz) / horiz)  # reference/channel.py:141-145
    d_sec = tz / jnp.sin(elev) + rz / jnp.sin(elev)  # :147-149
    los_mat = jnp.exp(2j * jnp.pi * d_los[..., :, None] * freqs / C_LIGHT)
    sec_mat = -1.0 * jnp.exp(2j * jnp.pi * d_sec[..., :, None] * freqs / C_LIGHT)
    if not skip_attenuation:
        los_mat = los_mat * _fs_attenuation(d_los, freqs, tx_gain_db, rx_gain_db)
        sec_mat = sec_mat * _fs_attenuation(d_sec, freqs, tx_gain_db, rx_gain_db)
    return (los_mat + sec_mat).astype(dtype)


def rayleigh_channel(key: Array, tx_pos: Array, rx_pos: Array, freqs: Array,
                     skip_attenuation: bool = False, tx_gain_db: float = 0.0,
                     rx_gain_db: float = 0.0, dtype=jnp.complex64) -> Array:
    """IID CN(0,1) per antenna x bin, scaled by the LOS free-space
    attenuation (``MisoRayleighFd``, ``reference/channel.py:234-251``)."""
    n_ant = tx_pos.shape[-2]
    n_fft = freqs.shape[-1]
    coeffs = complex_normal(key, (n_ant, n_fft), dtype)
    if skip_attenuation:
        return coeffs
    d = _distances(tx_pos, rx_pos)
    return (coeffs * _fs_attenuation(d, freqs, tx_gain_db, rx_gain_db)).astype(dtype)


def random_paths_channel(key: Array, tx_pos: Array, freqs: Array,
                         n_paths: int = 10, max_delay_spread: float = 1000e-9,
                         dtype=jnp.complex64) -> Array:
    """Random-paths channel per IEEE 8429913 eq. (62) as implemented by the
    reference (``MisoRandomPathsFd``, ``reference/channel.py:330-344``):
    ``H[a,f] = 1/sqrt(P) sum_p exp(-2j f (tau_p + delta_a sin(theta_p / c)))``
    with ``delta_a`` the element distance to the first array element.
    The reference's exact formula is reproduced (note: it scales the DoA
    angle, not the product, by ``1/c`` — ``reference/channel.py:341-342``)."""
    k_ang, k_tau = jax.random.split(key)
    angles = jax.random.uniform(k_ang, (n_paths,), minval=-jnp.pi / 2, maxval=jnp.pi / 2)
    taus = jax.random.uniform(k_tau, (n_paths,), minval=0.0, maxval=max_delay_spread)
    delta = jnp.sqrt(jnp.sum((tx_pos - tx_pos[..., 0:1, :]) ** 2, axis=-1))  # [n_ant]
    # [n_ant, n_paths]
    arg = taus[None, :] + delta[:, None] * jnp.sin(angles / C_LIGHT)[None, :]
    # [n_ant, n_fft, n_paths] phase; sum over paths
    phases = jnp.exp(-2j * freqs[None, :, None] * arg[:, None, :])
    return (jnp.sum(phases, axis=-1) / jnp.sqrt(float(n_paths))).astype(dtype)


def rician_channel(key: Array, tx_pos: Array, rx_pos: Array, freqs: Array,
                   k_factor_db: float = 9.0, skip_attenuation: bool = False,
                   dtype=jnp.complex64) -> Array:
    """Rician fading: deterministic LOS component plus IID Rayleigh
    scatter, mixed by the K-factor ``K = 10^(K_dB/10)``:
    ``H = sqrt(K/(K+1)) H_los + sqrt(1/(K+1)) H_ray`` per antenna x bin.
    Spans the gap between the reference's pure-LOS (``channel.py:11-91``)
    and pure-Rayleigh (``channel.py:187-293``) models, standing in for the
    intermediate Quadriga LOS scenarios (``channel.py:404-494``)."""
    k_lin = 10.0 ** (k_factor_db / 10.0)
    h_los = los_channel(tx_pos, rx_pos, freqs, skip_attenuation, dtype=dtype)
    n_ant = tx_pos.shape[-2]
    scatter = complex_normal(key, (n_ant, freqs.shape[-1]), dtype)
    # scatter scaled to the same per-antenna average power as the LOS part
    p_los = jnp.mean(jnp.abs(h_los) ** 2, axis=-1, keepdims=True)
    w_los = jnp.sqrt(k_lin / (k_lin + 1.0))
    w_sc = jnp.sqrt(1.0 / (k_lin + 1.0))
    return (w_los * h_los
            + w_sc * scatter * jnp.sqrt(p_los).astype(dtype)).astype(dtype)


# --- native 3GPP-like TDL substitute for the Quadriga/MATLAB sidecar -------

# (normalized power [dB], normalized delay) per tap — compact cluster
# profiles in the spirit of 3GPP TR 38.901 TDL-A/TDL-D tables. These stand
# in for the out-of-process Quadriga engine (reference/channel.py:404-494).
TDL_PROFILES: dict[str, dict] = {
    # NLOS-ish rich scattering (TDL-A-like, 12 strongest taps)
    "umi_nlos": {
        "delays": np.array([0.0, 0.3819, 0.4025, 0.5868, 0.4610, 0.5375, 0.6708,
                            0.5750, 0.7618, 1.5375, 1.8978, 2.2242]),
        "powers_db": np.array([-13.4, 0.0, -2.2, -4.0, -6.0, -8.2, -9.9,
                               -10.5, -7.5, -15.9, -6.6, -16.7]),
        "has_los": False,
    },
    # LOS with strong direct path (TDL-D-like)
    "uma_los": {
        "delays": np.array([0.0, 0.035, 0.612, 1.363, 1.405, 1.804, 2.596,
                            1.775, 4.042, 7.937, 9.424, 9.708]),
        "powers_db": np.array([-0.2, -13.5, -18.8, -21.0, -22.8, -17.9, -20.1,
                               -21.9, -22.9, -27.8, -23.6, -24.8]),
        "has_los": True,
    },
    # NLOS urban-macro rich scattering (TDL-C-like, 12 strongest clusters)
    "uma_nlos": {
        "delays": np.array([0.0, 0.2099, 0.2219, 0.2329, 0.2176, 0.6366,
                            0.6448, 0.6560, 0.6584, 0.7935, 0.8213, 1.0618]),
        "powers_db": np.array([-4.4, -1.2, -3.5, -5.2, -2.5, 0.0, -2.2, -3.9,
                               -7.4, -7.1, -10.7, -11.1]),
        "has_los": False,
    },
}


def tdl_channel(key: Array, tx_pos: Array, rx_pos: Array, freqs: Array,
                profile: str = "uma_los", delay_spread: float = 300e-9,
                skip_attenuation: bool = False, tx_gain_db: float = 0.0,
                rx_gain_db: float = 0.0, dtype=jnp.complex64) -> Array:
    """Stochastic tapped-delay-line channel: per-tap Rayleigh (or fixed LOS
    first tap) coefficients with array phase steering per tap DoA, mapped to
    frequency via ``exp(-2j pi f tau)``. Native substitute for the
    MATLAB/Quadriga 3GPP 38.901 channels (``reference/channel.py:404-494``,
    ``reference/main_quadriga_channel/qd_channel_env_setup.m``)."""
    prof = TDL_PROFILES[profile]
    delays = jnp.asarray(prof["delays"] * delay_spread)
    powers = 10.0 ** (jnp.asarray(prof["powers_db"]) / 10.0)
    powers = powers / jnp.sum(powers)
    n_taps = delays.shape[0]
    n_ant = tx_pos.shape[-2]

    k_fade, k_doa = jax.random.split(key)
    fade = complex_normal(k_fade, (n_taps,), dtype)
    if prof["has_los"]:
        fade = fade.at[0].set(1.0 + 0.0j)  # deterministic direct path
    doa = jax.random.uniform(k_doa, (n_taps,), minval=-jnp.pi / 2, maxval=jnp.pi / 2)

    # per-tap array steering from element x-offsets (broadside ULA approx)
    delta = tx_pos[..., :, 0] - jnp.mean(tx_pos[..., :, 0])
    fc = jnp.mean(freqs)
    steer = jnp.exp(2j * jnp.pi * fc / C_LIGHT
                    * delta[:, None] * jnp.sin(doa)[None, :])      # [n_ant, n_taps]
    tap_gain = (jnp.sqrt(powers) * fade)[None, :] * steer          # [n_ant, n_taps]
    phase = jnp.exp(-2j * jnp.pi * freqs[None, :, None] * delays[None, None, :])
    h = jnp.sum(tap_gain[:, None, :] * phase, axis=-1)             # [n_ant, n_fft]

    if not skip_attenuation:
        d = _distances(tx_pos, rx_pos)
        h = h * _fs_attenuation(d, freqs, tx_gain_db, rx_gain_db)
    return h.astype(dtype)


def csi_error_channel(key: Array, channel_mat_fd: Array, n_sub_carr: int,
                      epsilon: float) -> Array:
    """Apply the CSI error model on the data subcarriers only:
    ``H_noisy = sqrt(1-eps^2) H + eps * CN(0, P_H)`` per antenna, where
    ``P_H`` is that antenna's mean per-bin channel power over the data SCs
    (``reference/mp_model.py:264-284``). Out-of-band bins are unchanged."""
    from mimo_ofdm_tpu.ops.ofdm import extract_subcarriers, map_subcarriers
    h_sc = extract_subcarriers(channel_mat_fd, n_sub_carr)          # [n_ant, n_sc]
    p = jnp.mean(jnp.abs(h_sc) ** 2, axis=-1, keepdims=True)
    noise = complex_normal(key, h_sc.shape, channel_mat_fd.dtype)
    noisy_sc = (jnp.sqrt(1.0 - epsilon ** 2) * h_sc
                + noise * jnp.sqrt(p).astype(channel_mat_fd.dtype) * epsilon)
    # re-embed only data bins; keep other bins from the original matrix
    mask = map_subcarriers(jnp.ones_like(h_sc, dtype=jnp.float32), channel_mat_fd.shape[-1],
                           fill_value=0.0)
    noisy_full = map_subcarriers(noisy_sc, channel_mat_fd.shape[-1])
    return jnp.where(mask > 0, noisy_full, channel_mat_fd)
