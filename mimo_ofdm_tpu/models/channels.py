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


# --- native 3GPP TDL substitute for the Quadriga/MATLAB sidecar ------------

# Exact 3GPP TR 38.901 v17 tapped-delay-line profiles, Tables 7.7.2-1..5:
# normalized delays (multiples of the desired delay spread, section 7.7.3)
# and per-tap powers [dB]. TDL-A/B/C are NLOS (all taps Rayleigh); TDL-D/E
# are LOS: their first tap carries a deterministic specular component
# ("los_db") plus a Rayleigh component at the same delay ("powers_db[0]").
# These feed the native substitute for the out-of-process Quadriga engine
# (reference/channel.py:404-494, reference/main_quadriga_channel/
# qd_channel_env_setup.m).
TDL_PROFILES: dict[str, dict] = {
    # Table 7.7.2-1 (TDL-A, NLOS, 23 taps)
    "tdl_a": {
        "delays": np.array([0.0000, 0.3819, 0.4025, 0.5868, 0.4610, 0.5375,
                            0.6708, 0.5750, 0.7618, 1.5375, 1.8978, 2.2242,
                            2.1718, 2.4942, 2.5119, 3.0582, 4.0810, 4.4579,
                            4.5695, 4.7966, 5.0066, 5.3043, 9.6586]),
        "powers_db": np.array([-13.4, 0.0, -2.2, -4.0, -6.0, -8.2, -9.9,
                               -10.5, -7.5, -15.9, -6.6, -16.7, -12.4, -15.2,
                               -10.8, -11.3, -12.7, -16.2, -18.3, -18.9,
                               -16.6, -19.9, -29.7]),
        "los_db": None,
    },
    # Table 7.7.2-2 (TDL-B, NLOS, 23 taps)
    "tdl_b": {
        "delays": np.array([0.0000, 0.1072, 0.2155, 0.2095, 0.2870, 0.2986,
                            0.3752, 0.5055, 0.3681, 0.3697, 0.5700, 0.5283,
                            1.1021, 1.2756, 1.5474, 1.7842, 2.0169, 2.8294,
                            3.0219, 3.6187, 4.1067, 4.2790, 4.7834]),
        "powers_db": np.array([0.0, -2.2, -4.0, -3.2, -9.8, -1.2, -3.4, -5.2,
                               -7.6, -3.0, -8.9, -9.0, -4.8, -5.7, -7.5,
                               -1.9, -7.6, -12.2, -9.8, -11.4, -14.9, -9.2,
                               -11.3]),
        "los_db": None,
    },
    # Table 7.7.2-3 (TDL-C, NLOS, 24 taps)
    "tdl_c": {
        "delays": np.array([0.0000, 0.2099, 0.2219, 0.2329, 0.2176, 0.6366,
                            0.6448, 0.6560, 0.6584, 0.7935, 0.8213, 0.9336,
                            1.2285, 1.3083, 2.1704, 2.7105, 4.2589, 4.6003,
                            5.4902, 5.6077, 6.3065, 6.6374, 7.0427, 8.6523]),
        "powers_db": np.array([-4.4, -1.2, -3.5, -5.2, -2.5, 0.0, -2.2, -3.9,
                               -7.4, -7.1, -10.7, -11.1, -5.1, -6.8, -8.7,
                               -13.2, -13.9, -13.9, -15.8, -17.1, -16.0,
                               -15.7, -21.6, -22.8]),
        "los_db": None,
    },
    # Table 7.7.2-4 (TDL-D, LOS, 13 taps; first tap = LOS path -0.2 dB +
    # Rayleigh -13.5 dB at the same delay)
    "tdl_d": {
        "delays": np.array([0.0000, 0.0350, 0.6120, 1.3630, 1.4050, 1.8040,
                            2.5960, 1.7750, 4.0420, 7.9370, 9.4240, 9.7080,
                            12.5250]),
        "powers_db": np.array([-13.5, -18.8, -21.0, -22.8, -17.9, -20.1,
                               -21.9, -22.9, -27.8, -23.6, -24.8, -30.0,
                               -27.7]),
        "los_db": -0.2,
    },
    # Table 7.7.2-5 (TDL-E, LOS, 14 taps; first tap = LOS path -0.03 dB +
    # Rayleigh -22.03 dB at the same delay)
    "tdl_e": {
        "delays": np.array([0.0000, 0.5133, 0.5440, 0.5630, 0.5440, 0.7112,
                            1.9092, 1.9293, 1.9589, 2.6426, 3.7136, 5.4524,
                            12.0034, 20.6519]),
        "powers_db": np.array([-22.03, -15.8, -18.1, -19.8, -22.9, -22.4,
                               -18.6, -20.8, -22.6, -22.3, -25.6, -20.2,
                               -29.8, -29.2]),
        "los_db": -0.03,
    },
}

# scenario aliases: the reference's Quadriga scenario strings map onto the
# closest TR 38.901 TDL profile (LOS scenarios -> TDL-D, UMi NLOS -> TDL-A,
# UMa NLOS -> TDL-C per the common calibration practice)
TDL_PROFILES["uma_los"] = TDL_PROFILES["tdl_d"]
TDL_PROFILES["umi_nlos"] = TDL_PROFILES["tdl_a"]
TDL_PROFILES["uma_nlos"] = TDL_PROFILES["tdl_c"]


# TR 38.901 Table 7.5-3: ray offset angles within a cluster (in units of
# the per-cluster angular spread), 20 rays as +-pairs
RAY_OFFSETS = np.array([0.0447, 0.1413, 0.2492, 0.3715, 0.5129, 0.6797,
                        0.8844, 1.1481, 1.5195, 2.1551])
RAY_OFFSETS = np.concatenate([RAY_OFFSETS, -RAY_OFFSETS])


def tdl_channel(key: Array, tx_pos: Array, rx_pos: Array, freqs: Array,
                profile: str = "uma_los", delay_spread: float = 300e-9,
                skip_attenuation: bool = False, tx_gain_db: float = 0.0,
                rx_gain_db: float = 0.0, n_subpaths: int = 20,
                asd_deg: float = 5.0, k_db: float | None = None,
                k_std_db: float = 0.0, ds_log10_std: float = 0.0,
                dtype=jnp.complex64) -> Array:
    """Stochastic tapped-delay-line channel with the exact TR 38.901
    Table 7.7.2-x profiles: per-tap Rayleigh fading (plus the
    deterministic specular component on LOS profiles) with array phase
    steering, mapped to frequency via ``exp(-2j pi f tau)``, total power
    normalized to 1 before the free-space attenuation. Native substitute
    for the MATLAB/Quadriga 3GPP 38.901 channels
    (``reference/channel.py:404-494``,
    ``reference/main_quadriga_channel/qd_channel_env_setup.m``).

    Each tap is a **sum of ``n_subpaths`` rays** whose departure angles
    spread around the tap DoA by the TR 38.901 Table 7.5-3 ray offsets
    scaled by the per-cluster azimuth spread ``asd_deg`` (section 7.5
    step 7), each ray carrying an independent CN(0, p_tap/n) coefficient
    — the intra-cluster angular spread that decorrelates a tap across
    the array. ``n_subpaths=1`` reproduces the rank-1-per-tap model used
    in rounds 2-3, whose missing spread made iterative (CNC/MCNC)
    convergence too fast vs the committed Quadriga curves
    (docs/CURVE_REPRODUCTION.md). The specular LOS component stays a
    single unspread ray.

    ``k_db`` applies TR 38.901 section 7.7.6 **K-factor scaling** to the
    LOS profiles: the specular power becomes ``K/(K+1)`` and the diffuse
    taps are renormalized to ``1/(K+1)``. With ``k_std_db > 0`` the
    K-factor is drawn per call as ``Normal(k_db, k_std_db)`` dB — the
    stochastic per-realization K of the geometric 38.901 model (Table
    7.5-6: UMa LOS mu_K = 9 dB, sigma_K = 3.5 dB) that the Quadriga
    engine samples and the fixed-profile TDL tables do not. Similarly
    ``ds_log10_std`` draws the delay spread per call as a lognormal
    around ``delay_spread`` (Table 7.5-6 lgDS sigma; UMa LOS 0.66 in
    log10 seconds)."""
    prof = TDL_PROFILES[profile]
    k_fade, k_doa, k_kf, k_ds = jax.random.split(key, 4)
    if ds_log10_std > 0.0:
        delay_spread = delay_spread * 10.0 ** (
            ds_log10_std * jax.random.normal(k_ds, ()))
    delays = jnp.asarray(prof["delays"]) * delay_spread
    powers = 10.0 ** (jnp.asarray(prof["powers_db"]) / 10.0)
    los_pow = (10.0 ** (prof["los_db"] / 10.0)
               if prof["los_db"] is not None else 0.0)
    total = jnp.sum(powers) + los_pow
    powers = powers / total
    los_pow = los_pow / total
    n_taps = delays.shape[0]

    if k_db is not None and prof["los_db"] is not None:
        kf_db = k_db + k_std_db * jax.random.normal(k_kf, ())
        k_lin = 10.0 ** (kf_db / 10.0)
        los_pow = k_lin / (k_lin + 1.0)
        powers = powers / jnp.sum(powers) / (k_lin + 1.0)
    doa = jax.random.uniform(k_doa, (n_taps,), minval=-jnp.pi / 2,
                             maxval=jnp.pi / 2)
    # per-tap array steering from element x-offsets (broadside ULA approx)
    delta = tx_pos[..., :, 0] - jnp.mean(tx_pos[..., :, 0])
    fc = jnp.mean(freqs)
    wavenum = 2.0 * jnp.pi * fc / C_LIGHT

    if n_subpaths <= 1:
        fade = complex_normal(k_fade, (n_taps,), dtype)
        steer = jnp.exp(1j * wavenum
                        * delta[:, None] * jnp.sin(doa)[None, :])
        gain = jnp.sqrt(powers) * fade
        if prof["los_db"] is not None:
            gain = gain.at[0].add(jnp.sqrt(los_pow).astype(dtype))
        tap_gain = gain[None, :] * steer                   # [n_ant, n_taps]
    else:
        n_rays = n_subpaths
        offsets = jnp.asarray(
            np.resize(RAY_OFFSETS, n_rays) * np.radians(asd_deg))
        ray_doa = doa[:, None] + offsets[None, :]          # [n_taps, n_rays]
        fade = complex_normal(k_fade, (n_taps, n_rays), dtype)
        ray_gain = jnp.sqrt(powers / n_rays)[:, None] * fade
        steer = jnp.exp(1j * wavenum * delta[:, None, None]
                        * jnp.sin(ray_doa)[None, :, :])    # [n_ant, n_taps, n_rays]
        tap_gain = jnp.sum(ray_gain[None, :, :] * steer, axis=-1)
        if prof["los_db"] is not None:
            # deterministic unspread specular ray at tap 0's center DoA
            spec = (jnp.sqrt(los_pow).astype(dtype)
                    * jnp.exp(1j * wavenum * delta * jnp.sin(doa[0])))
            tap_gain = tap_gain.at[:, 0].add(spec)
    phase = jnp.exp(-2j * jnp.pi * freqs[None, :, None] * delays[None, None, :])
    h = jnp.sum(tap_gain[:, None, :] * phase, axis=-1)     # [n_ant, n_fft]

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
