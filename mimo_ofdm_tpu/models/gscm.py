"""Native TR 38.901 geometric stochastic channel model (GSCM).

TPU-native substitute for the reference's out-of-process Quadriga/MATLAB
engine (``reference/channel.py:404-494``,
``reference/main_quadriga_channel/qd_channel_env_setup.m``): the
reference sets up a QuaDriGa ``qd_layout`` with ``use_3GPP_baseline = 1``
(the TR 38.901 drop-based model, no spatial-consistency extensions) and a
``'3gpp-3d'`` ULA of directional elements, then draws one independent
channel *drop* per frame at the rerolled RX position
(``reference/mp_model.py:190-199`` -> ``qd_get_channel_mat.m``).

This module implements that drop procedure directly from TR 38.901
section 7.5 (steps 4-11) as one pure, jittable, vmappable function:

* step 4  — correlated large-scale parameters (DS, ASD, ZSD, K) drawn
  per drop from the scenario's lognormal distributions with the Table
  7.5-6 cross-correlations (the arrival spreads ASA/ZSA and the shadow
  fading SF are marginalized out: the RX is a single omni antenna and
  the per-frame AGC renormalization cancels any overall drop gain,
  ``reference/mp_model.py:290-329``);
* step 5  — exponential cluster delays with the ``r_tau`` scaling and
  the LOS ``C_tau`` K-factor correction;
* step 6  — cluster powers with per-cluster lognormal shadowing and the
  LOS specular/diffuse split;
* step 7  — cluster departure angles *coupled to cluster powers* (the
  ``2(ASD/1.4)sqrt(-ln(P/max P))/C_phi`` construction with the LOS
  ``C_phi``/``C_theta`` corrections) — the power-angle coupling that no
  position-independent TDL tap table can express;
* step 8  — random coupling of ZoD ray offsets against AoD ray offsets
  within each cluster;
* steps 10-11 — per-ray random phases, the 3GPP directional element
  pattern (TR 38.901 section 7.3, the ``'3gpp-3d'`` element the
  reference's MATLAB setup uses), array steering from the true element
  positions, sub-cluster splitting of the two strongest clusters
  (Table 7.5-5 ray groups at delay offsets {0, 1.28, 2.56} c_DS), and
  the LOS specular ray at ``sqrt(K/(K+1))``.

The frequency response is assembled as a ``[n_ant, n_taps] @ [n_taps,
n_fft]`` complex matmul (taps = 3 sub-clusters per cluster + the LOS
ray), the same MXU-friendly factorization as
:func:`mimo_ofdm_tpu.models.channels.tdl_channel`.

Scenario tables are transcribed from TR 38.901 Tables 7.5-2..7.5-7
(UMa LOS / UMa NLOS — the two scenarios the reference simulates,
``'3GPP_38.901_UMa_LOS'`` / ``'_NLOS'``,
``reference/main_quadriga_channel/main_mp_quadriga_cnc_ber_vs_ebn0.py:58-59``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from mimo_ofdm_tpu.models.geometry import C_LIGHT
from mimo_ofdm_tpu.models.channels import _distances, _fs_attenuation


# TR 38.901 Table 7.5-3: ray offset angles alpha_m (in units of the
# per-cluster angular spread), m = 1..20 as +-pairs: m=2k-1 -> +a_k,
# m=2k -> -a_k.
_RAY_BASE = np.array([0.0447, 0.1413, 0.2492, 0.3715, 0.5129,
                      0.6797, 0.8844, 1.1481, 1.5195, 2.1551])
_OFFSETS_BY_M = np.stack([_RAY_BASE, -_RAY_BASE], axis=1).reshape(-1)  # m=1..20

# Table 7.5-5: sub-cluster ray-index partition of a split cluster.
# Reordered so each sub-cluster is a contiguous slice of the ray axis;
# the delay offsets are {0, 1.28, 2.56} * c_DS.
_SUB_RAYS = [np.array([1, 2, 3, 4, 5, 6, 7, 8, 19, 20]),   # sub-cluster 1
             np.array([9, 10, 11, 12, 17, 18]),            # sub-cluster 2
             np.array([13, 14, 15, 16])]                   # sub-cluster 3
_RAY_ORDER = np.concatenate(_SUB_RAYS) - 1                 # 0-based permutation
RAY_OFFSETS_20 = _OFFSETS_BY_M[_RAY_ORDER]                 # [20], grouped 10/6/4
_SUB_SLICES = [(0, 10), (10, 16), (16, 20)]
_SUB_DELAY_FACTORS = np.array([0.0, 1.28, 2.56])

# Table 7.5-2: scaling factor C_phi(N) for azimuth angle generation.
_C_PHI = {4: 0.779, 5: 0.860, 8: 1.018, 10: 1.090, 11: 1.123, 12: 1.146,
          14: 1.178, 15: 1.194, 16: 1.226, 19: 1.273, 20: 1.289, 25: 1.358}
# Table 7.5-4: scaling factor C_theta(N) for zenith angle generation.
_C_THETA = {8: 0.889, 10: 0.957, 11: 1.031, 12: 1.104, 15: 1.1088,
            19: 1.184, 20: 1.178, 25: 1.282}


def _lg(fc_ghz):
    return jnp.log10(fc_ghz)


# TR 38.901 Table 7.5-6 (UMa column) + Table 7.5-7 (ZSD/ZoD-offset).
# Each lognormal is mu = a + b*log10(fc_GHz) (log10 seconds / log10
# degrees). Cross-correlations are the Table 7.5-6 values for the
# [DS, ASD, ZSD, K] sub-block (marginalizing ASA/ZSA/SF keeps the
# remaining correlations unchanged).
GSCM_SCENARIOS: dict[str, dict] = {
    "uma_los": {
        "los": True,
        "n_clusters": 12, "n_rays": 20, "r_tau": 2.5, "zeta_db": 3.0,
        "c_asd_deg": 5.0,
        "lg_ds": (-6.955, -0.0963, 0.66),
        "lg_asd": (1.06, 0.1114, 0.28),
        "k_db": (9.0, 3.5),
        # corr among [DS, ASD, ZSD, K]
        "corr": {("ds", "asd"): 0.4, ("ds", "zsd"): -0.2, ("ds", "k"): -0.4,
                 ("asd", "zsd"): 0.5, ("asd", "k"): 0.0, ("zsd", "k"): 0.0},
        "zsd_sigma": 0.40,
    },
    "uma_nlos": {
        "los": False,
        "n_clusters": 20, "n_rays": 20, "r_tau": 2.3, "zeta_db": 3.0,
        "c_asd_deg": 2.0,
        "lg_ds": (-6.28, -0.204, 0.39),
        "lg_asd": (1.5, -0.1144, 0.28),
        "k_db": None,
        "corr": {("ds", "asd"): 0.4, ("ds", "zsd"): -0.5,
                 ("asd", "zsd"): 0.5},
        "zsd_sigma": 0.49,
    },
}


def _corr_chol(scn: dict) -> np.ndarray:
    """Cholesky factor of the LSP correlation matrix over
    [DS, ASD, ZSD(, K)] (static per scenario)."""
    names = ["ds", "asd", "zsd"] + (["k"] if scn["k_db"] is not None else [])
    n = len(names)
    c = np.eye(n)
    for (a, b), v in scn["corr"].items():
        i, j = names.index(a), names.index(b)
        c[i, j] = c[j, i] = v
    return np.linalg.cholesky(c)


def _element_amp(theta_deg: Array, phi_rel_deg: Array) -> Array:
    """3GPP directional element amplitude pattern (TR 38.901 section 7.3
    Table 7.3-1, the ``'3gpp-3d'`` element of the reference's MATLAB
    array setup): vertical/horizontal 12 dB parabolas with 65 deg HPBW,
    30 dB floors. Returns the field amplitude (sqrt of the power
    pattern); the constant 8 dBi max gain cancels in the per-frame AGC."""
    a_v = -jnp.minimum(12.0 * ((theta_deg - 90.0) / 65.0) ** 2, 30.0)
    a_h = -jnp.minimum(12.0 * (phi_rel_deg / 65.0) ** 2, 30.0)
    a_db = -jnp.minimum(-(a_v + a_h), 30.0)
    return 10.0 ** (a_db / 20.0)


def _wrap_azimuth(phi_deg: Array) -> Array:
    """Wrap azimuth to (-180, 180]."""
    return phi_deg - 360.0 * jnp.round(phi_deg / 360.0)


def _fold_zenith(theta_deg: Array) -> Array:
    """Fold zenith into [0, 180] by reflection (TR 38.901 step 7 ZoA
    wrapping convention applied to ZoD)."""
    t = jnp.abs(theta_deg)
    t = jnp.mod(t, 360.0)
    return jnp.where(t > 180.0, 360.0 - t, t)


def gscm_taps(key: Array, tx_pos: Array, rx_pos: Array, fc: Array,
              scenario: str = "uma_los", element_pattern: bool = True,
              boresight_az_deg: float = 90.0,
              dtype=jnp.complex64) -> tuple[Array, Array]:
    """Generate one TR 38.901 drop's tap representation:
    ``(taps_v [n_ant, n_taps], taps_tau [n_taps])`` with ``n_taps =
    3 * n_clusters (+1 LOS specular)``. See :func:`gscm_channel`."""
    scn = GSCM_SCENARIOS[scenario]
    n_cl, n_rays = scn["n_clusters"], scn["n_rays"]
    assert n_rays == 20, "ray tables are the 20-ray TR 38.901 set"
    is_los = scn["los"]

    (k_lsp, k_del, k_pow, k_xa, k_ya, k_xz, k_yz, k_perm, k_phase,
     ) = jax.random.split(key, 9)

    fc_ghz = fc / 1e9
    lam = C_LIGHT / fc

    # geometry: LOS direction from the array center
    center = jnp.mean(tx_pos, axis=-2)
    diff = rx_pos - center
    d2d = jnp.sqrt(diff[0] ** 2 + diff[1] ** 2)
    d3d = jnp.sqrt(jnp.sum(diff ** 2))
    phi_los = jnp.degrees(jnp.arctan2(diff[1], diff[0]))          # azimuth AoD
    theta_los = jnp.degrees(jnp.arccos(diff[2] / d3d))            # zenith AoD
    h_ut = rx_pos[2]

    # --- step 4: correlated LSPs ------------------------------------------
    chol = jnp.asarray(_corr_chol(scn), jnp.float32)
    z = chol @ jax.random.normal(k_lsp, (chol.shape[0],))
    a, b, sd = scn["lg_ds"]
    ds = 10.0 ** (a + b * _lg(fc_ghz) + sd * z[0])                # seconds
    a, b, sd = scn["lg_asd"]
    asd = jnp.minimum(10.0 ** (a + b * _lg(fc_ghz) + sd * z[1]), 104.0)
    # ZSD mean from Table 7.5-7 (UMa): distance/height dependent
    mu_lg_zsd = jnp.maximum(
        -0.5, -2.1 * (d2d / 1000.0) - 0.01 * (h_ut - 1.5)
        + (0.75 if is_los else 0.9))
    zsd = jnp.minimum(10.0 ** (mu_lg_zsd + scn["zsd_sigma"] * z[2]), 52.0)
    if is_los:
        k_db = scn["k_db"][0] + scn["k_db"][1] * z[3]
        k_lin = 10.0 ** (k_db / 10.0)
    else:
        k_db = jnp.float32(0.0)
        k_lin = jnp.float32(0.0)
    # ZoD offset (Table 7.5-7: 0 for LOS; UMa NLOS closed form)
    if is_los:
        zod_offset = 0.0
    else:
        lgfc = _lg(fc_ghz)
        e = ((0.208 * lgfc - 0.782) * jnp.log10(jnp.maximum(25.0, d2d))
             - 0.13 * lgfc + 2.03 - 0.07 * (h_ut - 1.5))
        zod_offset = 7.66 * lgfc - 5.96 - 10.0 ** e

    # --- step 5: cluster delays -------------------------------------------
    r_tau = scn["r_tau"]
    u = jax.random.uniform(k_del, (n_cl,), minval=1e-6, maxval=1.0)
    tau_raw = -r_tau * ds * jnp.log(u)
    tau = jnp.sort(tau_raw - jnp.min(tau_raw))                    # ascending
    if is_los:
        c_tau = (0.7705 - 0.0433 * k_db + 0.0002 * k_db ** 2
                 + 0.000017 * k_db ** 3)
        tau_coeff = tau / c_tau      # used in coefficient gen (step 5 note)
    else:
        tau_coeff = tau

    # --- step 6: cluster powers -------------------------------------------
    zeta = scn["zeta_db"] * jax.random.normal(k_pow, (n_cl,))
    p_raw = jnp.exp(-tau * (r_tau - 1.0) / (r_tau * ds)) * 10.0 ** (-zeta / 10.0)
    p = p_raw / jnp.sum(p_raw)                                    # diffuse, sum 1
    if is_los:
        # powers including the specular for angle generation / ranking
        p_ang = p / (k_lin + 1.0)
        p_ang = p_ang.at[0].add(k_lin / (k_lin + 1.0))
    else:
        p_ang = p

    # --- step 7: power-coupled departure angles ---------------------------
    c_phi = _C_PHI[n_cl]
    c_theta = _C_THETA[n_cl]
    if is_los:
        c_phi = c_phi * (1.1035 - 0.028 * k_db - 0.002 * k_db ** 2
                         + 0.0001 * k_db ** 3)
        c_theta = c_theta * (1.3086 + 0.0339 * k_db - 0.0077 * k_db ** 2
                             + 0.0002 * k_db ** 3)
    # clamp: XLA may lower the division as multiply-by-reciprocal, letting
    # the max element's ratio exceed 1 by one ulp -> sqrt(-log) = NaN
    neg_log_ratio = jnp.maximum(-jnp.log(p_ang / jnp.max(p_ang)), 0.0)
    phi_p = 2.0 * (asd / 1.4) * jnp.sqrt(neg_log_ratio) / c_phi
    x_a = jax.random.rademacher(k_xa, (n_cl,), dtype=jnp.float32)
    y_a = (asd / 7.0) * jax.random.normal(k_ya, (n_cl,))
    if is_los:
        phi_cl = (x_a * phi_p + y_a) - (x_a[0] * phi_p[0] + y_a[0] - phi_los)
    else:
        phi_cl = x_a * phi_p + y_a + phi_los

    theta_p = zsd * neg_log_ratio / c_theta
    x_z = jax.random.rademacher(k_xz, (n_cl,), dtype=jnp.float32)
    y_z = (zsd / 7.0) * jax.random.normal(k_yz, (n_cl,))
    if is_los:
        theta_cl = ((x_z * theta_p + y_z)
                    - (x_z[0] * theta_p[0] + y_z[0] - theta_los))
    else:
        theta_cl = x_z * theta_p + y_z + theta_los + zod_offset

    # --- step 7/8: ray angles + random ZoD/AoD coupling -------------------
    offsets = jnp.asarray(RAY_OFFSETS_20, jnp.float32)            # [20]
    phi_ray = phi_cl[:, None] + scn["c_asd_deg"] * offsets[None, :]
    # ZoD ray spread uses (3/8)*10^mu_lgZSD (TR 38.901 eq. 7.5-20), with
    # offsets randomly permuted against the AoD offsets per cluster
    perm = jnp.argsort(jax.random.uniform(k_perm, (n_cl, n_rays)), axis=-1)
    zspread = (3.0 / 8.0) * 10.0 ** mu_lg_zsd
    theta_ray = theta_cl[:, None] + zspread * offsets[perm]
    theta_ray = _fold_zenith(theta_ray)

    # --- steps 10-11: ray coefficients ------------------------------------
    phase = jax.random.uniform(k_phase, (n_cl, n_rays),
                               minval=-jnp.pi, maxval=jnp.pi)
    diffuse_scale = 1.0 / (k_lin + 1.0) if is_los else 1.0
    amp = jnp.sqrt(p * diffuse_scale / n_rays)[:, None]           # [n_cl, 1]
    if element_pattern:
        amp = amp * _element_amp(theta_ray,
                                 _wrap_azimuth(phi_ray - boresight_az_deg))
    gain = (amp * jnp.exp(1j * phase)).astype(dtype)              # [n_cl, n_rays]

    # array steering from the true element positions
    th = jnp.radians(theta_ray)
    ph = jnp.radians(phi_ray)
    rhat = jnp.stack([jnp.sin(th) * jnp.cos(ph),
                      jnp.sin(th) * jnp.sin(ph),
                      jnp.cos(th)], axis=-1)                      # [n_cl, n_rays, 3]
    d_el = tx_pos - center                                        # [n_ant, 3]
    proj = jnp.einsum("ax,nmx->anm", d_el, rhat)                  # [n_ant, n_cl, n_rays]
    steer = jnp.exp(1j * (2.0 * jnp.pi / lam) * proj.astype(jnp.float32))
    g = gain[None, :, :] * steer.astype(dtype)                    # [n_ant, n_cl, n_rays]

    # sub-cluster tap reduction: contiguous ray groups 10/6/4 (Table 7.5-5);
    # only the two strongest clusters get nonzero sub-delay offsets, the
    # rest collapse back to a single tap at tau_n.
    v = jnp.stack([jnp.sum(g[..., s0:s1], axis=-1)
                   for s0, s1 in _SUB_SLICES], axis=-1)           # [n_ant, n_cl, 3]
    rank = jnp.argsort(jnp.argsort(-p_ang))
    is_top2 = (rank < 2).astype(jnp.float32)                      # [n_cl]
    # intra-cluster delay spread c_DS (Table 7.5-6 UMa, ns)
    c_ds = jnp.maximum(0.25, 6.5622 - 3.4084 * _lg(fc_ghz)) * 1e-9
    sub_off = jnp.asarray(_SUB_DELAY_FACTORS, jnp.float32) * c_ds
    tau_sub = tau_coeff[:, None] + is_top2[:, None] * sub_off[None, :]

    taps_v = v.reshape(v.shape[0], -1)                            # [n_ant, 3*n_cl]
    taps_tau = tau_sub.reshape(-1)
    if is_los:
        # LOS specular ray (TR 38.901 eq. 7.5-30): sqrt(K/(K+1)) at the
        # LOS departure angles, delay of the first cluster (0), phase
        # from the propagation distance.
        spec_amp = jnp.sqrt(k_lin / (k_lin + 1.0))
        if element_pattern:
            spec_amp = spec_amp * _element_amp(
                theta_los, _wrap_azimuth(phi_los - boresight_az_deg))
        rhat_los = diff / d3d
        proj_los = d_el @ rhat_los                                # [n_ant]
        spec = (spec_amp
                * jnp.exp(1j * ((2.0 * jnp.pi / lam) * proj_los
                                - 2.0 * jnp.pi * d3d / lam))).astype(dtype)
        taps_v = jnp.concatenate([taps_v, spec[:, None]], axis=-1)
        taps_tau = jnp.concatenate([taps_tau, jnp.zeros((1,))])

    return taps_v, taps_tau


def gscm_channel(key: Array, tx_pos: Array, rx_pos: Array, freqs: Array,
                 scenario: str = "uma_los", skip_attenuation: bool = False,
                 tx_gain_db: float = 0.0, rx_gain_db: float = 0.0,
                 element_pattern: bool = True,
                 boresight_az_deg: float = 90.0,
                 dtype=jnp.complex64) -> Array:
    """One TR 38.901 drop: ``[n_ant, n_fft]`` frequency-domain MISO
    channel at the element positions ``tx_pos`` (``[n_ant, 3]``, meters)
    toward a single-antenna RX at ``rx_pos`` (``[3]``).

    ``boresight_az_deg`` is the element boresight azimuth (degrees from
    the +x axis). The default 90 deg is the broadside of the canonical
    x-axis ULA — the same 45 deg LOS-to-boresight offset the reference's
    MATLAB geometry realizes (its y-axis '3gpp-3d' ULA faces +x with the
    RX at 45 deg azimuth, ``qd_channel_env_setup.m:23-28``).

    Every call is an independent drop, exactly like each
    ``qd_get_channel_mat`` call of the reference (fresh LSPs, clusters,
    ray phases); per-frame rerolling is a new ``key``/``rx_pos``.
    """
    taps_v, taps_tau = gscm_taps(key, tx_pos, rx_pos, jnp.mean(freqs),
                                 scenario=scenario,
                                 element_pattern=element_pattern,
                                 boresight_az_deg=boresight_az_deg,
                                 dtype=dtype)
    # frequency response: [n_ant, n_taps] @ [n_taps, n_fft]
    ef = jnp.exp(-2j * jnp.pi * freqs[None, :]
                 * taps_tau[:, None]).astype(dtype)               # [n_taps, n_fft]
    h = taps_v @ ef

    if not skip_attenuation:
        d = _distances(tx_pos, rx_pos)
        h = h * _fs_attenuation(d, freqs, tx_gain_db, rx_gain_db)
    return h.astype(dtype)
