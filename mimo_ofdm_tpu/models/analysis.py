"""Spatial/spectral distortion analysis: Bussgang split, SDR, beampatterns,
Welch PSD.

TPU-native rebuild of the beampattern/SDR experiment family
(``reference/main_beampatterns_plotting/main_mrt_precoding_radiation_pattern.py:95-210``,
``main_sdr_vs_ibo_vs_channel.py``): instead of a Python loop over 181
evaluation points x 100 snapshots, points and snapshots are batch axes of
one jitted computation (chunked with ``lax.map`` over points to bound
memory).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from mimo_ofdm_tpu.ops import ofdm
from mimo_ofdm_tpu.models import agc as agc_mod
from mimo_ofdm_tpu.models import channels, geometry, precoding, transmit
from mimo_ofdm_tpu.models.link import link_static, make_channel_fn
from mimo_ofdm_tpu.utils.config import LinkConfig


def bussgang_split(rx_fd: Array, clean_fd: Array, ak_vect: Array):
    """Per-antenna Bussgang decomposition at the receiver:
    ``desired = a_k o clean``, ``distortion = rx - a_k o clean``
    (``reference/main_beampatterns_plotting/main_mrt_precoding_radiation_pattern.py:149-151``).
    ``rx_fd``/``clean_fd``: ``[..., n_ant, n_bins]``; ``ak_vect``: ``[n_ant]``."""
    a = ak_vect[..., :, None].astype(clean_fd.dtype)
    desired = a * clean_fd
    return desired, rx_fd - desired


def welch_psd(x: Array, nfft: int, nperseg: int, fs: float | None = None):
    """Two-sided Welch PSD matching ``scipy.signal.welch(x, fs=nfft,
    nfft=nfft, nperseg=nperseg, return_onesided=False)`` as used by the
    reference (``main_mrt_precoding_radiation_pattern.py:181-200``):
    Hann window, 50% overlap, per-segment mean removal (constant detrend).
    Returns ``(freqs, psd)`` in FFT order."""
    if fs is None:
        fs = float(nfft)
    step = nperseg - nperseg // 2
    n_seg = max(1, (x.shape[-1] - nperseg) // step + 1)
    idx = np.arange(n_seg)[:, None] * step + np.arange(nperseg)[None, :]
    segs = x[..., idx]                                    # [..., n_seg, nperseg]
    segs = segs - jnp.mean(segs, axis=-1, keepdims=True)  # constant detrend
    win = jnp.asarray(_scipy_hann(nperseg))
    scale = 1.0 / (fs * jnp.sum(win ** 2))
    spec = jnp.fft.fft(segs * win, n=nfft, axis=-1)
    psd = scale * jnp.mean(jnp.abs(spec) ** 2, axis=-2)
    freqs = jnp.fft.fftfreq(nfft, d=1.0 / fs)
    return freqs, psd


def _scipy_hann(n: int) -> np.ndarray:
    """scipy's symmetric-periodic "hann" window as used by ``welch``
    (periodic, sym=False)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


class BeampatternResult(NamedTuple):
    angles_rad: np.ndarray       # [n_points+1] evaluation angles
    desired_pow: Array           # [n_points+1] summed desired power
    distortion_pow: Array        # [n_points+1] summed distortion power

    @property
    def sdr_db(self):
        return 10.0 * jnp.log10(self.desired_pow / self.distortion_pow)


def beampattern_scan(cfg: LinkConfig, key: Array, *, precoding_angle_deg: float = 45.0,
                     n_points: int = 180, n_snapshots: int = 16,
                     radial_distance: float = 300.0, point_chunk: int = 16,
                     dtype=jnp.complex64) -> BeampatternResult:
    """Desired vs distortion radiation pattern of a precoded array
    (``reference/main_beampatterns_plotting/main_mrt_precoding_radiation_pattern.py:117-173``):

    1. precode (MRT) toward the point at ``precoding_angle_deg`` on a
       semicircle of ``radial_distance``;
    2. for every one of ``n_points+1`` semicircle points, transmit
       ``n_snapshots`` random frames with and without PA distortion,
       propagate per antenna (no combine), Bussgang-split with the
       per-antenna ``a_k`` and accumulate data-subcarrier powers.
    """
    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements
    ibo_db = cfg.pa.ibo_db

    tx_pos, freqs, _ = link_static(cfg, dtype)
    pts2d = geometry.pts_on_semicircum(radial_distance, n_points)
    pts = np.concatenate([pts2d, np.full((len(pts2d), 1), cfg.rx.cord_z)], axis=1)
    angles = np.radians(np.linspace(-90, 90, n_points + 1))

    prec_idx = int(n_points / 180 * precoding_angle_deg)
    prec_pos = jnp.asarray(pts[prec_idx], jnp.float32)

    h_prec = channels.los_channel(tx_pos, prec_pos, freqs, dtype=dtype)
    h_prec_sc = ofdm.extract_subcarriers(h_prec, n_sc)
    v = precoding.mrt_precoder(h_prec_sc)
    sat_pow = precoding.pa_sat_power(ibo_db, cfg.modem.avg_sample_power, v)
    vk_pow = precoding.precoding_power_per_antenna(v)
    ak_vect = precoding.per_antenna_alpha(ibo_db, vk_pow, n_sc, n_ant)

    snap_keys = jax.random.split(key, n_snapshots)

    def one_point(rx_pos):
        h = channels.los_channel(tx_pos, rx_pos, freqs, dtype=dtype)

        def one_snap(k):
            bits = jax.random.bernoulli(k, 0.5,
                                        (cfg.modem.n_bits_per_ofdm_sym,)).astype(jnp.int8)
            fd_dist, fd_clean = transmit.array_transmit_fd(
                bits, constel_size=m, n_fft=n_fft, v=v, pa_model=cfg.pa.model,
                sat_power=sat_pow, return_clean=True, dtype=dtype)
            rx = channels.propagate(h, fd_dist, sum_signals=False)
            rx_clean = channels.propagate(h, fd_clean, sum_signals=False)
            rx_sc = ofdm.extract_subcarriers(rx, n_sc)
            cl_sc = ofdm.extract_subcarriers(rx_clean, n_sc)
            desired, distortion = bussgang_split(rx_sc, cl_sc, ak_vect)
            d_pow = jnp.sum(jnp.abs(jnp.sum(desired, axis=0)) ** 2)
            e_pow = jnp.sum(jnp.abs(jnp.sum(distortion, axis=0)) ** 2)
            return d_pow, e_pow

        d, e = jax.vmap(one_snap)(snap_keys)
        return jnp.sum(d), jnp.sum(e)

    d_pow, e_pow = jax.lax.map(jax.jit(one_point), jnp.asarray(pts, jnp.float32),
                               batch_size=point_chunk)
    return BeampatternResult(angles_rad=angles, desired_pow=d_pow,
                             distortion_pow=e_pow)


class RadiationPatternResult(NamedTuple):
    angles_deg: np.ndarray        # [n_points+1] scan angles (0..180)
    desired_pow: np.ndarray       # [n_points+1] summed desired SC power
    distortion_pow: np.ndarray    # [n_points+1] summed distortion SC power
    # Welch PSDs at the precoding angle and the selected angle:
    # angle_deg -> (freqs, psd_desired, psd_distortion), FFT bin order
    psd: dict


def radiation_pattern(cfg: LinkConfig, key: Array, *,
                      precoding_angle_deg: float = 45.0,
                      precoding_angles_deg=None,
                      psd_angle_deg: float = 78.0, n_points: int = 180,
                      n_snapshots: int = 100, radial_distance: float = 300.0,
                      psd_nfft: int | None = None, n_samp_per_seg: int = 1024,
                      point_chunk: int = 4, snap_chunk: int = 10,
                      dtype=jnp.complex64) -> RadiationPatternResult:
    """Full reproduction of the reference's MRT radiation-pattern scan
    including the per-angle Welch PSDs
    (``reference/main_beampatterns_plotting/main_mrt_precoding_radiation_pattern.py:30-266``):

    1. MRT-precode toward the semicircle point at ``precoding_angle_deg``
       (0..180 scan convention, index ``n_points/180*angle``);
    2. at each of ``n_points+1`` points transmit ``n_snapshots`` random
       frames with/without PA distortion, propagate per antenna without
       combining, Bussgang-split with the per-antenna ``a_k`` and
       accumulate desired/distortion data-subcarrier powers (``:131-173``);
    3. at the precoding point and at ``psd_angle_deg`` build the full-band
       combined desired (``sum_ant a_k H clean``) and distortion
       (``sum_ant (rx - a_k H clean)``) signals, convert each snapshot to
       time domain (ortho IFFT) and Welch them over the concatenated
       stream (fs = nfft, Hann, 50% overlap, ``:181-200``).

    Channel semantics per model (``:99-128``): LOS/two-path are
    deterministic per point; Rayleigh draws fresh IID fades per point but
    keeps the free-space attenuation frozen at the *construction* RX
    position (212, 212, 1.5) — ``reference/channel.py:217-229,262-275`` —
    and the precoding point reuses the precoding draw exactly.

    ``precoding_angles_deg`` switches to joint multi-user MRT toward
    several semicircle angles (one independent frame per user, summed
    transmit) — the committed ``multiuser_mrt_sig_powers_vs_angle_*`` /
    ``multiuser_psd_mrt_*`` study (3 users at 45/120/150 deg, two-path;
    consumer ``reference/msc_figures/multiuser_mrt_precoding.py:30-70``).
    The first angle doubles as the PSD "precoding point".
    """
    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements
    ibo_db = cfg.pa.ibo_db
    model = cfg.channel.model
    if psd_nfft is None:
        psd_nfft = n_fft
    if precoding_angles_deg is None:
        precoding_angles_deg = (precoding_angle_deg,)
    n_usr = len(precoding_angles_deg)

    while n_snapshots % snap_chunk:
        snap_chunk -= 1

    tx_pos, freqs, rx_base = link_static(cfg, dtype)
    pts2d = geometry.pts_on_semicircum(radial_distance, n_points)
    pts = np.concatenate([pts2d, np.full((len(pts2d), 1), cfg.rx.cord_z)],
                         axis=1)
    angles_deg = np.linspace(0.0, 180.0, n_points + 1)
    prec_idxs = [int(round(n_points / 180.0 * a)) for a in precoding_angles_deg]
    prec_idx = prec_idxs[0]
    sel_idx = int(round(n_points / 180.0 * psd_angle_deg))
    pts_j = jnp.asarray(pts, jnp.float32)

    k_chan, k_bits = jax.random.split(key)

    def point_channel(idx, rx_pos):
        """Channel at scan point ``idx`` (full n_fft grid)."""
        if model in ("los", "two_path"):
            return _point_channel(model, None, tx_pos, rx_pos, freqs, dtype)
        if model == "rayleigh":
            # fades per point; attenuation frozen at the construction
            # position rx_base (reference/channel.py:217-229)
            return channels.rayleigh_channel(
                jax.random.fold_in(k_chan, idx), tx_pos, rx_base, freqs,
                dtype=dtype)
        raise ValueError(f"unsupported channel for radiation pattern: {model}")

    @jax.jit
    def scan_powers():
        h_prec = point_channel(prec_idx, pts_j[prec_idx])
        if n_usr == 1:
            v = precoding.mrt_precoder(ofdm.extract_subcarriers(h_prec, n_sc))
        else:
            h_usr = jnp.stack([point_channel(i, pts_j[i]) for i in prec_idxs])
            v = precoding.make_precoder("mrt", n_users=n_usr)(
                ofdm.extract_subcarriers(h_usr, n_sc))  # [n_ant, n_usr, n_sc]
        sat_pow = precoding.pa_sat_power(ibo_db, cfg.modem.avg_sample_power, v)
        vk_pow = precoding.precoding_power_per_antenna(v)
        ak = precoding.per_antenna_alpha(ibo_db, vk_pow, n_sc, n_ant)

        def snap_fd(k):
            """One random frame through the PA array: distorted + clean
            full-band FD [n_ant, n_fft]."""
            shape = ((cfg.modem.n_bits_per_ofdm_sym,) if n_usr == 1
                     else (n_usr, cfg.modem.n_bits_per_ofdm_sym))
            bits = jax.random.bernoulli(k, 0.5, shape).astype(jnp.int8)
            return transmit.array_transmit_fd(
                bits, constel_size=m, n_fft=n_fft, v=v, pa_model=cfg.pa.model,
                sat_power=sat_pow, return_clean=True, dtype=dtype)

        def one_point(args):
            idx, rx_pos = args
            h = point_channel(0, rx_pos) if model in ("los", "two_path") \
                else jnp.where(idx == prec_idx, h_prec,
                               point_channel_dyn(idx))
            h_sc = ofdm.extract_subcarriers(h, n_sc)

            def snap_chunk_pow(carry, ks):
                d_acc, e_acc = carry
                fd_dist, fd_clean = jax.vmap(snap_fd)(ks)
                rx_sc = ofdm.extract_subcarriers(fd_dist, n_sc) * h_sc
                cl_sc = ofdm.extract_subcarriers(fd_clean, n_sc) * h_sc
                desired, distortion = bussgang_split(rx_sc, cl_sc, ak)
                d = jnp.sum(jnp.abs(jnp.sum(desired, axis=-2)) ** 2)
                e = jnp.sum(jnp.abs(jnp.sum(distortion, axis=-2)) ** 2)
                return (d_acc + d, e_acc + e), 0.0

            keys = jax.random.split(jax.random.fold_in(k_bits, idx),
                                    n_snapshots)
            keys = keys.reshape(n_snapshots // snap_chunk, snap_chunk)
            (d, e), _ = jax.lax.scan(snap_chunk_pow,
                                     (jnp.zeros(()), jnp.zeros(())), keys)
            return d, e

        def point_channel_dyn(idx):
            # rayleigh: position-independent draw keyed by point index
            return channels.rayleigh_channel(
                jax.random.fold_in(k_chan, idx), tx_pos, rx_base, freqs,
                dtype=dtype)

        d_pow, e_pow = jax.lax.map(one_point,
                                   (jnp.arange(n_points + 1), pts_j),
                                   batch_size=point_chunk)

        # --- per-angle PSD signals at the precoding + selected points ---
        def psd_at(idx):
            h = point_channel(idx, pts_j[idx]) if model in ("los", "two_path") \
                else jnp.where(idx == prec_idx, h_prec, point_channel_dyn(idx))

            def one_snap_td(k):
                fd_dist, fd_clean = snap_fd(k)
                rx = fd_dist * h
                cl = fd_clean * h
                a = ak[:, None].astype(cl.dtype)
                desired = jnp.sum(a * cl, axis=0)
                distortion = jnp.sum(rx - a * cl, axis=0)
                return (jnp.fft.ifft(desired, norm="ortho"),
                        jnp.fft.ifft(distortion, norm="ortho"))

            keys = jax.random.split(jax.random.fold_in(k_bits, idx),
                                    n_snapshots)
            des_td, dist_td = jax.lax.map(one_snap_td, keys,
                                          batch_size=snap_chunk)
            f, p_des = welch_psd(des_td.ravel(), psd_nfft, n_samp_per_seg)
            _, p_dist = welch_psd(dist_td.ravel(), psd_nfft, n_samp_per_seg)
            return f, p_des, p_dist

        psd_prec = psd_at(prec_idx)
        psd_sel = psd_at(sel_idx)
        return d_pow, e_pow, psd_prec, psd_sel

    d_pow, e_pow, psd_prec, psd_sel = scan_powers()
    psd = {
        float(precoding_angle_deg): tuple(np.asarray(x) for x in psd_prec),
        float(psd_angle_deg): tuple(np.asarray(x) for x in psd_sel),
    }
    return RadiationPatternResult(angles_deg=angles_deg,
                                  desired_pow=np.asarray(d_pow),
                                  distortion_pow=np.asarray(e_pow),
                                  psd=psd)


def mu_sinr_sdr(cfg: LinkConfig, key: Array, user_positions, *,
                n_snapshots: int = 16, precoding_kind: str = "mrt",
                dtype=jnp.complex64):
    """Per-user SDR and SINR of the nonlinearly-distorted MU downlink
    (the per-user SDR measurement of
    ``reference/main_multiuser/main_multiuser_cnc_ber_vs_ebn0.py:184-258``):

    * ``SDR_u``  = P(desired_u) / P(total received − all users' desired)
      — distortion only (inter-user linear terms excluded),
    * ``SINR_u`` = P(desired_u) / P(total received − desired_u)
      — distortion + inter-user interference.

    ``desired_u`` is the Bussgang linear part of user u's own signal:
    ``sum_ant a_k H_u V_u s_u``. Returns ``(sdr_db [n_usr],
    sinr_db [n_usr])``.
    """
    import numpy as np_
    from mimo_ofdm_tpu.models.link import link_static

    m, n_fft, n_sc = (cfg.modem.constel_size, cfg.modem.n_fft,
                      cfg.modem.n_sub_carr)
    n_ant = cfg.array.n_elements
    n_usr = len(user_positions)
    ibo_db = cfg.pa.ibo_db
    tx_pos, freqs, _ = link_static(cfg, dtype)
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)

    h_usr = jnp.stack([
        channels.los_channel(tx_pos, jnp.asarray(p, jnp.float32), freqs_sc,
                             dtype=dtype) for p in np_.asarray(user_positions)])
    precoder = precoding.make_precoder(precoding_kind, n_users=n_usr)
    v = precoder(h_usr)                                    # [n_ant, n_usr, n_sc]
    sat = precoding.pa_sat_power(ibo_db, cfg.modem.avg_sample_power, v)
    vk_pow = precoding.precoding_power_per_antenna(v)
    ak = precoding.per_antenna_alpha(ibo_db, vk_pow, n_sc, n_ant)
    # effective per-user linear gain g_u[sc] = sum_ant a_k H_u V_u
    g = jnp.einsum("a,uas,aus->us", ak.astype(dtype), h_usr, v)

    def one_snap(k):
        bits = jax.random.bernoulli(
            k, 0.5, (n_usr, cfg.modem.n_bits_per_ofdm_sym)).astype(jnp.int8)
        from mimo_ofdm_tpu.ops import qam
        sym = qam.modulate_bits(bits, m, dtype)            # [n_usr, n_sc]
        fd_dist = transmit.array_transmit_fd(
            bits, constel_size=m, n_fft=n_fft, v=v, pa_model=cfg.pa.model,
            sat_power=sat, dtype=dtype)
        fd_sc = ofdm.extract_subcarriers(fd_dist, n_sc)
        rx = jnp.einsum("uas,as->us", h_usr, fd_sc)        # per-user received
        desired = g * sym                                  # [n_usr, n_sc]
        p_des = jnp.sum(jnp.abs(desired) ** 2, axis=-1)
        # total linear part of *all* users at user u's receiver
        g_cross = jnp.einsum("a,uas,avs->uvs", ak.astype(dtype), h_usr, v)
        lin_all = jnp.einsum("uvs,vs->us", g_cross, sym)
        p_dist = jnp.sum(jnp.abs(rx - lin_all) ** 2, axis=-1)
        p_intf_dist = jnp.sum(jnp.abs(rx - desired) ** 2, axis=-1)
        return p_des, p_dist, p_intf_dist

    p_des, p_dist, p_id = jax.vmap(one_snap)(jax.random.split(key, n_snapshots))
    sdr = 10.0 * jnp.log10(jnp.sum(p_des, 0) / jnp.sum(p_dist, 0))
    sinr = 10.0 * jnp.log10(jnp.sum(p_des, 0) / jnp.sum(p_id, 0))
    return sdr, sinr


def _point_channel(model: str, key: Array, tx_pos: Array, rx_pos: Array,
                   freqs: Array, dtype=jnp.complex64) -> Array:
    """Channel matrix at one evaluation point for the spatial scans
    (the per-point ``calc_channel_mat``/``reroll_channel_coeffs`` switch of
    ``reference/main_multiuser/multiuser_channel_mat_correlation.py:95-105``)."""
    if model == "los":
        return channels.los_channel(tx_pos, rx_pos, freqs, dtype=dtype)
    if model == "two_path":
        return channels.two_path_channel(tx_pos, rx_pos, freqs, dtype=dtype)
    if model == "rayleigh":
        return channels.rayleigh_channel(key, tx_pos, rx_pos, freqs, dtype=dtype)
    raise ValueError(f"unsupported channel model for spatial scan: {model}")


def channel_correlation(h_ref: Array, h_test: Array) -> Array:
    """Correlation coefficient between two MISO channel matrices
    ``[..., n_ant, n_bins]``:

    ``trace(|H_ref^T conj(H_test)|) / sqrt(||H_ref||_F^2 ||H_test||_F^2)``
    (``reference/main_multiuser/multiuser_channel_mat_correlation.py:108-112``)
    — computed directly as the per-bin antenna inner product instead of the
    reference's dense ``[n_bins, n_bins]`` matmul (only the diagonal is
    traced, so the off-diagonal FLOPs are dead work)."""
    nomin = jnp.sum(jnp.abs(jnp.sum(h_ref * jnp.conj(h_test), axis=-2)),
                    axis=-1)
    denom = jnp.sqrt(jnp.sum(jnp.abs(h_ref) ** 2, axis=(-2, -1))
                     * jnp.sum(jnp.abs(h_test) ** 2, axis=(-2, -1)))
    return nomin / denom


def channel_mat_correlation_scan(cfg: LinkConfig, key: Array, *,
                                 main_usr_angle_deg: float = 45.0,
                                 main_user_dist: float = 300.0,
                                 n_points: int = 180, point_chunk: int = 32,
                                 dtype=jnp.complex64):
    """Channel-matrix correlation vs angle: correlate the channel of the
    main user (at ``main_usr_angle_deg`` on a semicircle of radius
    ``main_user_dist``) against the channel at every semicircle point
    (``reference/main_multiuser/multiuser_channel_mat_correlation.py``).
    The sharper the decorrelation around the main angle, the better the
    array separates users spatially. Returns ``(angles_deg [n_points+1],
    corr [n_points+1])``.

    For stochastic channels every off-main point is an independent fade
    draw while the main point reuses the main user's matrix exactly (the
    reference's ``isclose`` position check, ``:101-105``)."""
    model = cfg.channel.model
    tx_pos, freqs, _ = link_static(cfg, dtype)
    pts2d = geometry.pts_on_semicircum(main_user_dist, n_points)
    pts = np.concatenate([pts2d, np.full((len(pts2d), 1), cfg.rx.cord_z)],
                         axis=1)
    angles_deg = np.linspace(0.0, 180.0, n_points + 1)
    main_idx = int(round(n_points / 180.0 * main_usr_angle_deg))
    main_pos = jnp.asarray(pts[main_idx], jnp.float32)

    # One jit around the whole scan: complex intermediates (the channel
    # matrices) must never round-trip to host on this TPU transport
    # (eager complex construction/transfer is unsupported — see CLAUDE.md).
    @jax.jit
    def scan(key, pts_arr):
        h_main = _point_channel(model, jax.random.fold_in(key, n_points + 1),
                                tx_pos, main_pos, freqs, dtype)

        def one_point(args):
            idx, rx_pos = args
            h = _point_channel(model, jax.random.fold_in(key, idx), tx_pos,
                               rx_pos, freqs, dtype)
            h = jnp.where(idx == main_idx, h_main, h)
            return channel_correlation(h_main, h)

        return jax.lax.map(one_point,
                           (jnp.arange(n_points + 1), pts_arr),
                           batch_size=point_chunk)

    corr = scan(key, jnp.asarray(pts, jnp.float32))
    return angles_deg, corr


def spatial_correlation_scan(cfg: LinkConfig, key: Array, *,
                             main_usr_angle_deg: float = 45.0,
                             main_user_dist: float = 300.0,
                             n_points: int = 36, dtype=jnp.complex64):
    """Beampattern (spatial) correlation vs precoding angle
    (``reference/main_multiuser/multiuser_channel_spatial_correlation.py``):
    for every semicircle point, MRT-precode toward it, measure the *clean*
    (undistorted) received power at all semicircle points, and correlate
    that beampattern with the beampattern precoded toward the main user.
    Returns ``(angles_deg [n_points+1], corr [n_points+1])``.

    TPU-native formulation: the clean FD signal equals the precoded symbols
    in the data bins (the IFFT→FFT round trip of the reference's
    ``transmit``/``propagate`` chain is the identity), so the full
    ``[n_angles, n_points]`` beampattern matrix is one einsum over
    ``[P, n_ant, n_sc]`` channel and precoder stacks instead of the
    reference's O(n_points^2) Python transmit loop."""
    from mimo_ofdm_tpu.ops import qam

    model = cfg.channel.model
    m, n_sc = cfg.modem.constel_size, cfg.modem.n_sub_carr
    tx_pos, freqs, _ = link_static(cfg, dtype)
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)
    pts2d = geometry.pts_on_semicircum(main_user_dist, n_points)
    pts = jnp.asarray(
        np.concatenate([pts2d, np.full((len(pts2d), 1), cfg.rx.cord_z)],
                       axis=1), jnp.float32)
    angles_deg = np.linspace(0.0, 180.0, n_points + 1)
    main_idx = int(round(n_points / 180.0 * main_usr_angle_deg))

    # Single jit for the whole O(P^2) scan — complex intermediates stay
    # on device (no eager complex ops / host transfers, see CLAUDE.md).
    @jax.jit
    def scan(key):
        k_bits, k_chan = jax.random.split(key)
        # same frame for every precoding angle (the reference resets its bit
        # rng to the same seed per angle,
        # multiuser_channel_spatial_correlation.py:109)
        bits = jax.random.bernoulli(
            k_bits, 0.5, (cfg.modem.n_bits_per_ofdm_sym,)).astype(jnp.int8)
        sym = qam.modulate_bits(bits, m, dtype)

        def beampattern_for(q):
            """Clean beampattern [n_points+1] when precoding toward point q."""
            kq = jax.random.fold_in(k_chan, q)
            h_prec = _point_channel(model, jax.random.fold_in(kq, 0), tx_pos,
                                    pts[q], freqs_sc, dtype)
            v = precoding.mrt_precoder(h_prec)             # [n_ant, n_sc]
            x = v * sym                                    # clean FD data bins

            def meas(p):
                h = _point_channel(model, jax.random.fold_in(kq, p + 1),
                                   tx_pos, pts[p], freqs_sc, dtype)
                h = jnp.where(p == q, h_prec, h)
                return jnp.sum(jnp.abs(jnp.sum(h * x, axis=0)) ** 2)

            return jax.vmap(meas)(jnp.arange(n_points + 1))

        b = jax.lax.map(beampattern_for, jnp.arange(n_points + 1),
                        batch_size=8)                      # [P, P]
        b_main = b[main_idx]
        return (b @ b_main) / (jnp.linalg.norm(b, axis=-1)
                               * jnp.linalg.norm(b_main))

    return angles_deg, scan(key)


def sdr_at_point(cfg: LinkConfig, key: Array, rx_pos, n_snapshots: int = 16,
                 reroll: bool = True, snap_chunk: int = 16,
                 dtype=jnp.complex64) -> Array:
    """Signal-to-distortion ratio at one RX point (summed combine),
    the per-(IBO, channel) measurement of
    ``reference/main_beampatterns_plotting/main_sdr_vs_ibo_vs_channel.py``:
    every snapshot rerolls the channel (position ±loc_var/2 for
    LOS/two-path, fresh fades for Rayleigh — ``:103-117``), re-precodes
    and re-derives the per-antenna alphas, and the returned SDR is the
    **average of the per-snapshot dB ratios** (``:147-157``)."""
    return sdr_vs_ibo_curve(cfg, key, jnp.asarray([cfg.pa.ibo_db]), rx_pos,
                            n_snapshots=n_snapshots, reroll=reroll,
                            snap_chunk=snap_chunk, dtype=dtype)[0]


def make_sdr_fn(cfg: LinkConfig, rx_pos, *, n_snapshots: int = 500,
                reroll: bool = True, snap_chunk: int = 16,
                dtype=jnp.complex64):
    """Jitted ``(key, ibo_values[k]) -> sdr_db[k]`` for one (array,
    channel) configuration — IBO is a *traced* argument so a whole IBO
    sweep shares one compile (the reference's inner IBO loop,
    ``main_sdr_vs_ibo_vs_channel.py:88``)."""
    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements
    tx_pos, freqs, _ = link_static(cfg, dtype)
    rx_pos = jnp.asarray(rx_pos, jnp.float32)
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)
    chan_fn = make_channel_fn(cfg, freqs_sc, rx_pos, reroll=reroll,
                              dtype=dtype)

    @jax.jit
    def run(key, ibo_values):
        def one_ibo(args):
            idx, ibo_db = args

            def one_snap(k):
                k_chan, k_bits = jax.random.split(k)
                h_sc = chan_fn(k_chan, tx_pos)
                v = precoding.mrt_precoder(h_sc)
                sat_pow = precoding.pa_sat_power(
                    ibo_db, cfg.modem.avg_sample_power, v)
                vk_pow = precoding.precoding_power_per_antenna(v)
                ak = precoding.per_antenna_alpha(ibo_db, vk_pow, n_sc, n_ant)
                bits = jax.random.bernoulli(
                    k_bits, 0.5,
                    (cfg.modem.n_bits_per_ofdm_sym,)).astype(jnp.int8)
                fd_dist, fd_clean = transmit.array_transmit_fd(
                    bits, constel_size=m, n_fft=n_fft, v=v,
                    pa_model=cfg.pa.model, sat_power=sat_pow,
                    return_clean=True, dtype=dtype)
                rx_sc = ofdm.extract_subcarriers(fd_dist, n_sc) * h_sc
                cl_sc = ofdm.extract_subcarriers(fd_clean, n_sc) * h_sc
                desired, distortion = bussgang_split(rx_sc, cl_sc, ak)
                d = jnp.sum(jnp.abs(jnp.sum(desired, axis=0)) ** 2)
                e = jnp.sum(jnp.abs(jnp.sum(distortion, axis=0)) ** 2)
                return d / e

            keys = jax.random.split(jax.random.fold_in(key, idx),
                                    n_snapshots)
            ratios = jax.lax.map(one_snap, keys, batch_size=snap_chunk)
            # dB-mean matches the reference script's live code
            # (``main_sdr_vs_ibo_vs_channel.py:147,153``); the linear mean
            # matches its *committed* CSV (which stores raw ratios)
            return (jnp.mean(10.0 * jnp.log10(ratios)), jnp.mean(ratios))

        n = ibo_values.shape[0]
        return jax.lax.map(one_ibo, (jnp.arange(n), ibo_values))

    return run


def sdr_vs_ibo_curve(cfg: LinkConfig, key: Array, ibo_values, rx_pos, *,
                     n_snapshots: int = 500, reroll: bool = True,
                     snap_chunk: int = 16,
                     dtype=jnp.complex64) -> tuple[np.ndarray, np.ndarray]:
    """``(sdr_db, sdr_linear)`` per IBO value for one (array, channel)
    config — one compile for the whole IBO grid. ``sdr_db`` is the
    snapshot dB-mean (the reference script's live convention), the linear
    row is the snapshot mean of raw ratios (the units of its committed
    ``sdr_vs_ibo_per_channel_*`` CSV)."""
    run = make_sdr_fn(cfg, rx_pos, n_snapshots=n_snapshots, reroll=reroll,
                      snap_chunk=snap_chunk, dtype=dtype)
    db, lin = run(key, jnp.asarray(ibo_values, jnp.float32))
    return np.asarray(db), np.asarray(lin)


def mu_angle_overlap_scan(cfg: LinkConfig, key: Array, *,
                          main_angle_deg: float = 60.0,
                          user_dist: float = 300.0, n_points: int = 180,
                          n_snapshots: int = 2, point_chunk: int = 8,
                          dtype=jnp.complex64):
    """Two-user SDR vs the secondary user's azimuth angle
    (``reference/main_multiuser/main_two_users_sdr_vs_angle_overlap.py``
    and the worst-case study ``main_two_users_wc_angle_vs_precoding_angle
    .py``): the main user sits at ``main_angle_deg`` on a semicircle of
    radius ``user_dist``; the secondary user is placed at each of
    ``n_points + 1`` semicircle points. Per point the two-user MRT
    precoder is recomputed (``:134-141``), the constant-IBO per-antenna
    alphas re-derived (``:141-146``), and the per-user SDR measured over
    ``n_snapshots`` OFDM symbols with the script's convention
    (``:148-175``): desired = Bussgang-scaled *combined* clean signal of
    both users through user u's channel, distortion = received minus that,
    powers summed over snapshots before the ratio. Also returns the
    channel-correlation coefficient per point (``:125-131``).

    Returns ``(angles_deg [n_points+1], corr [n_points+1],
    sdr_db [2, n_points+1])`` (row 0 = main user, 1 = secondary).
    """
    model = cfg.channel.model
    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements
    ibo_db = cfg.pa.ibo_db
    tx_pos, freqs, _ = link_static(cfg, dtype)
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)
    pts2d = geometry.pts_on_semicircum(user_dist, n_points)
    pts = np.concatenate([pts2d, np.full((len(pts2d), 1), cfg.rx.cord_z)],
                         axis=1)
    angles_deg = np.linspace(0.0, 180.0, n_points + 1)
    main_pos = np.array([np.cos(np.deg2rad(main_angle_deg)) * user_dist,
                         np.sin(np.deg2rad(main_angle_deg)) * user_dist,
                         cfg.rx.cord_z], np.float32)

    @jax.jit
    def scan(key, pts_arr):
        h_main = _point_channel(model, jax.random.fold_in(key, n_points + 1),
                                tx_pos, jnp.asarray(main_pos), freqs_sc,
                                dtype)

        def one_point(args):
            idx, rx_pos = args
            h_sec = _point_channel(model, jax.random.fold_in(key, idx),
                                   tx_pos, rx_pos, freqs_sc, dtype)
            corr = channel_correlation(h_main, h_sec)
            h_mu = jnp.stack([h_main, h_sec])              # [2, n_ant, n_sc]
            v = precoding.mu_mrt_precoder(h_mu)            # [n_ant, 2, n_sc]
            sat = precoding.pa_sat_power(ibo_db, cfg.modem.avg_sample_power,
                                         v)
            vk_pow = precoding.precoding_power_per_antenna(v)
            ak = precoding.per_antenna_alpha(ibo_db, vk_pow, n_sc, n_ant)
            akc = ak[:, None].astype(dtype)

            def one_snap(k):
                bits = jax.random.bernoulli(
                    k, 0.5,
                    (2, cfg.modem.n_bits_per_ofdm_sym)).astype(jnp.int8)
                fd_dist, fd_clean = transmit.array_transmit_fd(
                    bits, constel_size=m, n_fft=n_fft, v=v,
                    pa_model=cfg.pa.model, sat_power=sat, return_clean=True,
                    dtype=dtype)
                dist_sc = ofdm.extract_subcarriers(fd_dist, n_sc)
                cl_sc = ofdm.extract_subcarriers(fd_clean, n_sc)

                def per_user(h_u):
                    rx = dist_sc * h_u
                    cl = akc * cl_sc * h_u
                    d = jnp.sum(jnp.abs(jnp.sum(cl, axis=0)) ** 2)
                    e = jnp.sum(jnp.abs(jnp.sum(rx - cl, axis=0)) ** 2)
                    return d, e

                return jax.vmap(per_user)(h_mu)

            d, e = jax.vmap(one_snap)(
                jax.random.split(jax.random.fold_in(key, 7000 + idx),
                                 n_snapshots))
            return corr, 10.0 * jnp.log10(jnp.sum(d, 0) / jnp.sum(e, 0))

        return jax.lax.map(one_point,
                           (jnp.arange(n_points + 1), pts_arr),
                           batch_size=point_chunk)

    corr, sdr = scan(key, jnp.asarray(pts, jnp.float32))
    return angles_deg, np.asarray(corr), np.asarray(sdr).T


def make_mu_nusers_sdr_fn(cfg: LinkConfig, n_users: int, *,
                          radial_dist: float = 300.0,
                          angular_margin: float = 10.0,
                          n_snapshots: int = 100, snap_chunk: int = 8,
                          dtype=jnp.complex64):
    """Jitted ``(key, ibo_values[k]) -> sdr_db [k, n_users]`` for the
    MU SDR-vs-IBO-vs-user-count study (``reference/main_multiuser/
    main_multiuser_sdr_vs_ibo_vs_n_users.py``). Every snapshot draws
    fresh user angles with the reference's sequential spacing scheme
    (``:84-104``): slot width ``(180 - 2*margin)/n_users``, user 0
    uniform in the first slot, user i uniform in
    ``(prev + slot, margin + slot*(i+1))`` — guaranteeing minimum angular
    separation ``slot`` — then re-precodes (joint-normalized MU MRT,
    single-user MRT degenerates to the same formula) and re-derives the
    constant-IBO per-antenna alphas. Per-user SDR convention
    (``:156-181``): desired = Bussgang-scaled clean signal of user u
    *alone* through H_u, distortion = received minus the scaled combined
    clean signal; the per-snapshot power ratios are averaged linearly,
    then converted to dB."""
    m = cfg.modem.constel_size
    n_fft, n_sc = cfg.modem.n_fft, cfg.modem.n_sub_carr
    n_ant = cfg.array.n_elements
    model = cfg.channel.model
    tx_pos, freqs, _ = link_static(cfg, dtype)
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)
    slot = (180.0 - 2.0 * angular_margin) / n_users

    def draw_angles(k):
        if n_users == 1:
            return jax.random.uniform(k, (1,), jnp.float32, angular_margin,
                                      180.0 - angular_margin)
        ks = jax.random.split(k, n_users)
        angs = [jax.random.uniform(ks[0], (), jnp.float32, angular_margin,
                                   angular_margin + slot)]
        for i in range(1, n_users):
            angs.append(jax.random.uniform(
                ks[i], (), jnp.float32, angs[-1] + slot,
                angular_margin + slot * (i + 1)))
        return jnp.stack(angs)

    @jax.jit
    def run(key, ibo_values):
        def one_ibo(args):
            idx, ibo_db = args

            def one_snap(k):
                k_loc, k_bits = jax.random.split(k)
                ang = jnp.deg2rad(draw_angles(k_loc))
                pos = jnp.stack([jnp.cos(ang) * radial_dist,
                                 jnp.sin(ang) * radial_dist,
                                 jnp.full_like(ang, cfg.rx.cord_z)], axis=-1)
                h_mu = jax.vmap(
                    lambda i, p: _point_channel(
                        model, jax.random.fold_in(k_loc, i), tx_pos, p,
                        freqs_sc, dtype))(jnp.arange(n_users), pos)
                v = precoding.mu_mrt_precoder(h_mu)    # [n_ant, n_usr, n_sc]
                sat = precoding.pa_sat_power(
                    ibo_db, cfg.modem.avg_sample_power, v)
                vk_pow = precoding.precoding_power_per_antenna(v)
                ak = precoding.per_antenna_alpha(ibo_db, vk_pow, n_sc, n_ant)
                akc = ak[:, None].astype(dtype)
                bits = jax.random.bernoulli(
                    k_bits, 0.5,
                    (n_users, cfg.modem.n_bits_per_ofdm_sym)).astype(jnp.int8)
                from mimo_ofdm_tpu.ops import qam
                sym = qam.modulate_bits(bits, m, dtype)    # [n_usr, n_sc]
                fd_dist, fd_clean = transmit.array_transmit_fd(
                    bits, constel_size=m, n_fft=n_fft, v=v,
                    pa_model=cfg.pa.model, sat_power=sat, return_clean=True,
                    dtype=dtype)
                dist_sc = ofdm.extract_subcarriers(fd_dist, n_sc)
                cl_tot = ofdm.extract_subcarriers(fd_clean, n_sc)

                def per_user(h_u, v_u, s_u):
                    cl_u = v_u * s_u[None, :]              # [n_ant, n_sc]
                    d = jnp.sum(jnp.abs(jnp.sum(akc * cl_u * h_u,
                                                axis=0)) ** 2)
                    e = jnp.sum(jnp.abs(jnp.sum(
                        (dist_sc - akc * cl_tot) * h_u, axis=0)) ** 2)
                    return d / e

                return jax.vmap(per_user, in_axes=(0, 1, 0))(h_mu, v, sym)

            keys = jax.random.split(jax.random.fold_in(key, idx),
                                    n_snapshots)
            ratios = jax.lax.map(one_snap, keys, batch_size=snap_chunk)
            return 10.0 * jnp.log10(jnp.mean(ratios, axis=0))

        n = ibo_values.shape[0]
        return jax.lax.map(one_ibo, (jnp.arange(n), ibo_values))

    return run
