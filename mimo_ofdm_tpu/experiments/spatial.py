"""Spatial experiments: beampatterns, SDR-vs-IBO, PSD evaluations."""

from __future__ import annotations

import numpy as np

from mimo_ofdm_tpu.experiments import register
from mimo_ofdm_tpu.models.analysis import beampattern_scan, sdr_at_point, welch_psd
from mimo_ofdm_tpu.utils import results
from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig, LinkConfig,
                                        ModemConfig, PaConfig)


def _cfg(n_ant, ibo_db, geometry="linear", chan="los", small=False):
    modem = ModemConfig(constel_size=64, n_fft=256 if small else 4096,
                        n_sub_carr=128 if small else 2048,
                        cp_len=16 if small else 128)
    return LinkConfig(modem=modem,
                      array=ArrayConfig(geometry=geometry, n_elements=n_ant),
                      channel=ChannelConfig(model=chan),
                      pa=PaConfig(model="softlim", ibo_db=ibo_db))


@register("beampattern")
def beampattern(n_ant_values=(1, 2, 4, 8, 16, 32, 64), ibo_db=0.0,
                precoding_angle_deg=45.0, n_points=180, n_snapshots=100,
                geometry="linear", seed=0, save_csv=True, verbose=True,
                small=False):
    """Desired/distortion radiation patterns per antenna count
    (``reference/main_beampatterns_plotting/main_mrt_precoding_radiation_pattern.py``)."""
    import jax
    out = {}
    for n_ant in n_ant_values:
        cfg = _cfg(n_ant, ibo_db, geometry, small=small)
        res = beampattern_scan(cfg, jax.random.key(seed),
                               precoding_angle_deg=precoding_angle_deg,
                               n_points=n_points, n_snapshots=n_snapshots)
        out[n_ant] = res
        if verbose:
            sdr = np.asarray(res.sdr_db)
            print(f"n_ant={n_ant:3d}  SDR min/max = {sdr.min():.2f}/{sdr.max():.2f} dB")
        if save_csv:
            fname = (f"mrt_radiation_pattern_{geometry}_ibo{int(ibo_db)}"
                     f"_npoints{n_points}_nsnap{n_snapshots}"
                     f"_angle{int(precoding_angle_deg)}_nant{n_ant}")
            results.save_to_csv(
                [res.angles_rad, np.asarray(res.desired_pow),
                 np.asarray(res.distortion_pow)], fname)
    return out


@register("sdr_vs_ibo")
def sdr_vs_ibo(channels=("los", "two_path", "rayleigh"), n_ant=64,
               ibo_values=(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0),
               n_snapshots=100, rx_pos=(212.0, 212.0, 1.5), seed=0,
               save_csv=True, verbose=True, small=False):
    """SDR vs IBO per channel model
    (``reference/main_beampatterns_plotting/main_sdr_vs_ibo_vs_channel.py``)."""
    import jax
    sdr = np.zeros((len(channels), len(ibo_values)))
    for ci, chan in enumerate(channels):
        for ii, ibo in enumerate(ibo_values):
            cfg = _cfg(n_ant, float(ibo), chan=chan, small=small)
            sdr[ci, ii] = float(sdr_at_point(cfg, jax.random.key(seed),
                                             rx_pos, n_snapshots=n_snapshots))
        if verbose:
            print(f"{chan}: SDR[dB] = {np.array2string(sdr[ci], precision=2)}")
    if save_csv:
        results.save_to_csv([np.asarray(ibo_values, float), *sdr],
                            f"sdr_vs_ibo_per_chan_nant{n_ant}")
    return np.asarray(ibo_values, float), sdr


@register("psd_eval")
def psd_eval(n_ant=64, ibo_db=0.0, n_snapshots=32, psd_nfft=128,
             n_samp_per_seg=64, seed=0, save_csv=True, verbose=True,
             small=False):
    """Desired vs distortion PSD at the precoded point
    (``reference/main_beampatterns_plotting/main_mrt_precoding_radiation_pattern.py:181-200``
    and ``reference/main_misc_evals/main_awgn_psd_ber_eval.py``)."""
    import jax
    import jax.numpy as jnp
    from mimo_ofdm_tpu.models import channels, precoding, transmit
    from mimo_ofdm_tpu.models.analysis import bussgang_split
    from mimo_ofdm_tpu.models.link import link_static
    from mimo_ofdm_tpu.ops import ofdm

    cfg = _cfg(n_ant, ibo_db, small=small)
    m, n_fft, n_sc = (cfg.modem.constel_size, cfg.modem.n_fft,
                      cfg.modem.n_sub_carr)
    tx_pos, freqs, rx_base = link_static(cfg)
    h = channels.los_channel(tx_pos, rx_base, freqs)
    h_sc = ofdm.extract_subcarriers(h, n_sc)
    v = precoding.mrt_precoder(h_sc)
    sat = precoding.pa_sat_power(ibo_db, cfg.modem.avg_sample_power, v)
    ak = precoding.per_antenna_alpha(
        ibo_db, precoding.precoding_power_per_antenna(v), n_sc, n_ant)

    def snap(k):
        bits = jax.random.bernoulli(
            k, 0.5, (cfg.modem.n_bits_per_ofdm_sym,)).astype(jnp.int8)
        fd_dist, fd_clean = transmit.array_transmit_fd(
            bits, constel_size=m, n_fft=n_fft, v=v, pa_model=cfg.pa.model,
            sat_power=sat, return_clean=True)
        rx = channels.propagate(h, fd_dist, sum_signals=False)
        cl = channels.propagate(h, fd_clean, sum_signals=False)
        desired, distortion = bussgang_split(rx, cl, ak)
        return (ofdm.fd_to_td(jnp.sum(desired, axis=0)),
                ofdm.fd_to_td(jnp.sum(distortion, axis=0)))

    des_td, dist_td = jax.vmap(snap)(jax.random.split(jax.random.key(seed),
                                                      n_snapshots))
    f, p_des = welch_psd(des_td.ravel(), psd_nfft, n_samp_per_seg)
    _, p_dist = welch_psd(dist_td.ravel(), psd_nfft, n_samp_per_seg)
    if verbose:
        gap = 10 * np.log10(np.asarray(p_des).mean() / np.asarray(p_dist).mean())
        print(f"mean desired/distortion PSD gap: {gap:.2f} dB")
    if save_csv:
        results.save_to_csv([np.asarray(f), np.asarray(p_des), np.asarray(p_dist)],
                            f"psd_mrt_los_ibo{int(ibo_db)}_nant{n_ant}")
    return np.asarray(f), np.asarray(p_des), np.asarray(p_dist)
