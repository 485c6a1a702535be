"""Diagnostic evaluations: alpha validation, complexity tables, PA transfer
characteristics, channel transfer functions."""

from __future__ import annotations

import numpy as np

from mimo_ofdm_tpu.experiments import register


@register("alpha_eval")
def alpha_eval(n_ant=64, ibo_db=0.0, n_snapshots=64, seed=0, verbose=True,
               small=False):
    """Empirical per-antenna Bussgang alpha (E[y x*]/E[x x*] over the TX
    time-domain signals) vs the analytic closed form — the reference's own
    validation study
    (``reference/main_misc_evals/main_alpha_dist_coefficient_eval.py:28-80``)."""
    import jax
    import jax.numpy as jnp
    from mimo_ofdm_tpu.models import channels, precoding, transmit
    from mimo_ofdm_tpu.models.link import link_static
    from mimo_ofdm_tpu.ops import ofdm
    from mimo_ofdm_tpu.utils.config import (ArrayConfig, LinkConfig,
                                            ModemConfig, PaConfig)

    modem = ModemConfig(constel_size=64, n_fft=256 if small else 4096,
                        n_sub_carr=128 if small else 2048,
                        cp_len=16 if small else 128)
    cfg = LinkConfig(modem=modem, array=ArrayConfig(n_elements=n_ant),
                     pa=PaConfig(model="softlim", ibo_db=ibo_db))
    m, n_fft, n_sc = modem.constel_size, modem.n_fft, modem.n_sub_carr

    tx_pos, freqs, rx_base = link_static(cfg)
    h = channels.los_channel(tx_pos, rx_base, freqs)
    h_sc = ofdm.extract_subcarriers(h, n_sc)
    v = precoding.mrt_precoder(h_sc)
    sat = precoding.pa_sat_power(ibo_db, modem.avg_sample_power, v)
    ak_analytic = np.asarray(precoding.per_antenna_alpha(
        ibo_db, precoding.precoding_power_per_antenna(v), n_sc, n_ant))

    def snap(k):
        bits = jax.random.bernoulli(
            k, 0.5, (modem.n_bits_per_ofdm_sym,)).astype(jnp.int8)
        sym = transmit.modulate_users(bits, m)
        per_ant = transmit.precode_symbols(sym, v)
        td = ofdm.fd_to_td(ofdm.map_subcarriers(per_ant, n_fft))
        td_clip = transmit.pa_transfer(td, cfg.pa.model, sat)
        num = jnp.mean(td_clip * jnp.conj(td), axis=-1)
        den = jnp.mean(jnp.abs(td) ** 2, axis=-1)
        return num / den

    a = jax.vmap(snap)(jax.random.split(jax.random.key(seed), n_snapshots))
    ak_emp = np.asarray(jnp.abs(jnp.mean(a, axis=0)))
    if verbose:
        print("alpha analytic (first 4):", ak_analytic[:4])
        print("alpha empirical (first 4):", ak_emp[:4])
        print("max |diff|:", np.max(np.abs(ak_emp - ak_analytic)))
    return ak_analytic, ak_emp


@register("complexity_eval")
def complexity_eval(m=64, n_u=2048, n=4096, k=64, iters=tuple(range(9)),
                    verbose=True):
    """Closed-form op-count tables for std/CNC/MCNC receivers
    (``reference/main_misc_evals/comp_complexity_eval.py``)."""
    from mimo_ofdm_tpu.models.complexity import cnc_ops, mcnc_ops, std_rx_ops
    std_add, std_mul = std_rx_ops(m, n_u, n)
    cnc_add, cnc_mul = cnc_ops(iters, m, n_u, n)
    mcnc_add, mcnc_mul = mcnc_ops(iters, m, n_u, n, k)
    if verbose:
        print(f"std: add/sc={std_add / n_u:.1f} mul/sc={std_mul / n_u:.1f}")
        for i, it in enumerate(iters):
            print(f"I={it}: cnc add/sc={cnc_add[i] / n_u:8.1f} "
                  f"mul/sc={cnc_mul[i] / n_u:8.1f}   "
                  f"mcnc add/sc={mcnc_add[i] / n_u:10.1f} "
                  f"mul/sc={mcnc_mul[i] / n_u:10.1f}")
    return {"std": (std_add, std_mul), "cnc": (cnc_add, cnc_mul),
            "mcnc": (mcnc_add, mcnc_mul)}


@register("pa_characteristics")
def pa_characteristics(model="softlim", ibo_db=0.0, avg_samp_pow=1.0,
                       ampl_max=4.0, n_points=200, verbose=True):
    """PA transfer characteristic samples
    (``reference/distortion.py:63-89,167-189,253-279``)."""
    import jax.numpy as jnp
    from mimo_ofdm_tpu.ops import pa
    x = np.linspace(0.0, ampl_max, n_points)
    if model == "toi":
        coeff = pa.toi_to_cubic_coeff(ibo_db, avg_samp_pow)
        y = np.asarray(pa.third_order(jnp.asarray(x + 0j), coeff))
    else:
        sat = pa.ibo_to_sat_power(ibo_db, avg_samp_pow)
        y = np.asarray(pa.apply_pa(jnp.asarray(x + 0j), model, sat))
    if verbose:
        print(f"{model} @ IBO {ibo_db} dB: out amp at max in = {abs(y[-1]):.3f}")
    return x, np.abs(y)


@register("channel_tf")
def channel_tf(channel="two_path", n_ant=4, small=True, verbose=True, seed=0):
    """Channel transfer-function magnitude inspection
    (``reference/main_misc_evals/channel_tf_test.py``,
    ``random_paths_channel_tf_test.py``)."""
    import jax
    from mimo_ofdm_tpu.models.link import link_static, make_channel_fn
    from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig,
                                            LinkConfig, ModemConfig)
    modem = ModemConfig(constel_size=64, n_fft=256 if small else 4096,
                        n_sub_carr=128 if small else 2048, cp_len=16)
    cfg = LinkConfig(modem=modem, array=ArrayConfig(n_elements=n_ant),
                     channel=ChannelConfig(model=channel))
    import jax.numpy as jnp
    tx_pos, freqs, rx_base = link_static(cfg)
    chan_fn = make_channel_fn(cfg, freqs, rx_base, reroll=False)

    # fetch real/imag planes, not the complex array: complex device->host
    # transfer is UNIMPLEMENTED on the axon TPU transport (CLAUDE.md)
    @jax.jit
    def planes(key):
        h = chan_fn(key, tx_pos)
        return jnp.real(h), jnp.imag(h)

    hr, hi = planes(jax.random.key(seed))
    h = np.asarray(hr) + 1j * np.asarray(hi)
    if verbose:
        print(f"{channel}: |H| mean={np.abs(h).mean():.3e} "
              f"min={np.abs(h).min():.3e} max={np.abs(h).max():.3e}")
    return h


@register("alpha_vs_tx_pow")
def alpha_vs_tx_pow(n_ant=64, ibo_db=0.0, n_snapshots=256,
                    channels_lst=("rayleigh", "two_path", "los"), seed=0,
                    save_csv=True, verbose=True, small=False):
    """Per-antenna empirical Bussgang lambda vs per-antenna TX power
    (``reference/main_misc_evals/main_alpha_vs_tx_pow_per_ant_eval.py``):
    MRT precoding redistributes power across antennas, so each PA runs at
    its own effective IBO ``10 log10(P_sat / P_tx,k)`` (``:121``); the
    SC-domain lambda estimate ``|E[Y X*] / E[|X|^2]|`` per antenna
    (``:105-111``) must land on the analytic ``alpha(IBO)`` curve.
    Returns ``(ibo_per_ant [n_chan, n_ant], lam [n_chan, n_ant],
    ibo_range, alpha_analytic)``."""
    import jax
    import jax.numpy as jnp
    from mimo_ofdm_tpu.models import precoding, transmit
    from mimo_ofdm_tpu.models.analysis import _point_channel
    from mimo_ofdm_tpu.models.link import link_static
    from mimo_ofdm_tpu.ops import ofdm, pa as pa_ops
    from mimo_ofdm_tpu.utils.config import (ArrayConfig, LinkConfig,
                                            ModemConfig, PaConfig)

    modem = ModemConfig(constel_size=64, n_fft=256 if small else 4096,
                        n_sub_carr=128 if small else 2048,
                        cp_len=16 if small else 128)
    cfg = LinkConfig(modem=modem, array=ArrayConfig(n_elements=n_ant),
                     pa=PaConfig(model="softlim", ibo_db=ibo_db))
    m, n_fft, n_sc = modem.constel_size, modem.n_fft, modem.n_sub_carr
    tx_pos, freqs, rx_base = link_static(cfg)
    freqs_sc = ofdm.extract_subcarriers(freqs, n_sc)

    ibo_per_ant = np.zeros((len(channels_lst), n_ant))
    lam = np.zeros((len(channels_lst), n_ant))

    for ci, chan in enumerate(channels_lst):
        @jax.jit
        def run(key, chan=chan):
            h_sc = _point_channel(chan, jax.random.fold_in(key, 999),
                                  tx_pos, rx_base, freqs_sc)
            v = precoding.mrt_precoder(h_sc)
            sat = precoding.pa_sat_power(ibo_db, modem.avg_sample_power, v)

            def snap(k):
                bits = jax.random.bernoulli(
                    k, 0.5, (modem.n_bits_per_ofdm_sym,)).astype(jnp.int8)
                fd_dist, fd_clean = transmit.array_transmit_fd(
                    bits, constel_size=m, n_fft=n_fft, v=v,
                    pa_model="softlim", sat_power=sat, return_clean=True)
                y = ofdm.extract_subcarriers(fd_dist, n_sc)
                x = ofdm.extract_subcarriers(fd_clean, n_sc)
                num = jnp.mean(y * jnp.conj(x), axis=-1)
                den = jnp.mean(jnp.abs(x) ** 2, axis=-1)
                p_tx = jnp.sum(jnp.abs(x) ** 2, axis=-1) / n_fft
                return num / den, p_tx

            lam_s, pow_s = jax.vmap(snap)(jax.random.split(key, n_snapshots))
            return (jnp.abs(jnp.mean(lam_s, axis=0)),
                    jnp.mean(pow_s, axis=0), sat)

        lam_c, p_tx, sat = run(jax.random.fold_in(jax.random.key(seed), ci))
        lam[ci] = np.asarray(lam_c)
        ibo_per_ant[ci] = 10.0 * np.log10(float(sat) / np.asarray(p_tx))
        if verbose:
            print(f"{chan:9s}: per-ant IBO {ibo_per_ant[ci].min():.2f}.."
                  f"{ibo_per_ant[ci].max():.2f} dB, lambda "
                  f"{lam[ci].min():.4f}..{lam[ci].max():.4f}")

    ibo_range = np.linspace(ibo_per_ant.min(), ibo_per_ant.max(), 100)
    alpha_analytic = np.asarray(pa_ops.bussgang_alpha(ibo_range))
    if save_csv:
        from mimo_ofdm_tpu.utils import results
        data = [ibo_per_ant[ci] for ci in range(len(channels_lst))]
        data += [lam[ci] for ci in range(len(channels_lst))]
        results.save_to_csv(
            data, f"alpha_vs_tx_pow_per_ant_nant{n_ant}_ibo{int(ibo_db)}")
    return ibo_per_ant, lam, ibo_range, alpha_analytic


@register("precoding_nl_commutation")
def precoding_nl_commutation(ibo_db=0.0, phase_cycles=10.0, n_frames=64,
                             small=True, verbose=True, seed=0):
    """Does the PA nonlinearity commute with phase-only precoding?
    (``reference/main_misc_evals/precoding_after_nl_test.py`` — the
    reference probes this by forcing a synthetic unit-magnitude channel
    with a frequency-swept phase, ``:72-96``, and comparing the distorted
    constellation with and without the resulting phase precoder.)

    Measures the distorted-constellation EVM of a phase-precoded frame
    for three precoders: ``"none"`` (baseline), ``"flat"`` (one common
    phase on every subcarrier — a pure time shift, so the clip
    distortion is *identical* and the EVMs match to rounding), and
    ``"swept"`` (the reference's linearly-swept phase spanning
    ``phase_cycles`` cycles across the band — changes the time-domain
    envelope, so the distortion differs). Returns ``{name: evm}``.
    """
    import jax
    import jax.numpy as jnp
    from mimo_ofdm_tpu.models import transmit
    from mimo_ofdm_tpu.ops import metrics, ofdm, pa, qam
    from mimo_ofdm_tpu.utils.config import ModemConfig
    modem = ModemConfig(constel_size=64, n_fft=256 if small else 1024,
                        n_sub_carr=128 if small else 512,
                        cp_len=16 if small else 128)
    m, n_fft, n_sc = modem.constel_size, modem.n_fft, modem.n_sub_carr
    sat = pa.ibo_to_sat_power(ibo_db, modem.avg_sample_power)
    alpha = pa.bussgang_alpha(ibo_db)
    k = np.arange(n_sc)
    phases = {
        "none": np.zeros(n_sc),
        "flat": np.full(n_sc, 0.7),
        "swept": 2.0 * np.pi * phase_cycles * k / n_sc,
    }

    @jax.jit
    def evm_for(key, phase):
        v = jnp.exp(1j * phase.astype(jnp.complex64))[None, :]

        def one(kk):
            bits = jax.random.bernoulli(
                kk, 0.5, (modem.n_bits_per_ofdm_sym,)).astype(jnp.int8)
            sym = qam.modulate_bits(bits, m)
            fd = transmit.array_transmit_fd(
                bits, constel_size=m, n_fft=n_fft, v=v,
                pa_model="softlim", sat_power=sat)
            rx = ofdm.extract_subcarriers(fd[0], n_sc)
            # undo the precoder phase and the Bussgang shrink, then
            # measure the residual clip-distortion EVM
            eq = rx * jnp.conj(v[0]) / alpha
            return metrics.evm_rms(eq, sym)

        keys = jax.random.split(key, n_frames)
        return jnp.mean(jax.lax.map(one, keys))

    out = {}
    key = jax.random.key(seed)   # same bit/frame stream for every variant:
    for name, ph in phases.items():   # "flat" must equal "none" exactly
        out[name] = float(evm_for(key, jnp.asarray(ph)))
        if verbose:
            print(f"precoder {name:5s}: distorted EVM = {out[name]:.5f}")
    if verbose:
        print("flat-phase EVM equals baseline (distortion commutes with a "
              "common phase); swept-phase EVM differs (it does not commute "
              "with frequency-selective phase)")
    return out
