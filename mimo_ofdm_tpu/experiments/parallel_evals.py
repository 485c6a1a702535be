"""Parallel-scaling evaluations — the measurement arm of BASELINE.md's
">80% samples/s scaling efficiency at 1 chip / 1 host / N hosts" target
(the reference's analogue is wall-clock prints around the process fan-out,
``reference/main_mp_clipping_noise_cancellation/main_mp_miso_cnc_ber_vs_ebn0.py:119-132``).
"""

from __future__ import annotations

import json
import os

from mimo_ofdm_tpu.experiments import register


@register("weak_scaling")
def weak_scaling(n_ant=8, n_iters=2, batch_per_device=32, n_tp=1,
                 device_counts=None, channel="rayleigh", algorithm="cnc",
                 snr_db=22.0, small=True, save_json=True, verbose=True):
    """Weak-scaling sweep of the sharded Monte-Carlo round over growing
    dp-mesh sizes (``parallel.scaling.weak_scaling_sweep``). On a CPU host
    run under ``XLA_FLAGS=--xla_force_host_platform_device_count=N`` to
    emulate an N-device mesh; on a pod the mesh spans all hosts' devices
    (``parallel.multihost``). Writes ``figs/scaling/weak_scaling_*.json``."""
    import jax
    from mimo_ofdm_tpu.parallel.scaling import weak_scaling_sweep
    from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig,
                                            LinkConfig, ModemConfig, PaConfig,
                                            RxConfig)

    modem = (ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128, cp_len=16)
             if small else ModemConfig())
    cfg = LinkConfig(
        modem=modem,
        array=ArrayConfig(n_elements=n_ant),
        channel=ChannelConfig(model=channel),
        precoding="mrt",
        rx=RxConfig(algorithm=algorithm),
    )
    results = weak_scaling_sweep(cfg, n_iters=n_iters,
                                 batch_per_device=batch_per_device,
                                 device_counts=device_counts, n_tp=n_tp,
                                 snr_db=snr_db, verbose=verbose)
    payload = {
        "platform": jax.devices()[0].platform,
        "n_devices_available": len(jax.devices()),
        "n_tp": n_tp,
        "batch_per_device": batch_per_device,
        "n_iters": n_iters,
        "config": {"n_ant": n_ant, "channel": channel,
                   "algorithm": algorithm, "n_fft": modem.n_fft},
        "results": {str(k): v for k, v in results.items()},
    }
    if save_json:
        os.makedirs("figs/scaling", exist_ok=True)
        fname = (f"figs/scaling/weak_scaling_{payload['platform']}"
                 f"_tp{n_tp}_nant{n_ant}_nfft{modem.n_fft}.json")
        with open(fname, "w") as f:
            json.dump(payload, f, indent=1)
        if verbose:
            print(f"saved {fname}")
    return payload
