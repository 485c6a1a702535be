"""Worker process for the multi-host integration test: joins a 2-process
CPU-backend JAX job, runs sharded Monte-Carlo rounds over the global mesh
and (process 0) prints the counters as JSON."""

import json
import os
import sys


def main():
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)   # match tests/conftest.py
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from mimo_ofdm_tpu.parallel import multihost
    multihost.initialize(coord, n_proc, pid)
    assert jax.process_count() == n_proc
    assert jax.device_count() == 2 * n_proc

    from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig,
                                            LinkConfig, ModemConfig, PaConfig,
                                            RxConfig)
    cfg = LinkConfig(
        modem=ModemConfig(constel_size=16, n_fft=256, n_sub_carr=128, cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="rayleigh"),
        precoding="mrt",
        pa=PaConfig(model="softlim", ibo_db=0.0),
        rx=RxConfig(algorithm="cnc"),
    )
    round_fn, mesh = multihost.make_multihost_round_fn(cfg, n_iters=2,
                                                       global_batch=8)
    out = []
    for r in range(2):
        c = round_fn(jax.random.fold_in(jax.random.key(7), r),
                     jax.numpy.float32(12.0))
        out.append({"clean": int(c.clean_err),
                    "dist": [int(x) for x in c.dist_err]})
    if pid == 0:
        print("RESULT" + json.dumps({"rounds": out,
                                     **multihost.process_info()}))


if __name__ == "__main__":
    main()
