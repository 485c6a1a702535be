"""Multi-host bootstrap (parallel/multihost): a real 2-process CPU-backend
JAX job must produce counters bit-identical to the single-process run of
the same global batch — the TPU-pod analogue of the reference's
process-fan-out parity
(``reference/main_mp_clipping_noise_cancellation/main_mp_miso_cnc_ber_vs_ebn0.py:119-132``)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig, LinkConfig,
                                        ModemConfig, PaConfig, RxConfig)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg():
    return LinkConfig(
        modem=ModemConfig(constel_size=16, n_fft=256, n_sub_carr=128, cp_len=16),
        array=ArrayConfig(n_elements=8),
        channel=ChannelConfig(model="rayleigh"),
        precoding="mrt",
        pa=PaConfig(model="softlim", ibo_db=0.0),
        rx=RxConfig(algorithm="cnc"),
    )


def _single_process_reference():
    from mimo_ofdm_tpu.models.link import make_round_fn
    round_fn = make_round_fn(_cfg(), n_iters=2, batch=8)
    out = []
    for r in range(2):
        c = round_fn(jax.random.fold_in(jax.random.key(7), r),
                     jnp.float32(12.0))
        out.append({"clean": int(c.clean_err),
                    "dist": [int(x) for x in c.dist_err]})
    return out


@pytest.mark.slow
def test_two_process_job_matches_single_process():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
         coord, "2", str(pid)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process job timed out")

    for rc, out, err in outs:
        if rc != 0 and ("collectives" in err.lower()
                        or "gloo" in err.lower()):
            pytest.skip(f"CPU cross-process collectives unavailable: "
                        f"{err.splitlines()[-1] if err else ''}")
        assert rc == 0, f"worker failed:\n{err[-2000:]}"

    result_line = next(l for l in outs[0][1].splitlines()
                       if l.startswith("RESULT"))
    got = json.loads(result_line[len("RESULT"):])
    assert got["process_count"] == 2
    assert got["global_device_count"] == 4

    want = _single_process_reference()
    assert got["rounds"] == want, (got["rounds"], want)
