"""Refresh the CPU weak-scaling evidence on the current code (VERDICT r4
item 7): re-measure the pinned 2-core protocol plus the documented
oversubscription artifact sweep, rewriting figs/scaling/*.json.

Protocol (matches the round-3 evidence): on this 2-core host the honest
per-worker baseline is dp=1 pinned to ONE core (taskset -c 0); dp=2 uses
both cores; anything larger oversubscribes and measures the OS
scheduler, recorded separately as the artifact sweep. 3 repetitions,
medians. Run on a QUIET machine (no concurrent TPU batch), CPU platform:

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/weak_scaling_refresh.py
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

INNER = r"""
import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from mimo_ofdm_tpu.utils.config import (ArrayConfig, ChannelConfig,
                                        LinkConfig, ModemConfig, RxConfig)
from mimo_ofdm_tpu.parallel.sharded import make_mesh, make_sharded_round_fn
import numpy as np

n_dp = int(sys.argv[1]); batch_per = int(sys.argv[2])
cfg = LinkConfig(
    modem=ModemConfig(constel_size=64, n_fft=256, n_sub_carr=128, cp_len=16),
    array=ArrayConfig(n_elements=8), channel=ChannelConfig(model="rayleigh"),
    precoding="mrt", rx=RxConfig(algorithm="cnc"))
mesh = make_mesh(n_dp=n_dp, n_tp=1)
fn = make_sharded_round_fn(cfg, n_iters=2, batch=batch_per * n_dp, mesh=mesh)
key = jax.random.key(0)
c = fn(key, 22.0); int(np.asarray(c.clean_err))          # compile
t0 = time.perf_counter(); n = 0
while time.perf_counter() - t0 < 4.0:
    c = fn(jax.random.fold_in(key, n), 22.0)
    int(np.asarray(c.clean_err)); n += 1
dt = time.perf_counter() - t0
print(json.dumps({"fps": n * batch_per * n_dp / dt}))
"""


def run(n_dp, batch_per, pin=None, reps=3):
    out = []
    env = dict(os.environ,
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"),
               PYTHONPATH=f"/root/.axon_site:{REPO}")
    for _ in range(reps):
        cmd = [sys.executable, "-c", INNER, str(n_dp), str(batch_per)]
        if pin is not None:
            cmd = ["taskset", "-c", pin] + cmd
        r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           cwd=REPO)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(r.stdout, r.stderr[-1500:])
            raise RuntimeError("no result line")
        out.append(round(json.loads(line[-1])["fps"], 1))
        print(f"dp{n_dp} pin={pin}: {out[-1]} frames/s", flush=True)
    return out


def main():
    import numpy as np

    # pinned honest-baseline protocol
    r1 = run(1, 256, pin="0")
    r2 = run(2, 256, pin=None)
    med1, med2 = float(np.median(r1)), float(np.median(r2))
    eff = med2 / (2 * med1)
    payload = {
        "platform": "cpu",
        "method": ("weak scaling with an honest per-worker baseline on a "
                   "2-core host: the dp=1 run is pinned to ONE core "
                   "(taskset -c 0) so each virtual mesh device maps to one "
                   "core's worth of compute; dp=2 uses both cores. Larger "
                   "virtual meshes (4/8 devices) on this host oversubscribe "
                   "the 2 cores and measure the OS scheduler, not the "
                   "sharding design (see weak_scaling_cpu_tp1_nant8_"
                   "nfft256.json) - real multi-chip scaling requires pod "
                   "hardware, validated structurally by dryrun_multichip "
                   "and tests/test_multihost.py."),
        "n_physical_cores": 2,
        "batch_per_device": 256,
        "n_iters": 2,
        "config": {"n_ant": 8, "channel": "rayleigh", "algorithm": "cnc",
                   "n_fft": 256},
        "runs": {"dp1_pinned_1core": r1, "dp2_2cores": r2},
        "median_frames_per_s": {"1": med1, "2": med2},
        "weak_scaling_efficiency_dp2": round(eff, 3),
    }
    with open(os.path.join(REPO, "figs", "scaling",
                           "weak_scaling_cpu_pinned_2core.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(f"dp2 efficiency vs pinned dp1: {eff:.3f}")

    # documented oversubscription artifact sweep (unpinned 1/2/4/8)
    art = {}
    for n_dp in (1, 2, 4, 8):
        fps = float(np.median(run(n_dp, 64, pin=None, reps=3)))
        art[str(n_dp)] = {"frames_per_s": fps}
    base = art["1"]["frames_per_s"]
    for k, v in art.items():
        v["efficiency"] = v["frames_per_s"] / (int(k) * base)
    payload2 = {
        "platform": "cpu", "n_devices_available": 8, "n_tp": 1,
        "batch_per_device": 64, "n_iters": 2,
        "config": {"n_ant": 8, "channel": "rayleigh", "algorithm": "cnc",
                   "n_fft": 256},
        "results": art,
        "note": ("unpinned virtual-mesh sweep on a 2-core host: dp>2 "
                 "oversubscribes physical cores, so the efficiency drop "
                 "beyond dp=2 is an OS-scheduling artifact, not a "
                 "sharding property (the pinned protocol is the "
                 "evidence)"),
    }
    with open(os.path.join(REPO, "figs", "scaling",
                           "weak_scaling_cpu_tp1_nant8_nfft256.json"),
              "w") as f:
        json.dump(payload2, f, indent=1)
    print("artifact sweep:", {k: round(v["efficiency"], 3)
                              for k, v in art.items()})


if __name__ == "__main__":
    main()
