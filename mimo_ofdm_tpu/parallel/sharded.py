"""Multi-chip SPMD Monte-Carlo: trial-parallel x antenna-parallel rounds.

The reference scales by forking OS processes that race on lock-protected
shared BER counters (``reference/mp_model.py:89-222``,
``reference/main_mp_clipping_noise_cancellation/main_mp_miso_cnc_ber_vs_ebn0.py:119-132``).
The TPU-native design maps onto a 2-D device mesh:

* ``dp`` (trial axis)  — each device simulates an independent slice of the
  Monte-Carlo frame batch; error counters reduce with a single ``psum``
  (replacing the shared ``multiprocessing.Array``; SURVEY.md section 2.3
  P1/P4).
* ``tp`` (antenna axis) — the ``[n_ant, n_fft]`` per-antenna signal stack
  is sharded over antennas; MRT normalization, AGC sums and the channel
  combine ``sum_ant H o X`` become local reductions + ``psum`` over ICI
  (SURVEY.md section 2.3 P2).

Counters come back replicated on every device, so the host stop-criterion
loop (:mod:`mimo_ofdm_tpu.parallel.montecarlo`) is unchanged.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mimo_ofdm_tpu.models.link import FrameCounters, link_static, make_frame_fn
from mimo_ofdm_tpu.utils.config import LinkConfig


def make_mesh(n_dp: int | None = None, n_tp: int = 1,
              devices=None) -> Mesh:
    """Build a ``(dp, tp)`` mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = devices.size // n_tp
    if n_dp * n_tp != devices.size:
        devices = devices[: n_dp * n_tp]
    return Mesh(devices.reshape(n_dp, n_tp), ("dp", "tp"))


def make_sharded_round_fn(cfg: LinkConfig, n_iters: int, batch: int,
                          mesh: Mesh, *, incl_clean: bool = True,
                          reroll: bool = True, dtype=jnp.complex64):
    """Jitted SPMD round: ``round_fn(key, snr_db) -> FrameCounters``
    (summed over the global ``batch``; replicated outputs).

    ``batch`` must divide by the ``dp`` mesh size and ``cfg.array.n_elements``
    by the ``tp`` size. Runs on any mesh, including a CPU host mesh with
    ``--xla_force_host_platform_device_count`` for testing.
    """
    n_dp = mesh.shape["dp"]
    n_tp = mesh.shape["tp"]
    n_ant = cfg.array.n_elements
    if batch % n_dp:
        raise ValueError(f"batch {batch} not divisible by dp={n_dp}")
    if n_ant % n_tp:
        raise ValueError(f"n_ant {n_ant} not divisible by tp={n_tp}")

    ant_axis = "tp" if n_tp > 1 else None
    frame_fn = make_frame_fn(cfg, n_iters, incl_clean=incl_clean,
                             reroll=reroll, dtype=dtype,
                             ant_axis_name=ant_axis)
    tx_pos_global = link_static(cfg, dtype)[0]        # [n_ant, 3]

    def spmd_body(keys_local, snr_db, tx_pos_local):
        # keys_local: [batch/dp, 2(key)]; tx_pos_local: [n_ant/tp, 3]
        counters = jax.vmap(frame_fn, in_axes=(0, None, None))(
            keys_local, snr_db, tx_pos_local)
        local = jax.tree.map(lambda x: jnp.sum(x, axis=0, dtype=jnp.int32),
                             counters)
        return jax.tree.map(lambda x: jax.lax.psum(x, "dp"), local)

    spmd = jax.shard_map(
        spmd_body, mesh=mesh,
        in_specs=(P("dp"), P(), P("tp")),
        out_specs=FrameCounters(clean_err=P(), dist_err=P()),
        check_vma=False,
    )

    @jax.jit
    def round_fn(key, snr_db):
        keys = jax.random.split(key, batch)
        return spmd(keys, snr_db, tx_pos_global)

    return round_fn


def make_dp_round_fn(cfg: LinkConfig, n_iters: int, batch: int, mesh: Mesh,
                     **kw):
    """Pure data-parallel round (tp=1) — the common fast path."""
    return make_sharded_round_fn(cfg, n_iters, batch, mesh, **kw)


def make_sharded_mu_round_fn(cfg: LinkConfig, n_iters: int, batch: int,
                             mesh: Mesh, user_positions=None, *,
                             incl_clean: bool = True, reroll: bool = True,
                             dtype=jnp.complex64):
    """Multi-user SPMD round over a ``(dp, tp)`` mesh — trial-parallel
    frames with antenna-sharded ZF/MU-MRT precoding and MU receivers
    (CNC / CNC-MU / MCNC-MU), per-user counters psum-reduced over ``dp``
    (reference MU family: ``reference/main_multiuser/``)."""
    from mimo_ofdm_tpu.models.link_mu import (MuFrameCounters,
                                              default_user_positions,
                                              make_mu_frame_fn)
    if user_positions is None:
        user_positions = default_user_positions()
    n_dp = mesh.shape["dp"]
    n_tp = mesh.shape["tp"]
    if batch % n_dp:
        raise ValueError(f"batch {batch} not divisible by dp={n_dp}")
    if cfg.array.n_elements % n_tp:
        raise ValueError(f"n_ant {cfg.array.n_elements} not divisible by "
                         f"tp={n_tp}")
    ant_axis = "tp" if n_tp > 1 else None
    frame_fn = make_mu_frame_fn(cfg, n_iters, user_positions,
                                incl_clean=incl_clean, reroll=reroll,
                                dtype=dtype, ant_axis_name=ant_axis)
    tx_pos_global = link_static(cfg, dtype)[0]

    def spmd_body(keys_local, snr_db, tx_pos_local):
        counters = jax.vmap(frame_fn, in_axes=(0, None, None))(
            keys_local, snr_db, tx_pos_local)
        local = jax.tree.map(lambda x: jnp.sum(x, axis=0, dtype=jnp.int32),
                             counters)
        return jax.tree.map(lambda x: jax.lax.psum(x, "dp"), local)

    spmd = jax.shard_map(
        spmd_body, mesh=mesh,
        in_specs=(P("dp"), P(), P("tp")),
        out_specs=MuFrameCounters(clean_err=P(), dist_err=P()),
        check_vma=False,
    )

    @jax.jit
    def round_fn(key, snr_db):
        keys = jax.random.split(key, batch)
        return spmd(keys, snr_db, tx_pos_global)

    return round_fn


def make_sharded_transport_round_fn(cfg: LinkConfig, n_iters: int, batch: int,
                                    chain, mesh: Mesh, *,
                                    ldpc_iters: int = 12,
                                    ldpc_algorithm: str = "minsum",
                                    serial_decode: int = 0,
                                    nv_adjust: bool = False,
                                    incl_clean: bool = True,
                                    reroll: bool = True,
                                    dtype=jnp.complex64):
    """Data-parallel SPMD transport-coded round over the ``dp`` mesh axis
    — the sharded analogue of the reference's per-process ``LinkLdpc``
    workers racing on shared coded-BER counters
    (``reference/main_cnc_mcnc_w_ldpc/mp_ldpc_model.py:15``,
    ``main_mp_ldpc_cnc_ber_vs_ebn0.py``). Each device runs ``batch/dp``
    full DL-SCH frames (CRC/segment/LDPC/rate-match + CNC/MCNC +
    decode, optionally chunked via ``serial_decode`` — the Mosaic
    workaround path); the ``TransportFrameCounters`` reduce with one
    ``psum``. Keys are pre-split over the *global* batch, so the sharded
    round is counter-identical to
    :func:`mimo_ofdm_tpu.models.link_ldpc.make_transport_round_fn`
    for the same master key (tested in ``tests/test_sharding.py``)."""
    from mimo_ofdm_tpu.models.link_ldpc import (TransportFrameCounters,
                                                make_transport_body_fn)

    n_dp = mesh.shape["dp"]
    if batch % n_dp:
        raise ValueError(f"batch {batch} not divisible by dp={n_dp}")
    body = make_transport_body_fn(cfg, n_iters, chain, ldpc_iters,
                                  ldpc_algorithm=ldpc_algorithm,
                                  incl_clean=incl_clean, reroll=reroll,
                                  serial_decode=serial_decode,
                                  nv_adjust=nv_adjust, dtype=dtype)
    tx_pos_global = link_static(cfg, dtype)[0]

    def spmd_body(keys_local, snr_db, tx_pos):
        local = body(keys_local, snr_db, tx_pos)
        return jax.tree.map(lambda x: jax.lax.psum(x, "dp"), local)

    spmd = jax.shard_map(
        spmd_body, mesh=mesh,
        in_specs=(P("dp"), P(), P()),
        out_specs=TransportFrameCounters(clean_err=P(), clean_blk=P(),
                                         dist_err=P(), dist_blk=P()),
        check_vma=False,
    )

    @jax.jit
    def round_fn(key, snr_db):
        keys = jax.random.split(key, batch)
        return spmd(keys, snr_db, tx_pos_global)

    return round_fn
