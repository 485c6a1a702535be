"""Synthetic probe: does the [.., 64, 64] stage-tensor lane padding cost
wall time on this TPU?

The fused 4-step chain's tensors are [batch, n_ant, 64, 64] planes; the
TPU tiles the two minor dims as (8, 128), so a 64-lane minor dim occupies
half a tile (2x HBM waste) IF the padding reaches memory. This probe times
shape-equivalent 4-stage GEMM chains (same FLOPs/elements, random
matrices, elementwise squash between stages standing in for the PA):

  a) [B, A, 64, 64]   @ [64, 64]    - today's layout
  b) [B, A/2, 64, 128] @ blockdiag([64,64]x2) as a dense [128, 128]
     (two antennas packed into the lane dim; the MXU is a 128x128 array,
     so the dense 128x128 matmul costs the same cycles as the 64x64 one)
  c) [B, A, 32, 128]  @ [128, 128] CB-stage / [32, 32] CA-stage mix
     (rectangular 32x128 factorization stand-in)

If (b)/(c) beat (a) by >10% the packed redesign of ops/mxu_fft.py is
worth doing; if not, the padding is hidden by fusion/VMEM and the idea
dies here. Run on the real TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_layout.py
"""

import time

import numpy as np


def timed(fn, key, reps=30):
    import jax
    out = fn(key)
    np.asarray(out)  # compile + sync (axon block_until_ready is a no-op)
    t0 = time.perf_counter()
    pend = []
    for i in range(reps):
        pend.append(fn(jax.random.fold_in(key, i)))
        if len(pend) > 2:
            np.asarray(pend.pop(0))
    for p in pend:
        np.asarray(p)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    B, A = 1024, 64
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    m64 = jnp.asarray(rng.standard_normal((64, 64)), jnp.bfloat16)
    m128 = jnp.asarray(rng.standard_normal((128, 128)), jnp.bfloat16)
    bd = np.zeros((128, 128), np.float32)
    bd[:64, :64] = np.asarray(m64, np.float32)
    bd[64:, 64:] = np.asarray(m64, np.float32)
    bd = jnp.asarray(bd, jnp.bfloat16)
    m32 = jnp.asarray(rng.standard_normal((32, 32)), jnp.bfloat16)

    def chain(x, mats, specs):
        for m, spec in zip(mats, specs):
            x = jnp.einsum(spec, x.astype(jnp.bfloat16), m,
                           preferred_element_type=jnp.float32)
            x = x * jax.lax.rsqrt(1.0 + x * x)   # elementwise PA stand-in
        return jnp.sum(x[..., :2], dtype=jnp.float32)

    CA, CB = "...ab,ac->...bc", "...ab,bc->...ac"

    @jax.jit
    def v_a(k):
        x = jax.random.normal(k, (B, A, 64, 64), jnp.float32)
        return chain(x, [m64, m64, m64, m64], [CA, CA, CB, CA])

    @jax.jit
    def v_b(k):
        x = jax.random.normal(k, (B, A // 2, 64, 128), jnp.float32)
        return chain(x, [bd, bd, bd, bd], [CB, CB, CB, CB])

    @jax.jit
    def v_c(k):
        # rect chain: [32,128] -CB m128-> [32,128] -CA m32-> [128,32]
        #             -CA m128-> [32,128] -CA m32-> [128,32]
        x = jax.random.normal(k, (B, A, 32, 128), jnp.float32)
        return chain(x, [m128, m32, m128, m32], [CB, CA, CA, CA])

    @jax.jit
    def v_a2(k):
        # control: today's shapes but CB-only contractions — separates
        # the einsum-form effect from the lane-padding effect
        x = jax.random.normal(k, (B, A, 64, 64), jnp.float32)
        return chain(x, [m64, m64, m64, m64], [CB, CB, CB, CB])

    for name, fn in (("a_64x64_today", v_a), ("a2_64x64_cb_only", v_a2),
                     ("b_packed_128lane", v_b), ("c_rect_32x128", v_c)):
        dt = timed(fn, key)
        print(f"{name:18s} {dt * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
