#!/usr/bin/env python
"""Honest re-measurement of the projective-core primitives: every rep's input
depends on the previous rep's output (no pipelining/CSE escape), donated
buffers for the scatter targets, and the exact production formulation
(6-channel bf16 hi/lo split one-hot gather, fused)."""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
import numpy as np
import jax
import jax.numpy as jnp

K, V3, WIN = 512, 4096, 64
AH, AW = 480, 1280


def chain_time(name, fn, state, reps=20):
    state = fn(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        state = fn(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<56} {dt*1000:9.3f} ms", flush=True)
    return state


def main():
    print("dev:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    atlas = jax.random.uniform(key, (3, AH, AW), dtype=jnp.float32) * 5.0
    v0 = jax.random.randint(key, (K,), 0, AH - WIN).astype(jnp.int32)
    u0 = jax.random.randint(key, (K,), 0, AW - WIN).astype(jnp.int32)
    vrow0 = jax.random.randint(key, (K, V3), 0, WIN).astype(jnp.int32)
    vcol0 = jax.random.randint(key, (K, V3), 0, WIN).astype(jnp.int32)
    patches = jax.vmap(lambda a, b: jax.lax.dynamic_slice(
        atlas, (0, a, b), (3, WIN, WIN)))(v0, u0)
    jax.block_until_ready(patches)

    # --- fused one-hot gather, f32 onehots, default precision, chained ---
    @jax.jit
    def og_f32(state):
        vrow, vcol = state
        r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN), 2)
        R = (vrow[:, :, None] == r).astype(jnp.float32)
        C = (vcol[:, :, None] == r).astype(jnp.float32)
        D = jnp.einsum("kvr,khrc->kvch", R, patches,
                       preferred_element_type=jnp.float32)
        val = jnp.einsum("kvch,kvc->kvh", D, C)
        bump = (val[..., 0] > 2.5).astype(jnp.int32)  # data dependency
        return (vrow + bump) % WIN, (vcol + bump) % WIN

    chain_time("one-hot gather f32 default-prec (3ch, chained)", og_f32,
               (vrow0, vcol0))

    # --- fused, HIGHEST precision ---
    @jax.jit
    def og_hi(state):
        vrow, vcol = state
        r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN), 2)
        R = (vrow[:, :, None] == r).astype(jnp.float32)
        C = (vcol[:, :, None] == r).astype(jnp.float32)
        D = jnp.einsum("kvr,khrc->kvch", R, patches,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        val = jnp.einsum("kvch,kvc->kvh", D, C,
                         precision=jax.lax.Precision.HIGHEST)
        bump = (val[..., 0] > 2.5).astype(jnp.int32)
        return (vrow + bump) % WIN, (vcol + bump) % WIN

    chain_time("one-hot gather f32 HIGHEST (3ch, chained)", og_hi,
               (vrow0, vcol0))

    # --- 6-channel bf16 hi/lo split, single fused chain ---
    hi = patches.astype(jnp.bfloat16)
    lo = (patches - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    p6 = jnp.concatenate([hi, lo], axis=1)  # (K, 6, WIN, WIN)
    jax.block_until_ready(p6)

    @jax.jit
    def og_split(state):
        vrow, vcol = state
        r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN), 2)
        R = (vrow[:, :, None] == r).astype(jnp.bfloat16)
        C = (vcol[:, :, None] == r).astype(jnp.bfloat16)
        D = jnp.einsum("kvr,khrc->kvch", R, p6,
                       preferred_element_type=jnp.float32)
        val6 = jnp.einsum("kvch,kvc->kvh", D, C.astype(jnp.float32))
        val = val6[..., :3] + val6[..., 3:]
        bump = (val[..., 0] > 2.5).astype(jnp.int32)
        return (vrow + bump) % WIN, (vcol + bump) % WIN

    chain_time("one-hot gather bf16-split 6ch fused (chained)", og_split,
               (vrow0, vcol0))

    # exactness check of split vs serial
    flat = patches.reshape(K, 3, WIN * WIN)
    idx = vrow0 * WIN + vcol0
    exact = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
    r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN), 2)
    R = (vrow0[:, :, None] == r).astype(jnp.bfloat16)
    C = (vcol0[:, :, None] == r).astype(jnp.bfloat16)
    D = jnp.einsum("kvr,khrc->kvch", R, p6, preferred_element_type=jnp.float32)
    val6 = jnp.einsum("kvch,kvc->kvh", D, C.astype(jnp.float32))
    val = val6[..., :3] + val6[..., 3:]
    err = float(jnp.max(jnp.abs(val - jnp.moveaxis(exact, 1, 2))))
    print(f"bf16-split vs exact gather: max err {err:.2e}", flush=True)

    # --- grid scatters with donation, slot-leading sem layout ---
    slots = jax.random.permutation(key, 2048)[:K].astype(jnp.int32)
    delta = jax.random.uniform(key, (K, V3), dtype=jnp.float32)

    @jax.jit
    def chan_scatter(wsum):
        return wsum.at[slots].add(delta, mode="drop", unique_indices=True)
    chan_scatter_d = jax.jit(chan_scatter, donate_argnums=0)

    chain_time("1ch row-scatter donated (K rows)", chan_scatter_d,
               jnp.zeros((2049, V3), jnp.float32))

    sdel = jax.random.uniform(key, (K, 21, V3), dtype=jnp.float32)

    @jax.jit
    def sem_scatter(sem):
        return sem.at[slots].add(sdel, mode="drop", unique_indices=True)
    sem_scatter_d = jax.jit(sem_scatter, donate_argnums=0)

    chain_time("sem scatter (B+1,21,V3) axis0 donated", sem_scatter_d,
               jnp.zeros((2049, 21, V3), jnp.float32))

    # gather of K block rows (the read side if kernel wants in/out explicit)
    grid_chan = jax.random.uniform(key, (2049, V3), dtype=jnp.float32)

    @jax.jit
    def row_gather(s):
        out = grid_chan[slots + s % 1]
        return s + (out[0, 0] > 10).astype(jnp.int32)
    chain_time("1ch row-gather (K rows)", row_gather, jnp.int32(0))
    return 0


if __name__ == "__main__":
    sys.exit(main())
