#!/usr/bin/env python
"""Measure XLA TPU gather/sort variants that the block-accumulate design
depends on: column gathers of (C, N) arrays, row slices, and small sorts."""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:<52} {(time.perf_counter()-t0)/reps*1000:9.2f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    NR = 524288              # runs
    ids = jnp.asarray(rng.permutation(NR).astype(np.int32))
    slots = jnp.asarray(rng.randint(0, 1500, NR).astype(np.int32))

    a16 = jnp.asarray(rng.randn(16, NR).astype(np.float32))
    timeit("gather (16,N)[:, ids]  (column slices)",
           jax.jit(lambda a, i: a[:, i]), a16, ids)
    timeit("take axis1 (16,N)",
           jax.jit(lambda a, i: jnp.take(a, i, axis=1)), a16, ids)
    aT = jnp.asarray(rng.randn(NR, 16).astype(np.float32))
    timeit("gather (N,16)[ids, :]  (row slices)",
           jax.jit(lambda a, i: a[i, :]), aT, ids)
    a1 = jnp.asarray(rng.randn(NR).astype(np.float32))
    timeit("gather (N,)[ids] scalar", jax.jit(lambda a, i: a[i]), a1, ids)

    timeit("sort 524k (key, id) num_keys=1",
           jax.jit(lambda k, i: jax.lax.sort((k, i), num_keys=1)), slots, ids)

    big = jnp.asarray(rng.randn(NR * 11).astype(np.float32))
    bidx = jnp.asarray(rng.randint(0, NR * 11, NR * 11).astype(np.int32))
    timeit("sort 5.8M (key, id)",
           jax.jit(lambda k, i: jax.lax.sort((k, i), num_keys=1)), bidx, bidx)

    # argsort-based permutation apply to 6 channels at run granularity
    def permute6(i, a):
        return tuple(a[:, i] for _ in range(6))
    timeit("6x column-gather (16,N)", jax.jit(permute6), ids, a16)

    # counting per slot + cumsum (offsets)
    @jax.jit
    def offsets(slots):
        cnt = jnp.zeros(4098, jnp.int32).at[slots].add(1)
        return jnp.cumsum(cnt)
    timeit("counts+offsets (524k scatter-add)", offsets, slots)


if __name__ == "__main__":
    main()
