#!/usr/bin/env python
"""Scatter-add cost vs target array size — locates the VMEM cliff."""

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
    print(f"{name:<56} {(time.perf_counter()-t0)/reps*1000:9.2f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    N = 5_898_240
    vals = jnp.asarray(rng.rand(N).astype(np.float32))
    for mb in [1, 2, 4, 8, 16, 32, 64, 128, 352]:
        M = mb * 256 * 1024
        idx = jnp.asarray(rng.randint(0, M, N).astype(np.int32))
        tgt = jnp.zeros((M,), jnp.float32)
        timeit(f"scatter-add 5.9M -> {mb:4d} MB target",
               jax.jit(lambda t, k, v: t.at[k].add(v)), tgt, idx, vals)
    # gather comparison at two sizes
    for mb in [4, 64]:
        M = mb * 256 * 1024
        idx = jnp.asarray(rng.randint(0, M, N).astype(np.int32))
        src = jnp.asarray(rng.rand(M).astype(np.float32))
        timeit(f"gather 5.9M <- {mb:4d} MB source",
               jax.jit(lambda s, k: s[k]), src, idx)
    # segment-style: sorted indices, unique promise
    M = 352 * 256 * 1024
    sidx = jnp.asarray(np.sort(rng.choice(M, N, replace=False)).astype(np.int32))
    tgt = jnp.zeros((M,), jnp.float32)
    timeit("scatter-add 5.9M sorted+unique -> 352MB",
           jax.jit(lambda t, k, v: t.at[k].add(
               v, unique_indices=True, indices_are_sorted=True)), tgt, sidx, vals)


if __name__ == "__main__":
    main()
