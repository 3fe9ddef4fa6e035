#!/usr/bin/env python
"""Pin down the XLA TPU scatter/gather cost model with reliable timing:
  A. scalar scatter cost vs N            (linear? rate?)
  B. scalar scatter cost vs target MB    (VMEM cliff?)
  C. row scatter (N,128) cost vs N       (per-index or per-element?)
  D. row gather  (N,128) cost vs N
"""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, tgt, *args, reps=10):
    out = fn(tgt, *args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    cur = tgt
    for _ in range(reps):
        cur = fn(cur, *args)
    _ = float(jnp.asarray(cur).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<56} {dt*1000:9.3f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)

    print("--- A: scalar scatter vs N (target 64MB) ---")
    M = 16 * 1024 * 1024
    tgt = jnp.zeros((M,), jnp.float32)
    f = jax.jit(lambda t, k, v: t.at[k].add(v))
    for N in [65536, 262144, 1048576, 4194304]:
        k = jnp.asarray(rng.randint(0, M, N).astype(np.int32))
        v = jnp.asarray(rng.rand(N).astype(np.float32))
        dt = timeit(f"scatter N={N:>8}", f, tgt, k, v)
        print(f"      {dt/N*1e9:7.2f} ns/elem")

    print("--- B: scalar scatter vs target size (N=1M) ---")
    N = 1048576
    v = jnp.asarray(rng.rand(N).astype(np.float32))
    for mb in [1, 4, 16, 64, 256]:
        Mi = mb * 256 * 1024
        k = jnp.asarray(rng.randint(0, Mi, N).astype(np.int32))
        t = jnp.zeros((Mi,), jnp.float32)
        timeit(f"scatter 1M -> {mb:>4} MB", f, t, k, v)

    print("--- C: row scatter (N,128) vs N (target (128K,128)=64MB) ---")
    Mr = 131072
    tr = jnp.zeros((Mr, 128), jnp.float32)
    fr = jax.jit(lambda t, k, v: t.at[k].add(v))
    for N in [8192, 32768, 131072, 524288]:
        k = jnp.asarray(rng.randint(0, Mr, N).astype(np.int32))
        v = jnp.asarray(rng.rand(N, 128).astype(np.float32))
        dt = timeit(f"row-scatter N={N:>7}", fr, tr, k, v)
        print(f"      {dt/N*1e9:7.2f} ns/row  {dt/(N*128)*1e9:6.3f} ns/elem")

    print("--- C2: (8,128) tile scatter via 3D target ---")
    t3 = jnp.zeros((Mr // 8, 8, 128), jnp.float32)
    f3 = jax.jit(lambda t, k, v: t.at[k].add(v))
    for N in [8192, 65536]:
        k = jnp.asarray(rng.randint(0, Mr // 8, N).astype(np.int32))
        v = jnp.asarray(rng.rand(N, 8, 128).astype(np.float32))
        dt = timeit(f"tile-scatter(8x128) N={N:>6}", f3, t3, k, v)
        print(f"      {dt/N*1e9:7.2f} ns/tile {dt/(N*1024)*1e9:6.3f} ns/elem")

    print("--- D: row gather (N,128) from 64MB ---")
    src = jnp.asarray(rng.rand(Mr, 128).astype(np.float32))
    fg = jax.jit(lambda s, k: s.at[0].add(s[k].sum(0)))
    for N in [32768, 524288]:
        k = jnp.asarray(rng.randint(0, Mr, N).astype(np.int32))
        dt = timeit(f"row-gather N={N:>7}", fg, src, k)
        print(f"      {dt/N*1e9:7.2f} ns/row")
    print("--- D2: scalar gather 5.9M from 64MB ---")
    N = 5898240
    k = jnp.asarray(rng.randint(0, M, N).astype(np.int32))
    s1 = jnp.asarray(rng.rand(M).astype(np.float32))
    dt = timeit("scalar gather 5.9M",
                jax.jit(lambda s, k: s + s[k].sum()), s1, k)
    print(f"      {dt/N*1e9:7.2f} ns/elem")


if __name__ == "__main__":
    main()
