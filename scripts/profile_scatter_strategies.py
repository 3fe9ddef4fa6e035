#!/usr/bin/env python
"""Reliable comparison of scatter-add strategies for the frame-update hot
path. Times are measured with chained data dependencies (rep i+1 consumes
rep i's output) plus a final host fetch — block_until_ready alone is not
trustworthy over the axon tunnel.

Workload mirrors the fast integrator: N = S*R update entries with realistic
duplicate structure (runs of ~vps consecutive voxels within a block), four
f32 channels (wsum, wsdf, sem_count, sem_delta-by-label) scattered into
(cap+1)*v3-sized grid channels.
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
    _ = float(jnp.asarray(out[0] if isinstance(out, tuple) else out).ravel()[0])
    t0 = time.perf_counter()
    cur = tgt
    for _ in range(reps):
        cur = fn(cur, *args)
        if isinstance(cur, tuple):
            cur = cur[0]
    _ = float(jnp.asarray(cur).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<58} {dt*1000:9.2f} ms", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    S, R = 180, 32768
    N = S * R
    cap, v3, L = 4096, 4096, 21
    M = (cap + 1) * v3
    print(f"N={N} M={M} ({M*4/2**20:.0f} MB/channel)")

    # Realistic keys: per (step,ray) block slot changes every ~16 steps,
    # local index walks. Emulate with sorted-ish random block slots.
    n_blocks = 1500
    blk = rng.randint(0, n_blocks, (N // 16,)).astype(np.int32)
    blk = np.repeat(blk, 16)
    loc = rng.randint(0, v3, (N // 16,)).astype(np.int32)
    loc = (np.repeat(loc, 16) + np.tile(np.arange(16), N // 16)) % v3
    keys_np = blk * v3 + loc
    kf = jnp.asarray(keys_np)
    w = jnp.asarray(rng.rand(N).astype(np.float32))
    wsdf = jnp.asarray(rng.rand(N).astype(np.float32))
    cnt = jnp.asarray((rng.rand(N) > 0.1).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, L, N).astype(np.int32))
    tgt = jnp.zeros((M,), jnp.float32)
    tgt4 = jnp.zeros((4, M), jnp.float32)
    tgtL = jnp.zeros((L * M,), jnp.float32)

    # --- 1. direct single-channel scatter ---
    timeit("direct scatter 1ch", jax.jit(lambda t, k, v: t.at[k].add(v)),
           tgt, kf, w)

    # --- 2. direct 4 channels (the current pipeline shape) ---
    @jax.jit
    def direct4(t, k, a, b, c):
        o0 = t.at[k].add(a)
        o1 = t.at[k].add(b)
        o2 = t.at[k].add(c)
        o3 = t.at[k].add(a)
        return o0 + o1 + o2 + o3
    timeit("direct scatter 4ch", direct4, tgt, kf, w, wsdf, cnt)

    # --- 3. complex64 packing: 2 channels per scatter ---
    @jax.jit
    def cplx2(t, k, a, b):
        z = jax.lax.complex(a, b)
        zt = jax.lax.complex(t, t)
        out = zt.at[k].add(z)
        return jnp.real(out) + jnp.imag(out)
    timeit("complex64 scatter (2ch in 1)", cplx2, tgt, kf, w, wsdf)

    # --- 4. 2D scatter: one scatter op, 4-row updates ---
    @jax.jit
    def scat2d(t4, k, a, b, c):
        vals = jnp.stack([a, b, c, a], axis=0)          # (4, N)
        return t4.at[:, k].add(vals)
    timeit("2D scatter (4,M).at[:,k]", scat2d, tgt4, kf, w, wsdf, cnt)

    # --- 5. sort + segment + unique scatter (SortedUpdates) ---
    from kimera_semantics_tpu.ops.reduce import SortedUpdates

    @jax.jit
    def sorted4(t, k, a, b, c):
        su = SortedUpdates.build(k, trash_key=-1)
        o0 = su.apply(t, a)
        o1 = su.apply(t, b)
        o2 = su.apply(t, c)
        o3 = su.apply(t, a)
        return o0 + o1 + o2 + o3
    timeit("sorted 4ch (1 sort + 4 apply)", sorted4, tgt, kf, w, wsdf, cnt)

    # --- 6. sorted multi-channel: segment sums stacked, one 2D scatter ---
    @jax.jit
    def sorted_stack(t4, k, a, b, c):
        su = SortedUpdates.build(k, trash_key=-1)
        sums = su.segment_sums(jnp.stack([a, b, c, a], axis=1))  # (N, 4)
        slot = jnp.arange(k.shape[0], dtype=jnp.int32)
        safe = jnp.where(su.out_keys >= 0, su.out_keys,
                         t4.shape[1] + slot % 4096)
        return t4.at[:, safe].add(sums.T, mode="drop")
    timeit("sorted stacked (1 sort + 1 2D scatter)", sorted_stack,
           tgt4, kf, w, wsdf, cnt)

    # --- 7. sem_delta-style scatter into L*M ---
    @jax.jit
    def sem_scatter(tL, k, lab, c):
        lkey = jnp.where(c > 0, lab * M + k, jnp.int32(L * M))
        return tL.at[lkey].add(c, mode="drop")
    timeit("sem_delta scatter (L*M target)", sem_scatter, tgtL, kf, lab, cnt)

    # --- 8. unique sorted scatter only (upper bound for sorted paths) ---
    su_np = np.unique(keys_np)
    uk = jnp.asarray(su_np)
    uv = jnp.asarray(rng.rand(su_np.size).astype(np.float32))
    print(f"   unique keys: {su_np.size}")
    timeit("unique+sorted scatter (n_unique)",
           jax.jit(lambda t, k, v: t.at[k].add(v, unique_indices=True,
                                               indices_are_sorted=True)),
           tgt, uk, uv)
    timeit("unique (unsorted promise) scatter",
           jax.jit(lambda t, k, v: t.at[k].add(v, unique_indices=True)),
           tgt, uk, uv)

    # --- 9. one big sort of (key, 4 payloads) ---
    @jax.jit
    def just_sort(t, k, a, b, c):
        sk, sa, sb, sc = jax.lax.sort((k, a, b, c), num_keys=1)
        return t + sk[0] + sa[0], sk
    timeit("sort (key + 3 payloads)", just_sort, tgt, kf, w, wsdf, cnt)


if __name__ == "__main__":
    main()
