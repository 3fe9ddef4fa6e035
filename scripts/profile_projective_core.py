#!/usr/bin/env python
"""Go/no-go microbenchmark for the projective (voxel-centric) integrator.

Measures the three primitives the design rests on, at realistic sizes
(K touched blocks x vps^3 voxels, 64x64 image patches from a mip atlas):

  1. patch extraction   — vmapped dynamic_slice (K slices of (64,64))
  2. one-hot MXU gather — val[k,v] = patch[k, vrow[k,v], vcol[k,v]] via
                          two one-hot contractions (beats XLA's ~11-14
                          ns/index serial gather by using the MXU)
  3. grid row-scatter   — channel.at[slots].add(delta (K,4096)) row payloads

plus the XLA serial-gather baseline for contrast. Timing is chained-
dependency; an empty-fetch baseline estimates the tunnel RTT to subtract.
"""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
import numpy as np
import jax
import jax.numpy as jnp

K = 512          # touched-block budget per frame
V3 = 4096        # vps=16 voxels per block
WIN = 64         # patch window (mip level chosen so bbox fits)
AH, AW = 480, 1280   # mip atlas (lvl0 640 + lvl1 320 + lvl2 160 + lvl3 80 -> pad)
NCH = 3          # depth, label, packed color


def timeit(name, fn, *args, reps=20, rtt=0.0):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps - rtt
    print(f"{name:<52} {dt*1000:9.3f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), "dev:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    atlas = jax.random.uniform(key, (NCH, AH, AW), dtype=jnp.float32) * 5.0
    v0 = jax.random.randint(key, (K,), 0, AH - WIN).astype(jnp.int32)
    u0 = jax.random.randint(key, (K,), 0, AW - WIN).astype(jnp.int32)
    # per-voxel patch-local coords (what projection math produces)
    vrow = jax.random.randint(key, (K, V3), 0, WIN).astype(jnp.int32)
    vcol = jax.random.randint(key, (K, V3), 0, WIN).astype(jnp.int32)
    wsum = jnp.zeros((2049, V3), jnp.float32)
    slots = jax.random.permutation(key, 2048)[:K].astype(jnp.int32)
    delta = jax.random.uniform(key, (K, V3), dtype=jnp.float32)
    jax.block_until_ready((atlas, vrow, vcol, wsum, delta))

    # RTT baseline: fetch a tiny dependent value
    @jax.jit
    def tiny(x):
        return x + 1.0
    s = jnp.float32(0)
    tiny(s)
    t0 = time.perf_counter()
    for _ in range(20):
        s = tiny(s)
    jax.block_until_ready(s)
    rtt = 0.0  # chained ops queue async; block only once at end
    print(f"{'20x tiny chained (dispatch floor)':<52} "
          f"{(time.perf_counter()-t0)/20*1000:9.3f} ms", flush=True)

    # 1. patch extraction
    @jax.jit
    def extract(atlas, v0, u0):
        def one(v, u):
            return jax.lax.dynamic_slice(atlas, (0, v, u), (NCH, WIN, WIN))
        return jax.vmap(one)(v0, u0)  # (K, NCH, WIN, WIN)

    patches = extract(atlas, v0, u0)
    timeit("patch extract vmap dyn_slice (K,3,64,64)", extract, atlas, v0, u0)

    # 2a. one-hot MXU gather, f32
    def onehot_gather(patches, vrow, vcol):
        r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN), 2)
        R = (vrow[:, :, None] == r).astype(jnp.float32)      # (K,V3,WIN)
        C = (vcol[:, :, None] == r).astype(jnp.float32)      # (K,V3,WIN)
        # D[k,v,c,ch] = sum_r R[k,v,r] patch[k,ch,r,c]
        D = jnp.einsum("kvr,khrc->kvch", R, patches,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("kvch,kvc->kvh", D, C)             # (K,V3,NCH)

    og = jax.jit(onehot_gather)
    out1 = og(patches, vrow, vcol)
    timeit("one-hot MXU gather f32 (3ch)", og, patches, vrow, vcol)

    # 2b. bf16 one-hots, f32 patch split hi/lo not needed for labels; try plain
    def onehot_gather_bf16(patches, vrow, vcol):
        r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN), 2)
        R = (vrow[:, :, None] == r).astype(jnp.bfloat16)
        C = (vcol[:, :, None] == r).astype(jnp.bfloat16)
        hi = patches.astype(jnp.bfloat16)
        lo = (patches - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        Dh = jnp.einsum("kvr,khrc->kvch", R, hi,
                        preferred_element_type=jnp.float32)
        Dl = jnp.einsum("kvr,khrc->kvch", R, lo,
                        preferred_element_type=jnp.float32)
        D = Dh + Dl
        return jnp.einsum("kvch,kvc->kvh", D, C.astype(jnp.float32))

    ogb = jax.jit(onehot_gather_bf16)
    out2 = ogb(patches, vrow, vcol)
    err = float(jnp.max(jnp.abs(out2 - out1)))
    timeit(f"one-hot MXU gather bf16-split (err {err:.2e})", ogb, patches,
           vrow, vcol)

    # 2c. XLA serial gather baseline
    @jax.jit
    def serial_gather(patches, vrow, vcol):
        flat = patches.reshape(K, NCH, WIN * WIN)
        idx = vrow * WIN + vcol                              # (K,V3)
        return jnp.take_along_axis(flat, idx[:, None, :], axis=2)

    sg = serial_gather(patches, vrow, vcol)
    jax.block_until_ready(sg)
    timeit("XLA take_along_axis baseline (3ch)", serial_gather, patches,
           vrow, vcol)

    # correctness of onehot vs serial
    err = float(jnp.max(jnp.abs(out1 - jnp.moveaxis(sg, 1, 2))))
    print(f"onehot vs serial max err: {err:.2e}", flush=True)

    # 3. grid row scatter (4 channels' worth)
    @jax.jit
    def row_scatter(wsum, delta):
        for _ in range(4):
            wsum = wsum.at[slots].add(delta, mode="drop",
                                      unique_indices=True)
        return wsum

    row_scatter(wsum, delta)
    timeit("grid row-scatter x4 ch (K rows of 4096)", row_scatter, wsum, delta)

    # 3b. sem_delta-shaped scatter: (L=21, B+1, V3) over axis 1
    sem = jnp.zeros((21, 2049, V3), jnp.float32)
    sdelta = jax.random.uniform(key, (21, K, V3), dtype=jnp.float32)

    @jax.jit
    def sem_scatter(sem, sdelta):
        return sem.at[:, slots].add(sdelta, mode="drop", unique_indices=True)

    sem_scatter(sem, sdelta)
    timeit("sem_delta scatter (21,K,4096) over axis1", sem_scatter, sem, sdelta)

    # 4. end-to-end fused shape: transform math + gather + update terms
    Tcg = jnp.eye(4, dtype=jnp.float32)
    bxyz = jax.random.randint(key, (K, 3), -20, 20).astype(jnp.int32)

    @jax.jit
    def full_block_update(atlas, v0, u0, bxyz, wsum):
        # voxel centers
        lin = jnp.arange(V3, dtype=jnp.int32)
        lx, ly, lz = lin // 256, (lin // 16) % 16, lin % 16
        cx = (bxyz[:, 0:1] * 16 + lx[None]).astype(jnp.float32) * 0.05 + 0.025
        cy = (bxyz[:, 1:2] * 16 + ly[None]).astype(jnp.float32) * 0.05 + 0.025
        cz = (bxyz[:, 2:3] * 16 + lz[None]).astype(jnp.float32) * 0.05 + 0.025
        # camera transform (world->cam), project
        X = Tcg[0, 0] * cx + Tcg[0, 1] * cy + Tcg[0, 2] * cz + Tcg[0, 3]
        Y = Tcg[1, 0] * cx + Tcg[1, 1] * cy + Tcg[1, 2] * cz + Tcg[1, 3]
        Z = Tcg[2, 0] * cx + Tcg[2, 1] * cy + Tcg[2, 2] * cz + Tcg[2, 3]
        Zs = jnp.maximum(Z, 1e-3)
        u = 320.0 * X / Zs + 319.5
        v = 320.0 * Y / Zs + 239.5
        vr = jnp.clip(v.astype(jnp.int32) - v0[:, None], 0, WIN - 1)
        vc = jnp.clip(u.astype(jnp.int32) - u0[:, None], 0, WIN - 1)
        patches = jax.vmap(
            lambda a, b: jax.lax.dynamic_slice(atlas, (0, a, b),
                                               (NCH, WIN, WIN)))(v0, u0)
        r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN), 2)
        R = (vr[:, :, None] == r).astype(jnp.float32)
        C = (vc[:, :, None] == r).astype(jnp.float32)
        D = jnp.einsum("kvr,khrc->kvch", R, patches,
                       preferred_element_type=jnp.float32)
        samp = jnp.einsum("kvch,kvc->kvh", D, C)             # (K,V3,3)
        depth = samp[..., 0]
        sdf = depth - Z
        w = jnp.where(Z > 0.1, 1.0 / jnp.maximum(Z * Z, 1e-6), 0.0)
        mask = (sdf > -0.1) & (depth > 0)
        w = jnp.where(mask, w, 0.0)
        wsdf = w * jnp.clip(sdf, -0.1, 0.1)
        wsum = wsum.at[slots].add(w, mode="drop", unique_indices=True)
        wsum = wsum.at[slots].add(wsdf, mode="drop", unique_indices=True)
        return wsum

    full_block_update(atlas, v0, u0, bxyz, wsum)
    timeit("FULL fake projective update (2ch out)", full_block_update,
           atlas, v0, u0, bxyz, wsum)
    return 0


if __name__ == "__main__":
    sys.exit(main())
