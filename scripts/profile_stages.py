#!/usr/bin/env python
"""Per-stage timing decomposition of the frame-update pipeline on the current
backend. Drives optimization: shows whether DDA, hash ops, or scatters dominate.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))

import numpy as np
import jax
import jax.numpy as jnp

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, TsdfConfig)
from kimera_semantics_tpu.grid import blocks, hash as bhash
from kimera_semantics_tpu.ops import pallas_kernels, reduce as reduce_ops


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<40} {dt*1000:9.2f} ms")
    return out


def main():
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0),
        pipeline=PipelineConfig(max_rays=32768, dedup_table_size=1 << 20),
    )
    g = cfg.grid
    R = cfg.pipeline.max_rays
    S = cfg.resolved_max_steps()
    N = R * S
    print(f"backend={jax.default_backend()} R={R} S={S} N={N}")

    rng = np.random.RandomState(0)
    origin = jnp.zeros((3, R), dtype=jnp.float32)
    # plausible ray endpoints in a room
    pts = jnp.asarray(rng.uniform(-4, 4, (3, R)).astype(np.float32))
    weights = jnp.ones((R,), dtype=jnp.float32)
    flags = jnp.zeros((R,), dtype=bool)
    valid = jnp.ones((R,), dtype=bool)

    stream = timeit("pallas dda_update_stream",
                    lambda: pallas_kernels.dda_update_stream(
                        cfg, origin, pts, weights, flags, valid))
    keys, local, w, wsdf, wc, sv = stream

    grid = blocks.create(cfg)

    @jax.jit
    def alloc(grid, keys, sv):
        changed = jnp.ones(keys.shape, dtype=bool)
        changed = changed.at[1:].set(keys[1:] != keys[:-1])
        tk, ts, bc, nb, ov = bhash.insert(
            grid.table_keys, grid.table_slots, grid.block_coords,
            grid.n_blocks, keys.reshape(-1), (sv & changed).reshape(-1),
            g.table_size, g.block_capacity, g.world_extent_blocks)
        return tk, ts, bc, nb, ov

    tk, ts, bc, nb, ov = timeit("hash insert (alloc pre-pass)",
                                lambda: alloc(grid, keys, sv))
    print(f"   blocks allocated: {int(nb)} overflow {int(ov)}")

    lookup = jax.jit(lambda tk, ts, k: bhash.lookup(
        tk, ts, k.reshape(-1), g.table_size))
    slots_flat = timeit("hash lookup", lambda: lookup(tk, ts, keys))

    n_flat = (g.block_capacity + 1) * g.vps3
    slots = slots_flat.reshape(keys.shape)
    key = jnp.where(sv & (slots >= 0), slots, g.block_capacity) * g.vps3 + local
    kf = key.reshape(-1)
    target = jnp.zeros((n_flat,), dtype=jnp.float32)

    timeit("direct scatter-add (1 channel)",
           jax.jit(lambda t, k, v: t.at[k].add(v.reshape(-1))),
           target, kf, w)

    @jax.jit
    def sorted_scatter(t, k, v):
        su = reduce_ops.SortedUpdates.build(k, trash_key=-1)
        return su.apply(t, v.reshape(-1))

    timeit("sorted scatter (build+1 channel)", sorted_scatter, target, kf, w)

    @jax.jit
    def sorted_scatter7(t, k, w, wsdf, wc):
        su = reduce_ops.SortedUpdates.build(k, trash_key=-1)
        outs = [su.apply(t, v.reshape(-1))
                for v in (w, wsdf, wc, w, wsdf, wc, w)]
        return outs

    timeit("sorted scatter (build+7 channels)", sorted_scatter7,
           target, kf, w, wsdf, wc)

    @jax.jit
    def direct7(t, k, w, wsdf, wc):
        return [t.at[k].add(v.reshape(-1))
                for v in (w, wsdf, wc, w, wsdf, wc, w)]

    timeit("direct scatter-add (7 channels)", direct7, target, kf, w, wsdf, wc)

    # Gather cost reference
    timeit("gather 1 channel by key",
           jax.jit(lambda t, k: t[k]), target, kf)


if __name__ == "__main__":
    main()
