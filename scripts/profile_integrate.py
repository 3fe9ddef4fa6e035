#!/usr/bin/env python
"""Surgical decomposition of integrate_ray_batch on real frame data."""

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
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks, hash as bhash
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import common
from kimera_semantics_tpu.ops import dedup as dedup_ops, pallas_kernels


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:<44} {(time.perf_counter()-t0)/reps*1000:9.2f} ms", flush=True)
    return out


def main():
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        use_const_weight=False),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(max_rays=32768, dedup_table_size=1 << 20),
    )
    g = cfg.grid
    vps, v3, cap, L = g.voxels_per_side, g.vps3, g.block_capacity, g.num_labels
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    lmap = LabelColorMap.random(L)
    ds = SyntheticDataset(num_frames=2, intr=intr, label_map=lmap)
    frame = ds.frame(0)
    print("backend:", jax.default_backend(), flush=True)

    @jax.jit
    def prep(frame):
        (_, pts_G, origin, colors, labels, weights, valid,
         clearing) = common.prepare_points(frame, intr, cfg)
        keep, _ = dedup_ops.start_voxel_dedup(
            jnp.full((cfg.pipeline.dedup_table_size,), -1, jnp.int32),
            pts_G, valid, voxel_size_inv=1.0 / g.voxel_size,
            subsampling_factor=cfg.tsdf.start_voxel_subsampling_factor)
        kept, pts_G, colors, labels, weights, clearing = common.compact(
            keep, cfg.pipeline.max_rays, pts_G, colors, labels, weights,
            clearing)
        return origin, pts_G, colors, labels, weights, clearing, kept

    origin, pts_G, colors, labels, weights, clearing, kept = prep(frame)

    stream = timeit("pallas kernel", jax.jit(
        lambda o, p, w, c, v: pallas_kernels.dda_update_stream(
            cfg, jnp.broadcast_to(o, p.shape).T, p.T, w, c, v)),
        origin, pts_G, weights, clearing, kept)
    keys, local, w, wsdf, wc, sv, run_key, run_idx = stream
    print("   valid steps:", int(jnp.sum(sv)),
          "valid runs:", int(jnp.sum(run_key >= 0)), flush=True)

    grid = blocks.create(cfg)
    active = run_key >= 0

    @jax.jit
    def ins(grid, run_key, active):
        return bhash.insert(grid.table_keys, grid.table_slots,
                            grid.block_coords, grid.n_blocks,
                            run_key.reshape(-1), active.reshape(-1),
                            g.table_size, cap, g.world_extent_blocks)

    tk, ts, bc, nb, ov = timeit("hash insert (runs)", ins, grid, run_key,
                                active)
    print("   blocks:", int(nb), flush=True)

    lk = timeit("hash lookup (runs)", jax.jit(
        lambda tk, ts, k: bhash.lookup(tk, ts, k.reshape(-1), g.table_size)),
        tk, ts, run_key)
    run_slots = jnp.where(active & (lk.reshape(run_key.shape) >= 0),
                          lk.reshape(run_key.shape), cap)

    @jax.jit
    def select(run_idx, run_slots, sv):
        slots = jnp.zeros(run_idx.shape, dtype=jnp.int32)
        for p in range(run_slots.shape[0]):
            slots = slots + jnp.where(run_idx == p, run_slots[p][None, :], 0)
        return jnp.where(sv, slots, cap)

    slots = timeit("run->step select-sum", select, run_idx, run_slots, sv)
    key = slots * v3 + local
    kf = key.reshape(-1)
    n_flat = (cap + 1) * v3

    t1 = jnp.zeros((n_flat,), dtype=jnp.float32)
    timeit("scatter wsum", jax.jit(lambda t, k, v: t.at[k].add(v.reshape(-1))),
           t1, kf, w)
    timeit("scatter wsum+wsdf+cnt", jax.jit(
        lambda t, k, a, b, c: (t.at[k].add(a.reshape(-1)),
                               t.at[k].add(b.reshape(-1)),
                               t.at[k].add(c.reshape(-1)))),
        t1, kf, w, wsdf, wc)

    lab_b = jnp.broadcast_to(labels[None, :].astype(jnp.int32), key.shape)
    lkey = jnp.where(sv, lab_b * n_flat + key, L * n_flat)
    t2 = jnp.zeros((L * n_flat,), dtype=jnp.float32)
    timeit("scatter sem_delta (big target)", jax.jit(
        lambda t, k, v: t.at[k.reshape(-1)].add(v.reshape(-1), mode="drop")),
        t2, lkey, w)

    # Candidate: compact valid entries per ray-sorted slabs?
    frac = float(jnp.mean(sv.astype(jnp.float32)))
    print(f"   valid fraction of stream: {frac:.3f}", flush=True)


if __name__ == "__main__":
    main()
