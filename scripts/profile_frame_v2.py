#!/usr/bin/env python
"""Stage decomposition of the current (segment-mode) frame pipeline on the
bench scene, with chained-dependency timing (reliable over the axon tunnel).
"""

import os, sys, time
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
from kimera_semantics_tpu.models import common as mcommon, fast
from kimera_semantics_tpu.ops import dedup as dedup_ops
from kimera_semantics_tpu.ops import pallas_kernels
from kimera_semantics_tpu.ops.reduce import TRASH_KEY, segment_compact_reduce


def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<46} {dt*1000:9.2f} ms", flush=True)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(max_rays=32768, dedup_table_size=1 << 20),
    )
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    label_map = LabelColorMap.random(cfg.grid.num_labels)
    ds = SyntheticDataset(num_frames=4, intr=intr, label_map=label_map)
    fr = ds.frame(1)
    jax.block_until_ready(fr.depth)
    grid = blocks.create(cfg)
    R = cfg.pipeline.max_rays

    # full frame (reference point)
    g2 = timeit("FULL integrate_frame", jax.jit(
        lambda g: fast.integrate_frame(g, fr, cfg, intr).wsum), grid)

    # stage 1: prep + dedup + compact
    @jax.jit
    def prep(grid):
        (_, pts_G, origin, colors, labels, weights, valid,
         clearing) = mcommon.prepare_points(fr, intr, cfg)
        keep, ss = dedup_ops.start_voxel_dedup(
            grid.start_set, pts_G, valid,
            voxel_size_inv=1.0 / cfg.grid.voxel_size,
            subsampling_factor=cfg.tsdf.start_voxel_subsampling_factor)
        kept, pts_G, colors, labels, weights, clearing = mcommon.compact(
            keep, R, pts_G, colors, labels, weights, clearing)
        return kept, pts_G, origin, labels, weights, clearing
    kept, pts_G, origin, labels, weights, clearing = timeit(
        "prep+dedup+compact", prep, grid)

    # stage 2: pallas DDA stream
    @jax.jit
    def dda(pts_G, weights, clearing, kept):
        o3 = jnp.broadcast_to(origin, pts_G.shape).T
        return pallas_kernels.dda_update_stream(
            cfg, o3, pts_G.T, weights, clearing, kept)
    keys, local, w, wsdf, wc, sv, run_key, run_idx = timeit(
        "pallas dda_update_stream", dda, pts_G, weights, clearing, kept)

    # stage 3: hash insert + lookup (run-compacted)
    g_cfg = cfg.grid

    @jax.jit
    def hash_ops(grid, run_key):
        active = run_key >= 0
        tk, ts_, bc, nb, ov = bhash.insert(
            grid.table_keys, grid.table_slots, grid.block_coords,
            grid.n_blocks, run_key.reshape(-1), active.reshape(-1),
            g_cfg.table_size, g_cfg.block_capacity, g_cfg.world_extent_blocks)
        rs = bhash.lookup(tk, ts_, run_key.reshape(-1), g_cfg.table_size)
        return rs
    rs = timeit("hash insert+lookup (runs)", hash_ops, grid, run_key)

    # stage 4: run->step slot broadcast (select-sum loop)
    @jax.jit
    def broadcast_slots(rs, run_idx):
        run_slots = rs.reshape(run_key.shape)
        slots = jnp.zeros(keys.shape, dtype=jnp.int32)
        for p in range(run_key.shape[0]):
            slots = slots + jnp.where(run_idx == p, run_slots[p][None, :], 0)
        return slots
    slots = timeit("run->step slot broadcast", broadcast_slots, rs, run_idx)

    # stage 5: segment reduce (3ch) + scatters
    v3, cap, L = g_cfg.vps3, g_cfg.block_capacity, g_cfg.num_labels
    n_flat = (cap + 1) * v3
    key = jnp.where(sv, slots * v3 + local, cap * v3)
    lab_b = jnp.broadcast_to(labels[None, :].astype(jnp.int32), key.shape)

    @jax.jit
    def segred(key, w, wsdf, lab_b, sv):
        k2 = jnp.where(sv, (key << 5) | jnp.clip(lab_b, 0, 31),
                       TRASH_KEY)
        cnt = jnp.where(sv, 1.0, 0.0)
        return segment_compact_reduce(
            k2.reshape(-1), (w.reshape(-1), wsdf.reshape(-1),
                             cnt.reshape(-1)), cfg.pipeline.segment_budget,
            max_run=R)
    ok, (tw, tsdf_s, tcnt), nd = timeit("segment_compact_reduce 3ch",
                                        segred, key, w, wsdf, lab_b, sv)

    @jax.jit
    def scatters(ok, tw, tsdf_s, tcnt):
        seg_valid = ok != TRASH_KEY
        vox = jnp.where(seg_valid, ok >> 5, n_flat)
        t = jnp.zeros((n_flat,), jnp.float32)
        o1 = t.at[vox].add(tw, mode="drop", indices_are_sorted=True)
        o2 = t.at[vox].add(tsdf_s, mode="drop", indices_are_sorted=True)
        o3 = t.at[vox].add(tcnt, mode="drop", indices_are_sorted=True)
        lab = ok & 31
        sk = jnp.where(seg_valid, lab * n_flat + vox, L * n_flat)
        t2 = jnp.zeros((L * n_flat,), jnp.float32)
        o4 = t2.at[sk].add(tcnt, mode="drop", unique_indices=True)
        return o1[0] + o2[0] + o3[0] + o4[0]
    timeit("4 compacted scatters", scatters, ok, tw, tsdf_s, tcnt)


if __name__ == "__main__":
    main()
