#!/usr/bin/env python
"""Dissect the projective allocation pass (coarse DDA + insert_frame_list)."""

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
from kimera_semantics_tpu.core import camera as cam, transforms
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks, hash as bhash
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.ops import raycast, tsdf as tsdf_ops
from kimera_semantics_tpu.ops import semantic as sem_ops


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:<52} {(time.perf_counter()-t0)/reps*1000:9.3f} ms",
          flush=True)
    return out


def main():
    print("dev:", jax.devices()[0], flush=True)
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig())
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    ds = SyntheticDataset(num_frames=4, intr=intr,
                          label_map=LabelColorMap.random())
    fr = ds.frame(1)
    g, t = cfg.grid, cfg.tsdf
    grid = blocks.create(cfg)

    for stride in (4, 8):
        sub = intr.scaled(intr.width // stride, intr.height // stride)
        depth = fr.depth[::stride, ::stride]
        labels = fr.labels[::stride, ::stride].reshape(-1)

        @jax.jit
        def prep(depth, labels, T):
            pts_C, px_valid = cam.backproject(depth, sub)
            valid, is_clearing = tsdf_ops.point_validity(pts_C, t)
            valid &= px_valid & sem_ops.dynamic_label_mask(labels,
                                                           cfg.semantic)
            pts_G = transforms.apply(T, pts_C)
            origin = transforms.translation(T)
            start_s, end_s = raycast.setup_rays(
                jnp.broadcast_to(origin, pts_G.shape), pts_G, is_clearing,
                voxel_size=g.block_size,
                truncation_distance=t.truncation_distance,
                max_ray_length_m=t.max_ray_length_m,
                voxel_carving_enabled=t.voxel_carving_enabled)
            return start_s, end_s, valid

        start_s, end_s, valid = timeit(f"[{stride}] prep+setup", prep,
                                       depth, labels, fr.T_G_C)
        import math
        S = int(math.ceil(1.7321 * (t.max_ray_length_m +
                                    t.truncation_distance) / g.block_size)) + 3

        @jax.jit
        def dda(start_s, end_s, valid):
            bvox, bvalid = raycast.traverse_soa(start_s.T, end_s.T, S)
            bx, by, bz = bvox[:, 0], bvox[:, 1], bvox[:, 2]
            bvalid = bvalid & valid[None, :]
            bvalid &= bhash.in_bounds_soa(bx, by, bz, g.world_extent_blocks)
            keys = bhash.pack_block_coords_soa(bx, by, bz,
                                               g.world_extent_blocks)
            return keys, bvalid

        keys, bvalid = timeit(f"[{stride}] coarse DDA (S={S})", dda,
                              start_s, end_s, valid)
        print("  stream:", keys.size, flush=True)

        @jax.jit
        def ifl(grid, keys, bvalid):
            return bhash.insert_frame_list(
                grid.table_keys, grid.table_slots, grid.block_coords,
                grid.n_blocks, keys.reshape(-1), bvalid.reshape(-1),
                g.table_size, g.block_capacity, g.world_extent_blocks,
                cfg.pipeline.block_budget)

        timeit(f"[{stride}] insert_frame_list", ifl, grid, keys, bvalid)

        # sub-stages of insert_frame_list
        @jax.jit
        def sorts(keys, bvalid):
            trash = jnp.int32(0x7FFFFFFF)
            k = jnp.where(bvalid.reshape(-1), keys.reshape(-1), trash)
            sk = jnp.sort(k)
            is_first = jnp.concatenate(
                [jnp.ones((1,), dtype=bool), sk[1:] != sk[:-1]]) & (sk != trash)
            uk = jnp.sort(jnp.where(is_first, sk, trash))[
                :cfg.pipeline.block_budget]
            return uk

        uk = timeit(f"[{stride}]   two sorts", sorts, keys, bvalid)

        @jax.jit
        def ins(grid, uk):
            return bhash.insert(grid.table_keys, grid.table_slots,
                                grid.block_coords, grid.n_blocks, uk,
                                uk != jnp.int32(0x7FFFFFFF), g.table_size,
                                g.block_capacity, g.world_extent_blocks)

        timeit(f"[{stride}]   insert(budget uniques)", ins, grid, uk)

        @jax.jit
        def lku(grid, uk):
            return bhash.lookup(grid.table_keys, grid.table_slots, uk,
                                g.table_size)

        timeit(f"[{stride}]   lookup", lku, grid, uk)
    return 0


if __name__ == "__main__":
    sys.exit(main())
