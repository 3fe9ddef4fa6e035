#!/usr/bin/env python
"""Frame-level stage timing on the bench configuration."""

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
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import common, fast
from kimera_semantics_tpu.ops import dedup as dedup_ops
from kimera_semantics_tpu.ops.integrate import integrate_ray_batch


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:<44} {(time.perf_counter()-t0)/reps*1000:9.2f} ms")
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
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    lmap = LabelColorMap.random(cfg.grid.num_labels)
    ds = SyntheticDataset(num_frames=2, intr=intr, label_map=lmap)
    frame = ds.frame(0)
    jax.block_until_ready(frame.depth)
    print("backend:", jax.default_backend())

    prep = jax.jit(lambda f: common.prepare_points(f, intr, cfg))
    out = timeit("prepare_points", prep, frame)
    _, pts_G, origin, colors, labels, weights, valid, clearing = out

    @jax.jit
    def dedup_compact(pts_G, valid, colors, labels, weights, clearing):
        keep, sset = dedup_ops.start_voxel_dedup(
            jnp.full((cfg.pipeline.dedup_table_size,), -1, jnp.int32),
            pts_G, valid, voxel_size_inv=1.0 / cfg.grid.voxel_size,
            subsampling_factor=cfg.tsdf.start_voxel_subsampling_factor)
        return common.compact(keep, cfg.pipeline.max_rays, pts_G, colors,
                              labels, weights, clearing)

    kept, cpts, ccol, clab, cw, cclr = timeit(
        "start dedup + compaction", dedup_compact,
        pts_G, valid, colors, labels, weights, clearing)
    print("   kept rays:", int(jnp.sum(kept)))

    grid = blocks.create(cfg)
    integ = jax.jit(lambda g, *a: integrate_ray_batch(g, cfg, *a))
    grid2 = timeit("integrate_ray_batch (cold grid)", integ, grid,
                   origin, cpts, cw, ccol, clab, cclr, kept)
    timeit("integrate_ray_batch (warm grid)",
           lambda: integ(grid2, origin, cpts, cw, ccol, clab, cclr, kept))
    timeit("full fast.integrate_frame",
           lambda: fast.integrate_frame(grid2, frame, cfg, intr))


if __name__ == "__main__":
    main()
