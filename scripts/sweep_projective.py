#!/usr/bin/env python
"""One-process sweep of projective-pipeline knobs at the bench operating
point (vps=16, 0.05 m voxels, 640x480, 32768-ray alloc set). Each variant
times the real donated integrate_frame over a fresh grid — the same loop
bench.py runs — so results transfer directly to bench defaults.

No compile cache exists on the axon backend: running every variant in one
process is the cheap way to ask several questions per compile-session.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import projective as proj


def run_variant(frames, intr, stride, budget, patch_rows, patch_cols,
                warm=4):
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(max_rays=32768, dedup_table_size=1 << 20,
                                alloc_stride=stride, block_budget=budget,
                                patch_rows=patch_rows, patch_cols=patch_cols))
    grid = blocks.create(cfg)
    for f in frames[:warm]:
        grid = proj.integrate_frame(grid, f, cfg, intr)
    jax.block_until_ready(grid.wsum)
    t0 = time.perf_counter()
    for f in frames[warm:]:
        grid = proj.integrate_frame(grid, f, cfg, intr)
    jax.block_until_ready(grid.wsum)
    dt = (time.perf_counter() - t0) / (len(frames) - warm)
    ov = int(grid.overflow)
    nb = int(grid.n_blocks)
    print(f"stride={stride:<3} budget={budget:<4} patch={patch_rows}x"
          f"{patch_cols}: {dt * 1000:7.3f} ms/frame  "
          f"({1.0 / dt:6.1f} fps)  blocks={nb} overflow={ov}", flush=True)


def main():
    print("dev:", jax.devices()[0], flush=True)
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    lmap = LabelColorMap.random(21)
    n = int(os.environ.get("SWEEP_FRAMES", "44"))
    ds = SyntheticDataset(num_frames=n, intr=intr, label_map=lmap)
    frames = [ds.frame(i) for i in range(n)]
    jax.block_until_ready(frames[-1].depth)

    import json
    env = os.environ.get("SWEEP_VARIANTS")
    variants = json.loads(env) if env is not None else [
        (8, 512, 128, 256),    # bench defaults
        (8, 256, 128, 256),    # tighter block list (fewer trash tiles)
        (16, 256, 128, 256),   # coarser alloc rays
        (8, 256, 64, 256),     # smaller sampler patch window
    ]
    for v in variants:
        run_variant(frames, intr, *v)
    return 0


if __name__ == "__main__":
    sys.exit(main())
