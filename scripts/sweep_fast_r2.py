#!/usr/bin/env python
"""Round-2 TPU sweep of the decimated fast/merged integrators at the
canonical operating point. One process, several (carve_budget, carve_steps,
max_rays) variants; prints fps + overflow + mesh error per variant."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))

import jax
import jax.numpy as jnp

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset

N_FRAMES = int(os.environ.get("SWEEP_FRAMES", "50"))
intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                         width=640, height=480)
label_map = LabelColorMap.random(21)
ds = SyntheticDataset(num_frames=N_FRAMES + 4, intr=intr,
                      label_map=label_map)
frames = [ds.frame(i) for i in range(N_FRAMES + 4)]
jax.block_until_ready(frames[-1].depth)


def cfg_for(max_rays, carve_budget, carve_steps, seg_budget, frac):
    return FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(
            max_rays=max_rays, dedup_table_size=1 << 20,
            scatter_mode="segment", segment_budget=seg_budget,
            stream_active_fraction=frac,
            carve_budget=carve_budget, carve_steps=carve_steps),
    )


def run(name, model_name, cfg, mesh_eval=False):
    if model_name == "fast":
        from kimera_semantics_tpu.models import fast as mod
    else:
        from kimera_semantics_tpu.models import merged as mod
    grid = blocks.create(cfg)
    t0 = time.perf_counter()
    for f in frames[:4]:
        grid = mod.integrate_frame(grid, f, cfg, intr)
    jax.block_until_ready(grid.wsum)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for f in frames[4:4 + N_FRAMES]:
        grid = mod.integrate_frame(grid, f, cfg, intr)
    jax.block_until_ready(grid.wsum)
    dt = (time.perf_counter() - t0) / N_FRAMES
    line = (f"{name:<44} {1000*dt:7.2f} ms/frame  {1/dt:7.1f} fps  "
            f"blocks={int(grid.n_blocks)} ov={int(grid.overflow)} "
            f"(compile {compile_s:5.1f}s)")
    if mesh_eval:
        from kimera_semantics_tpu.ops import mesh as mesh_ops
        from kimera_semantics_tpu.sim import eval as sim_eval
        m = mesh_ops.extract_mesh(grid, cfg, label_map=label_map)
        if int(m.num_triangles):
            err = sim_eval.mesh_surface_error(m.vertices, ds.world)
            line += (f" mesh_mean={err['mean']*1000:.1f}mm "
                     f"p95={err['p95']*1000:.1f}mm tris={int(m.num_triangles)}")
    print(line, flush=True)


print(f"backend={jax.default_backend()} frames={N_FRAMES}", flush=True)
run("fast decim cb=24576 cs=32 R=32k sb=2^17 f=.75",
    "fast", cfg_for(32768, 24576, 32, 1 << 17, 0.75), mesh_eval=True)
run("fast decim cb=12288 cs=32 R=32k sb=2^17 f=.9",
    "fast", cfg_for(32768, 12288, 32, 1 << 17, 0.9))
run("fast decim cb=24576 cs=16 R=32k sb=2^17 f=.9",
    "fast", cfg_for(32768, 24576, 16, 1 << 17, 0.9))
run("fast decim cb=24576 cs=32 R=16k sb=2^16 f=.75",
    "fast", cfg_for(16384, 24576, 32, 1 << 16, 0.75), mesh_eval=True)
run("merged decim cb=24576 cs=32 R=32k",
    "merged", cfg_for(32768, 24576, 32, 1 << 17, 0.75), mesh_eval=True)
print("done", flush=True)
