#!/usr/bin/env python
"""Stage decomposition of the projective frame pipeline on the bench scene
(chained-dependency timing; each stage isolated in its own jit)."""

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
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import projective as proj_model
from kimera_semantics_tpu.ops import mip as mip_ops
from kimera_semantics_tpu.ops import projective as proj_ops
from kimera_semantics_tpu.ops import pallas_kernels


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
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig())
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    label_map = LabelColorMap.random(cfg.grid.num_labels)
    ds = SyntheticDataset(num_frames=4, intr=intr, label_map=label_map)
    fr = ds.frame(1)
    jax.block_until_ready(fr.depth)
    plan = mip_ops.make_plan(intr.height, intr.width,
                             cfg.pipeline.sample_window)

    grid = blocks.create(cfg)
    full = jax.jit(lambda g, f: proj_model.integrate_frame(g, f, cfg, intr
                                                           ).wsum[0, 0])
    timeit("FULL integrate_frame", full, grid, fr)

    atlas = timeit("mip atlas", jax.jit(
        lambda f: mip_ops.build_atlas(f.depth, f.labels, f.colors, plan)), fr)

    alloc = jax.jit(lambda g, f: proj_model._allocate(g, f, cfg, intr))
    grid2, fcoords, fslots = timeit("allocate (coarse DDA+insert+list)",
                                    alloc, grid, fr)
    real = fslots < cfg.grid.block_capacity
    print("  touched blocks:", int(real.sum()), flush=True)

    deltas = timeit("voxel_deltas (meta+patches+sample+terms)", jax.jit(
        lambda fc, re, at, T: proj_ops.voxel_deltas(
            fc, re, at, T, intr, plan, cfg, "onehot")),
        fcoords, real, atlas, fr.T_G_C)

    # isolate: metadata + patches
    from kimera_semantics_tpu.core import transforms
    T_C_G = transforms.inverse(fr.T_G_C)

    meta = timeit("  block_patch_meta", jax.jit(
        lambda fc, T: proj_ops.block_patch_meta(fc, T, intr, plan,
                                                cfg.grid.block_size)),
        fcoords, T_C_G)
    timeit("  extract_patches", jax.jit(
        lambda at, u0, v0: proj_ops.extract_patches(at, u0, v0, plan.window)),
        atlas, meta[3], meta[4])
    patches = proj_ops.extract_patches(atlas, meta[3], meta[4], plan.window)
    K, V3 = fcoords.shape[0], cfg.grid.vps3
    rng = np.random.RandomState(0)
    row = jnp.asarray(rng.randint(0, plan.window, (K, V3)).astype(np.int32))
    col = jnp.asarray(rng.randint(0, plan.window, (K, V3)).astype(np.int32))
    timeit("  sample_patches onehot", jax.jit(
        lambda p, r, c: proj_ops.sample_patches(p, r, c, "onehot")),
        patches, row, col)

    apply_fn = jax.jit(lambda g, fs, d: pallas_kernels.block_rmw_add(
        g.wsum, g.wsdf, g.sem_count, g.sem_delta, g.wcolor, fs,
        d["w"], d["wsdf"], d["cnt"], d["sem"], d["wcolor"])[0][0, 0])
    timeit("block_rmw_add apply", apply_fn, grid2, fslots, deltas)
    return 0


if __name__ == "__main__":
    sys.exit(main())
