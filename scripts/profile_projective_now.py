#!/usr/bin/env python
"""Stage decomposition of the *current* projective pipeline (Pallas path)
on the bench scene: atlas / allocate / sample kernel / RMW apply."""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
import numpy as np
import jax
import jax.numpy as jnp

from kimera_semantics_tpu.config import (ColorMode, FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core import transforms
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import projective as proj_model
from kimera_semantics_tpu.ops import mip as mip_ops
from kimera_semantics_tpu.ops import projective as proj_ops
from kimera_semantics_tpu.ops import pallas_kernels
from kimera_semantics_tpu.ops.integrate import make_likelihood_cached


def timeit(name, fn, *args, reps=20):
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
    vps = int(os.environ.get("PROF_VPS", "16"))
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=vps,
                        block_capacity=int(os.environ.get("PROF_CAP", "4096"))),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(
            block_budget=int(os.environ.get("PROF_BUDGET", "512")),
            alloc_stride=int(os.environ.get("PROF_STRIDE", "8")),
            patch_rows=int(os.environ.get("PROF_PATCH_ROWS", "128")),
            patch_cols=int(os.environ.get("PROF_PATCH_COLS", "256"))))
    print("vps:", vps, "budget:", cfg.pipeline.block_budget, flush=True)
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    label_map = LabelColorMap.random(cfg.grid.num_labels)
    ds = SyntheticDataset(num_frames=4, intr=intr, label_map=label_map)
    fr = ds.frame(1)
    jax.block_until_ready(fr.depth)
    plan = mip_ops.make_plan(intr.height, intr.width,
                             cfg.pipeline.patch_rows, cfg.pipeline.patch_cols)

    grid = blocks.create(cfg)
    full = jax.jit(lambda g, f: proj_model.integrate_frame(g, f, cfg, intr
                                                           ).wsum[0, 0])
    timeit("FULL integrate_frame", full, grid, fr)

    atlas = timeit("mip atlas", jax.jit(
        lambda f: mip_ops.build_atlas(f.depth, f.labels, f.colors, plan)), fr)

    alloc = jax.jit(lambda g, f: proj_model._allocate(g, f, cfg, intr))
    grid2, fcoords, fslots, freal = timeit("allocate (coarse DDA+insert+list)",
                                           alloc, grid, fr)
    real = freal
    print("  touched blocks:", int(real.sum()), "of list",
          fcoords.shape[0], "tiles:",
          int((np.asarray(fslots)[::8] // 8 < cfg.grid.block_capacity // 8
                ).sum()), flush=True)

    T_C_G = transforms.inverse(fr.T_G_C)

    def sample(fc, re, at, TCG):
        lvl, u0l, v0, u0a = proj_ops.block_patch_meta(
            fc, TCG, intr, plan, cfg.grid.block_size)
        meta = jnp.stack([v0, u0a, re.astype(jnp.int32), lvl, u0l,
                          fc[:, 0], fc[:, 1], fc[:, 2]], axis=1)
        tflat = jnp.zeros((1, 128), jnp.float32).at[0, :12].set(
            TCG[:3, :4].reshape(-1))
        return pallas_kernels.projective_sample_update(
            meta, tflat, at, cfg, intr, plan, with_color=False)

    deltas = timeit("sample kernel (meta+projective_sample_update)",
                    jax.jit(sample), fcoords, real, atlas, T_C_G)
    d_w, d_wsdf, d_cnt, d_lab, d_wc = deltas

    meta_only = timeit("  block_patch_meta only", jax.jit(
        lambda fc, T: proj_ops.block_patch_meta(fc, T, intr, plan,
                                                cfg.grid.block_size)),
        fcoords, T_C_G)

    apply_fn = jax.jit(lambda g, fs, d: pallas_kernels.block_rmw_add(
        g.wsum, g.wsdf, g.sem_count, g.sem_delta, g.wcolor, fs,
        d[0], d[1], d[2], d[3], d[4],
        lk_delta=make_likelihood_cached(cfg).delta)[0][0, 0])
    timeit("block_rmw_add apply", apply_fn, grid2, fslots, deltas)
    return 0


if __name__ == "__main__":
    sys.exit(main())
