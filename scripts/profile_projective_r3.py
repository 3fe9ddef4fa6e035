#!/usr/bin/env python
"""Flagship (projective) roofline attribution WITHOUT per-stage host syncs.

The round-2 stage numbers (bench.py BENCH_BREAKDOWN) blocked the host after
every stage, paying the ~21 ms tunnel RTT 3x per frame — "relative use only".
Here every measurement is a STEADY-STATE ASYNC LOOP over N frames with ONE
sync at the end, so the per-frame cost is the device cost:

  e2e        integrate_frame chain (the bench loop itself)
  e2e_b8     integrate_frames B=8 chain (dispatch amortization check)
  atlas      build_atlas chain (frame-only; no grid dependency)
  atlas+alloc  atlas + allocate_from_atlas chain (no apply)
  apply      = e2e - (atlas+alloc)

Prints one line per stage; run on the TPU tunnel.
Env: PROF_FRAMES (default 64), PROF_VPS (default 16).
"""

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
from kimera_semantics_tpu.models import projective as proj
from kimera_semantics_tpu.models.common import Frame
from kimera_semantics_tpu.ops import mip as mip_ops


def main():
    n = int(os.environ.get("PROF_FRAMES", "64"))
    vps = int(os.environ.get("PROF_VPS", "16"))
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=vps,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(alloc_stride=8, block_budget=512),
    )
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    lmap = LabelColorMap.random(21)
    ds = SyntheticDataset(num_frames=n + 8, intr=intr, label_map=lmap)
    frames = [ds.frame(i) for i in range(n + 8)]
    jax.block_until_ready(frames[-1].depth)
    plan = mip_ops.make_plan(intr.height, intr.width,
                             cfg.pipeline.patch_rows, cfg.pipeline.patch_cols)
    print(f"backend={jax.devices()[0].platform} frames={n} vps={vps}",
          flush=True)

    import faulthandler
    faulthandler.dump_traceback_later(2400, exit=True)

    def loop(name, init, step, items):
        """Steady-state async chain; returns (dt, final_state). NB:
        integrate_frame DONATES its grid — callers must thread the returned
        state instead of reusing `init` (a reused donated buffer raises
        'Array has been deleted')."""
        state = init
        state = step(state, items[0])          # compile
        jax.block_until_ready(jax.tree.leaves(state)[0])
        t0 = time.perf_counter()
        for it in items[1:]:
            state = step(state, it)
        jax.block_until_ready(jax.tree.leaves(state)[0])
        dt = (time.perf_counter() - t0) / (len(items) - 1)
        print(f"{name:<28} {dt*1000:8.3f} ms/frame", flush=True)
        return dt, state

    # Warm scene: integrate all frames once so the steady-state grid exists.
    grid = blocks.create(cfg)
    for f in frames[:8]:
        grid = proj.integrate_frame(grid, f, cfg, intr)
    jax.block_until_ready(grid.wsum)

    e2e, grid = loop("e2e integrate_frame",
                     grid,
                     lambda g, f: proj.integrate_frame(g, f, cfg, intr),
                     frames[8:8 + n])

    # B=8 batched chain (thread the donated state from the prior loop).
    B = 8
    def stack(fs):
        return Frame(depth=jnp.stack([f.depth for f in fs]),
                     labels=jnp.stack([f.labels for f in fs]),
                     colors=jnp.stack([f.colors for f in fs]),
                     T_G_C=jnp.stack([f.T_G_C for f in fs]))
    batches = [stack(frames[8 + i:8 + i + B]) for i in range(0, n - B, B)]
    e2e8, grid = loop("e2e integrate_frames B=8",
                      grid,
                      lambda g, fb: proj.integrate_frames(g, fb, cfg, intr),
                      batches)
    print(f"{'':28} ({e2e8*1000/B:.3f} ms/frame)", flush=True)

    jit_atlas = jax.jit(lambda fr: mip_ops.build_atlas(
        fr.depth, fr.labels, fr.colors, plan))
    loop("atlas", None, lambda s, f: jit_atlas(f), frames[8:8 + n])

    @jax.jit
    def atlas_alloc(g, f):
        atlas = mip_ops.build_atlas(f.depth, f.labels, f.colors, plan)
        g, fc, fs_, fr = proj.allocate_from_atlas(g, atlas, f.T_G_C, cfg,
                                                  intr, plan)
        return g
    aa, grid = loop("atlas+alloc", grid, atlas_alloc, frames[8:8 + n])
    print(f"{'apply (= e2e - atlas+alloc)':<28} {(e2e-aa)*1000:8.3f} "
          f"ms/frame", flush=True)

    # Roofline: HBM bytes of the apply RMW at this config (touched groups x
    # (8, V3) x channels x 4 B x 2 (read+write)).
    import numpy as np
    g2 = blocks.create(cfg)
    rows = []
    @jax.jit
    def count(g2, f):
        atlas = mip_ops.build_atlas(f.depth, f.labels, f.colors, plan)
        g2, fc, fs_, fr = proj.allocate_from_atlas(g2, atlas, f.T_G_C, cfg,
                                                   intr, plan)
        g2 = proj.apply_frame(g2, atlas, f.T_G_C, fc, fs_, fr, cfg, intr,
                              plan)
        # distinct non-trash tile groups this frame
        grp = jnp.where(fr, fs_ // 8, -1)
        ng = jnp.sum(jnp.bincount(jnp.where(grp >= 0, grp, 0),
                                  length=cfg.grid.padded_rows // 8) > 0)
        return g2, (jnp.sum(fr), ng)
    for f in frames[8:8 + min(n, 24)]:
        g2, r = count(g2, f)
        rows.append(r)
    rows = jax.device_get(rows)
    mean_rows = float(np.mean([int(a) for a, _ in rows]))
    mean_grps = float(np.mean([int(b) for _, b in rows]))
    nch = 6 + cfg.grid.num_labels
    bytes_rmw = mean_grps * 8 * cfg.grid.vps3 * nch * 4 * 2
    print(f"touched rows/frame ~{mean_rows:.0f}, tile groups ~{mean_grps:.0f}"
          f" -> apply RMW traffic ~{bytes_rmw/1e6:.0f} MB/frame "
          f"(~{bytes_rmw/819e9*1e3:.2f} ms at v5e 819 GB/s)", flush=True)


if __name__ == "__main__":
    main()
