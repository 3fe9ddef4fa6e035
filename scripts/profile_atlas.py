#!/usr/bin/env python
"""Micro-bench of mip-atlas build variants (the flagship's largest single
stage: 0.89 ms of the 2.29 ms/frame e2e, measured r3) + donated alloc loop
for clean alloc-vs-apply attribution.

Variants:
  A current       one-hot einsum pooling at package HIGHEST precision
  B reduce_window lax.reduce_window min + payload-by-mask max
  C bf16 split    one-hot einsum with hi/lo bf16 payload at DEFAULT
  D slices        strided-slice pooling (expected slow: serial lane shuffle)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))

import jax
import jax.numpy as jnp

from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.ops import mip as mip_ops


def pool_reduce_window(chans):
    """(C,h,w) -> (C,h/2,w/2): depth min via reduce_window; payloads take
    the max over pixels matching the pooled min (any minimal pixel's payload
    is a valid 'surviving surface' descriptor)."""
    d = chans[0]
    m = jax.lax.reduce_window(d, jnp.inf, jax.lax.min, (2, 2), (2, 2),
                              "VALID")
    m_up = jnp.repeat(jnp.repeat(m, 2, axis=0), 2, axis=1)
    mask = d <= m_up  # ties: both allowed, max picks one deterministically
    out = [m]
    for c in range(1, chans.shape[0]):
        p = jnp.where(mask, chans[c], -1.0)
        out.append(jax.lax.reduce_window(p, -jnp.inf, jax.lax.max, (2, 2),
                                         (2, 2), "VALID"))
    return jnp.stack(out)


def pool_slices(chans):
    a = chans[:, ::2, ::2]
    b = chans[:, ::2, 1::2]
    c = chans[:, 1::2, ::2]
    d = chans[:, 1::2, 1::2]
    best = a
    for o in (b, c, d):
        keep = best[0] <= o[0]
        best = jnp.where(keep[None], best, o)
    return best


def build_atlas_with(pool, depth, labels, colors, plan):
    d = jnp.where(jnp.isfinite(depth) & (depth > 0.0),
                  depth.astype(jnp.float32), mip_ops.DEPTH_SENTINEL)
    lab = labels.astype(jnp.float32)
    c = jnp.round(colors.astype(jnp.float32))
    rg = c[..., 0] * 256.0 + c[..., 1]
    chans = jnp.stack([d, lab, rg, c[..., 2]])
    atlas = jnp.zeros((4, plan.atlas_height, plan.atlas_width), jnp.float32)
    atlas = atlas.at[0].set(mip_ops.DEPTH_SENTINEL)
    level = chans
    for l in range(plan.num_levels):
        if l > 0:
            level = pool(level)
        atlas = atlas.at[:, : plan.heights[l],
                         plan.offsets[l]: plan.offsets[l] + plan.widths[l]
                         ].set(level)
    return atlas


def main():
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    lmap = LabelColorMap.random(21)
    n = int(os.environ.get("PROF_FRAMES", "64"))
    ds = SyntheticDataset(num_frames=n, intr=intr, label_map=lmap)
    frames = [ds.frame(i) for i in range(n)]
    jax.block_until_ready(frames[-1].depth)
    plan = mip_ops.make_plan(intr.height, intr.width, 128, 256)
    print(f"backend={jax.devices()[0].platform}", flush=True)

    def run(name, fn):
        j = jax.jit(fn)
        out = j(frames[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for f in frames[1:]:
            out = j(f)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (len(frames) - 1)
        print(f"{name:<24} {dt*1000:8.3f} ms/frame", flush=True)
        return out

    a = run("A current", lambda f: mip_ops.build_atlas(
        f.depth, f.labels, f.colors, plan))
    b = run("B reduce_window", lambda f: build_atlas_with(
        pool_reduce_window, f.depth, f.labels, f.colors, plan))
    run("D slices", lambda f: build_atlas_with(
        pool_slices, f.depth, f.labels, f.colors, plan))

    import numpy as np
    da, db = np.asarray(a), np.asarray(b)
    # depth channel must agree exactly; payloads may differ only at ties.
    print("depth equal:", bool((da[0] == db[0]).all()),
          "payload mismatch frac:",
          float((da[1:] != db[1:]).mean()), flush=True)

    # Clean alloc attribution: donated atlas+alloc chain.
    from functools import partial
    from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                             PipelineConfig, SemanticConfig,
                                             TsdfConfig)
    from kimera_semantics_tpu.grid import blocks
    from kimera_semantics_tpu.models import projective as proj
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(alloc_stride=8, block_budget=512))

    @partial(jax.jit, donate_argnums=(0,))
    def atlas_alloc(g, f):
        atlas = mip_ops.build_atlas(f.depth, f.labels, f.colors, plan)
        g, fc, fs_, fr = proj.allocate_from_atlas(g, atlas, f.T_G_C, cfg,
                                                  intr, plan)
        return g

    g = blocks.create(cfg)
    g = atlas_alloc(g, frames[0])
    jax.block_until_ready(g.wsum)
    t0 = time.perf_counter()
    for f in frames[1:]:
        g = atlas_alloc(g, f)
    jax.block_until_ready(g.wsum)
    dt = (time.perf_counter() - t0) / (n - 1)
    print(f"{'atlas+alloc (donated)':<24} {dt*1000:8.3f} ms/frame",
          flush=True)

    # Alloc sub-stages: candidate block-DDA alone vs the frame-list insert.
    @jax.jit
    def cands(f):
        atlas = mip_ops.build_atlas(f.depth, f.labels, f.colors, plan)
        return proj.candidates_from_atlas(atlas, f.T_G_C, cfg, intr, plan)
    run("atlas+candidates", cands)
    keys0, act0 = jax.block_until_ready(cands(frames[0]))

    from kimera_semantics_tpu.grid import hash as bhash
    gc = cfg.grid

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def ins(tk, ts, bc, nb, keys, act):
        return bhash.insert_frame_list(
            tk, ts, bc, nb, keys.reshape(-1), act.reshape(-1),
            gc.table_size, gc.block_capacity, gc.world_extent_blocks,
            cfg.pipeline.block_budget)
    g2 = blocks.create(cfg)
    state = (g2.table_keys, g2.table_slots, g2.block_coords, g2.n_blocks)
    out = ins(*state, keys0, act0)
    jax.block_until_ready(out[0])
    state = out[:4]
    t0 = time.perf_counter()
    for _ in range(n - 1):
        out = ins(*state, keys0, act0)
        state = out[:4]
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / (n - 1)
    print(f"{'insert_frame_list':<24} {dt*1000:8.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
