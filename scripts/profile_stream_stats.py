#!/usr/bin/env python
"""Measure the real update-stream statistics on the bench scene (duplicate
density, unique (voxel,label) segments per frame) plus cumsum/sort costs —
sizes the compaction budget for the sorted-segment scatter path."""

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
from kimera_semantics_tpu.models import common as mcommon
from kimera_semantics_tpu.ops import pallas_kernels


def timeit(name, fn, tgt, *args, reps=10):
    out = fn(tgt, *args)
    _ = float(jnp.asarray(out[0] if isinstance(out, tuple) else out).ravel()[0])
    t0 = time.perf_counter()
    cur = tgt
    for _ in range(reps):
        cur = fn(cur, *args)
        if isinstance(cur, tuple):
            cur = cur[0]
    _ = float(jnp.asarray(cur).ravel()[0])
    print(f"{name:<52} {(time.perf_counter()-t0)/reps*1000:9.2f} ms",
          flush=True)


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
    g = cfg.grid
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    label_map = LabelColorMap.random(g.num_labels)
    ds = SyntheticDataset(num_frames=6, intr=intr, label_map=label_map)

    for fi in [0, 3]:
        fr = ds.frame(fi)
        (_, pts_G, origin, colors, labels, weights, valid,
         is_clearing) = mcommon.prepare_points(fr, intr, cfg)
        kept, pts_G, colors, labels, weights, is_clearing = mcommon.compact(
            valid, cfg.pipeline.max_rays, pts_G, colors, labels, weights,
            is_clearing)
        origin3 = jnp.broadcast_to(origin, pts_G.shape).T
        keys, local, w, wsdf, wc, sv, run_key, run_idx = (
            pallas_kernels.dda_update_stream(
                cfg, origin3, pts_G.T, weights, is_clearing, kept))
        keys_h = np.asarray(keys)
        local_h = np.asarray(local)
        sv_h = np.asarray(sv)
        lab_h = np.asarray(labels)
        S, R = keys_h.shape
        n_act = int(sv_h.sum())
        # flat voxel key in a virtual dense space (block key is unique here)
        vox = keys_h.astype(np.int64) * g.vps3 + local_h
        vox_a = vox[sv_h]
        lab_a = np.broadcast_to(lab_h[None, :], (S, R))[sv_h]
        uniq_vox = np.unique(vox_a).size
        uniq_vl = np.unique(vox_a * 32 + lab_a).size
        print(f"frame {fi}: S={S} R={R} total={S*R} active={n_act} "
              f"({100*n_act/(S*R):.0f}%) uniq_vox={uniq_vox} "
              f"uniq_(vox,label)={uniq_vl} dup={n_act/max(uniq_vox,1):.1f}x",
              flush=True)

    # op costs that gate the sorted-segment design
    rng = np.random.RandomState(0)
    N = S * R
    a = jnp.asarray(rng.rand(N).astype(np.float32))
    k = jnp.asarray(rng.randint(0, 1 << 29, N).astype(np.int32))
    timeit("cumsum 5.9M f32", jax.jit(lambda t: jnp.cumsum(t)), a)
    timeit("cummax 5.9M f32", jax.jit(
        lambda t: jax.lax.cummax(t, axis=0)), a)
    timeit("sort key+5 payloads 5.9M",
           jax.jit(lambda t, k: jax.lax.sort(
               (k, t, t, t, t, t), num_keys=1)), a, k)
    b = jnp.asarray(rng.rand(1 << 21).astype(np.float32))
    kk = jnp.asarray(np.sort(rng.choice(1 << 24, 1 << 21,
                                        replace=False)).astype(np.int32))
    tgt = jnp.zeros((1 << 24,), jnp.float32)
    timeit("scatter 2M unique+sorted -> 64MB",
           jax.jit(lambda t, k, v: t.at[k].add(
               v, unique_indices=True, indices_are_sorted=True)), tgt, kk, b)
    timeit("scatter 1M unique+sorted -> 64MB",
           jax.jit(lambda t, k, v: t.at[k].add(
               v, unique_indices=True, indices_are_sorted=True)),
           tgt, kk[: 1 << 20], b[: 1 << 20])


if __name__ == "__main__":
    main()
