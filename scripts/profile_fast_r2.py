#!/usr/bin/env python
"""Round-2 stage decomposition of the FAST integrator at the canonical config.

One process, one set of compiles: measures
  - end-to-end fast.integrate_frame (current round-1 path)
  - the Pallas DDA stream kernel alone
  - run-compacted hash insert + lookup alone
  - segment_compact_reduce at the real stream size and at candidate
    decimated sizes (predicting the octave-carving win)
  - merged.integrate_frame end to end

Writes timings to stdout (run with python -u, redirect to a file).
"""

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
from kimera_semantics_tpu.grid import blocks, hash as bhash
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import common, fast
from kimera_semantics_tpu.ops import dedup as dedup_ops
from kimera_semantics_tpu.ops import pallas_kernels, reduce as reduce_ops


def timeit(name, fn, *args, reps=10):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<52} {dt*1000:9.2f} ms   (compile {compile_s:6.1f} s)",
          flush=True)
    return out


def main():
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(max_rays=32768, dedup_table_size=1 << 20,
                                scatter_mode="segment",
                                segment_budget=1 << 18),
    )
    g = cfg.grid
    R = cfg.pipeline.max_rays
    S = cfg.resolved_max_steps()
    print(f"backend={jax.default_backend()} R={R} S={S} N={R*S}", flush=True)

    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    label_map = LabelColorMap.random(cfg.grid.num_labels)
    ds = SyntheticDataset(num_frames=8, intr=intr, label_map=label_map)
    frames = [ds.frame(i) for i in range(8)]
    jax.block_until_ready(frames[-1].depth)

    # --- end-to-end fast (current path) ---------------------------------
    grid = blocks.create(cfg)
    step = lambda gr, f: fast.integrate_frame(gr, f, cfg, intr)
    grid = step(grid, frames[0])
    jax.block_until_ready(grid.wsum)
    t0 = time.perf_counter()
    for f in frames[1:]:
        grid = step(grid, f)
    jax.block_until_ready(grid.wsum)
    print(f"{'fast.integrate_frame (end to end)':<52} "
          f"{(time.perf_counter()-t0)/7*1000:9.2f} ms", flush=True)
    print(f"   blocks={int(grid.n_blocks)} overflow={int(grid.overflow)}",
          flush=True)

    # --- stage: prepare + dedup + compact --------------------------------
    @jax.jit
    def prep(frame, start_set):
        (_, pts_G, origin, colors, labels, weights, valid,
         clearing) = common.prepare_points(frame, intr, cfg)
        keep, start_set = dedup_ops.start_voxel_dedup(
            start_set, pts_G, valid, voxel_size_inv=1.0 / g.voxel_size,
            subsampling_factor=cfg.tsdf.start_voxel_subsampling_factor)
        kept, pts_G, colors, labels, weights, clearing = common.compact(
            keep, R, pts_G, colors, labels, weights, clearing)
        return kept, pts_G, origin, colors, labels, weights, clearing

    sset = jnp.full((cfg.pipeline.dedup_table_size,), -1, jnp.int32)
    kept, pts_G, origin, colors, labels, weights, clearing = timeit(
        "prepare+dedup+compact", prep, frames[1], sset)
    print(f"   kept rays: {int(jnp.sum(kept))}", flush=True)

    # --- stage: pallas DDA ------------------------------------------------
    origin3 = jnp.broadcast_to(origin, pts_G.shape).T
    dda = lambda: pallas_kernels.dda_update_stream(
        cfg, origin3, pts_G.T, weights, clearing, kept)
    keys, local, w, wsdf, wc, sv, run_key, run_idx = timeit(
        "pallas dda_update_stream", dda)
    n_act = int(jnp.sum(sv))
    print(f"   active stream entries: {n_act} ({n_act/(R*S)*100:.0f}%)",
          flush=True)
    n_runs = int(jnp.sum(run_key >= 0))
    print(f"   active runs: {n_runs} of {run_key.shape[0]*run_key.shape[1]}",
          flush=True)

    # --- stage: hash insert_compacted + lookup ---------------------------
    grid0 = blocks.create(cfg)

    @jax.jit
    def hash_ops(grid, run_key):
        active = run_key >= 0
        tk, ts_, bc, nb, ov = bhash.insert_compacted(
            grid.table_keys, grid.table_slots, grid.block_coords,
            grid.n_blocks, run_key.reshape(-1), active.reshape(-1),
            g.table_size, g.block_capacity, g.world_extent_blocks)
        run_slots = bhash.lookup(tk, ts_, run_key.reshape(-1), g.table_size)
        return tk, ts_, bc, nb, ov, run_slots

    out = timeit("hash insert_compacted + lookup (runs)", hash_ops,
                 grid0, run_key)
    print(f"   blocks: {int(out[3])}", flush=True)

    # --- stage: run->step slot broadcast (the python loop over MAXR) -----
    MAXR = run_key.shape[0]
    @jax.jit
    def broadcast_slots(run_slots, run_idx, sv):
        rs = run_slots.reshape(run_key.shape)
        slots = jnp.zeros(keys.shape, dtype=jnp.int32)
        for p in range(MAXR):
            slots = slots + jnp.where(run_idx == p, rs[p][None, :], 0)
        return jnp.where(sv, slots, g.block_capacity)
    slots = timeit("run->step slot broadcast", broadcast_slots,
                   out[5], run_idx, sv)

    # --- stage: segment_compact_reduce at real + candidate sizes ---------
    v3, cap, L = g.vps3, g.block_capacity, g.num_labels
    lab_shift = max(1, (L - 1).bit_length())
    key = jnp.where(sv, (slots * v3 + local), 0)
    lab_b = jnp.broadcast_to(labels[None, :].astype(jnp.int32), key.shape)
    k2 = jnp.where(sv, (key << lab_shift) | jnp.clip(lab_b, 0, 31),
                   reduce_ops.TRASH_KEY)
    wv = jnp.where(sv, w, 0.0)
    wsdfv = jnp.where(sv, wsdf + 0.1 * w, 0.0)
    cnt = jnp.where(sv, 1.0, 0.0)

    def seg_at(n, frac):
        kk = k2.reshape(-1)[:n]
        cc = (wv.reshape(-1)[:n], wsdfv.reshape(-1)[:n], cnt.reshape(-1)[:n])
        f = jax.jit(lambda kk, a, b, c: reduce_ops.segment_compact_reduce(
            kk, (a, b, c), 1 << 18, max_run=R, active_frac=frac))
        return timeit(f"segment_compact_reduce n={n} frac={frac}",
                      f, kk, *cc)

    seg_at(R * S, 0.75)
    for n in (2 * 1024 * 1024, 1408 * 1024, 768 * 1024):
        seg_at(n, 1.0)

    # max_run effect at decimated size
    f2 = jax.jit(lambda kk, a, b, c: reduce_ops.segment_compact_reduce(
        kk, (a, b, c), 1 << 18, max_run=1024, active_frac=1.0))
    nn = 1408 * 1024
    timeit("segment_compact_reduce n=1.4M max_run=1024", f2,
           k2.reshape(-1)[:nn], wv.reshape(-1)[:nn], wsdfv.reshape(-1)[:nn],
           cnt.reshape(-1)[:nn])

    # --- final scatters ---------------------------------------------------
    n_flat = (cap + 1) * v3
    tgt = jnp.zeros((g.padded_rows * v3,), jnp.float32)
    ok = jnp.arange(1 << 18, dtype=jnp.int32) * 7 % n_flat
    ok = jax.lax.sort(ok)
    tw = jnp.ones((1 << 18,), jnp.float32)
    timeit("sorted-promise scatter (256k idx)",
           jax.jit(lambda t, k, v: t.at[k].add(
               v, mode="drop", indices_are_sorted=True)), tgt, ok, tw)

    # --- merged end-to-end ------------------------------------------------
    from kimera_semantics_tpu.models import merged as merged_mod
    gridm = blocks.create(cfg)
    stepm = lambda gr, f: merged_mod.integrate_frame(gr, f, cfg, intr)
    gridm = stepm(gridm, frames[0])
    jax.block_until_ready(gridm.wsum)
    t0 = time.perf_counter()
    for f in frames[1:]:
        gridm = stepm(gridm, f)
    jax.block_until_ready(gridm.wsum)
    print(f"{'merged.integrate_frame (end to end)':<52} "
          f"{(time.perf_counter()-t0)/7*1000:9.2f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
