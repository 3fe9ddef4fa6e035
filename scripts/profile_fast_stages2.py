#!/usr/bin/env python
"""Stage decomposition of the CURRENT decimated fast path at the canonical
config (round-2 follow-up to profile_fast_r2.py, which timed the round-1
chain). Jits each stage separately:

  prepare   _frame_batches (backproject, octave keep, band+carve job build)
  expand    expand_jobs over both batches (Pallas DDA)
  insert    bhash.insert_compacted over the concatenated run keys
  resolve   frame_cube + slot_resolve_stream (cube LUT kernel)
  reduce    segment_compact_reduce + channel scatters (via integrate_jobs
            tail == end-to-end minus the above; also timed directly)

plus insert sub-pieces (sort-dedup vs probe loop) to find the 19 ms.
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
from kimera_semantics_tpu.models import fast
from kimera_semantics_tpu.ops import integrate as int_ops


def timeit(name, fn, *args, reps=10, thread=False):
    # thread=True: fn donates its first arg (grid in / grid out) — feed the
    # previous output back in so no donated buffer is ever reused.
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    rest = args[1:]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(out, *rest) if thread else fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<46} {dt*1000:9.2f} ms   (compile {compile_s:6.1f} s)",
          flush=True)
    return out


def main():
    carve_mode = os.environ.get("KSD_CARVE_MODE", "decimated")
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False,
                        carve_mode=carve_mode),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(max_rays=32768, dedup_table_size=1 << 20,
                                scatter_mode="segment",
                                segment_budget=1 << 18,
                                alloc_stride=8, block_budget=512),
    )
    print(f"carve_mode={carve_mode}", flush=True)
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    lmap = LabelColorMap.random(21)
    ds = SyntheticDataset(num_frames=8, intr=intr, label_map=lmap)
    frames = [ds.frame(i) for i in range(8)]
    jax.block_until_ready(frames[-1].depth)
    print(f"backend={jax.devices()[0].platform}", flush=True)

    import faulthandler
    faulthandler.dump_traceback_later(1200, exit=True)
    grid = blocks.create(cfg)
    # Warm the scene so stages run at steady state.
    for i, f in enumerate(frames[:4]):
        grid = fast.integrate_frame(grid, f, cfg, intr)
        jax.block_until_ready(grid.wsum)
        print(f"warm {i}", flush=True)
    f = frames[5]

    timeit("fast.integrate_frame (end to end)",
           lambda g: fast.integrate_frame(g, f, cfg, intr), grid,
           thread=True)
    # integrate_frame donates; keep a fresh copy for the stage runs
    for fr in frames[:4]:
        pass
    grid = blocks.create(cfg)
    for fr in frames[:4]:
        grid = fast.integrate_frame(grid, fr, cfg, intr)
    jax.block_until_ready(grid.wsum)

    if carve_mode == "projective":
        pc = jax.jit(lambda g: fast._maybe_projective_carve(g, f, cfg, intr))
        grid = timeit("projective carve (atlas+alloc+dense apply)", pc, grid)

    prep = jax.jit(lambda g: fast._frame_batches(g, f, cfg, intr))
    g2, batches, origin = timeit("prepare: _frame_batches", prep, grid)
    for (jobs, S) in batches:
        print(f"   batch R={jobs.valid.shape[0]} S={S} "
              f"valid={int(jnp.sum(jobs.valid))}", flush=True)

    Ss = [int(S) for _, S in batches]
    jobs_only = [j for j, _ in batches]
    expand = jax.jit(lambda js: [int_ops.expand_jobs(cfg, j, S)
                                 for j, S in zip(js, Ss)])
    streams = timeit("expand_jobs (both batches)", expand, jobs_only)
    for st in streams:
        print(f"   stream {st.keys.shape} active="
              f"{int(jnp.sum(st.step_valid))} runs="
              f"{int(jnp.sum(st.run_key >= 0))}/{st.run_key.size}",
              flush=True)

    alloc_keys = jnp.concatenate([st.run_key.reshape(-1) for st in streams])
    alloc_active = alloc_keys >= 0
    print(f"alloc stream: {alloc_keys.size} keys, "
          f"{int(jnp.sum(alloc_active))} active", flush=True)

    g = cfg.grid
    ins = jax.jit(lambda tk, ts, bc, nb, k, a: bhash.insert_compacted(
        tk, ts, bc, nb, k, a, g.table_size, g.block_capacity,
        g.world_extent_blocks))
    timeit("insert_compacted (alloc)", ins, grid.table_keys,
           grid.table_slots, grid.block_coords, grid.n_blocks,
           alloc_keys, alloc_active)

    # insert sub-pieces
    trash = np.int32(0x7FFFFFFF)
    sort1 = jax.jit(lambda k, a: jnp.sort(jnp.where(a, k, trash)))
    sk = timeit("  insert piece: sort keys", sort1, alloc_keys, alloc_active)
    def uniq(sk):
        is_first = jnp.concatenate(
            [jnp.ones((1,), dtype=bool), sk[1:] != sk[:-1]]) & (sk != trash)
        return jnp.sort(jnp.where(is_first, sk, trash))[:g.block_capacity]
    uk = timeit("  insert piece: unique+sort2", jax.jit(uniq), sk)
    ins2 = jax.jit(lambda tk, ts, bc, nb, k: bhash.insert(
        tk, ts, bc, nb, k, k != trash, g.table_size, g.block_capacity,
        g.world_extent_blocks))
    timeit("  insert piece: probe insert (<=cap uniq)", ins2,
           grid.table_keys, grid.table_slots, grid.block_coords,
           grid.n_blocks, uk)

    # full tail: integrate_jobs (insert + cube resolve + reduce + scatter)
    tail = jax.jit(lambda gg, js, o: int_ops.integrate_jobs(
        gg, cfg, list(zip(js, Ss)), cube_origin=o))
    timeit("integrate_jobs (alloc+resolve+reduce+scatter)", tail, g2,
           jobs_only, origin)


if __name__ == "__main__":
    main()
