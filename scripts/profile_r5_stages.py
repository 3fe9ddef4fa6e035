"""r5 stage attribution: merged B=1 integrate tail + flagship alloc chain.

VERDICT r4 items 4/5: nobody has attributed (a) where merged's 23.3 ms
integrate tail goes (vote expansion vs main reduce vs staging/apply) or
(b) the flagship's candidates+insert_frame_list chain (~0.9 ms of the
1.42 ms frame). This session measures both with ASYNC loops (K chained
dispatches, one final sync — no per-stage tunnel RTT), on real bench-config
inputs captured from a warm scene.

Run:  python -u scripts/profile_r5_stages.py > /tmp/profile_r5_stages.log
Env:  PROF_WHAT={merged,proj,both} (both), PROF_REPS (24)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from functools import partial

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset

REPS = int(os.environ.get("PROF_REPS", "24"))
WHAT = os.environ.get("PROF_WHAT", "both")


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def bench_cfg(method):
    return FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        io_voxels_per_side=0, block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False,
                        carve_mode="projective",
                        band_density="matched" if method == "fast"
                        else "octave"),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(
            max_rays=28672 if method == "fast" else 32768,
            dedup_table_size=1 << 20, scatter_mode="segment",
            segment_budget=98304 if method == "fast" else 1 << 17,
            alloc_stride=8, block_budget=512, patch_rows=128),
    ), PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                         width=640, height=480)


def async_loop(fn, args_list, sync, warm=2, reps=REPS):
    """Median ms of fn over chained async dispatches, one sync per rep
    sweep of len(args_list) calls."""
    for _ in range(warm):
        out = None
        for a in args_list:
            out = fn(*a)
        jax.block_until_ready(sync(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for a in args_list:
            out = fn(*a)
        jax.block_until_ready(sync(out))
        ts.append(1000.0 * (time.perf_counter() - t0) / len(args_list))
    return round(float(np.median(ts)), 3)


def profile_merged():
    from kimera_semantics_tpu.models import merged as merged_mod
    from kimera_semantics_tpu.ops import integrate as integ
    from kimera_semantics_tpu.ops import pallas_kernels as pk
    from kimera_semantics_tpu.ops import semantic as sem_ops
    from kimera_semantics_tpu.ops.reduce import (TRASH_KEY,
                                                 segment_compact_reduce)

    cfg, intr = bench_cfg("merged")
    lmap = LabelColorMap.random(cfg.grid.num_labels)
    ds = SyntheticDataset(num_frames=16, intr=intr, label_map=lmap)
    frames = [ds.frame(i) for i in range(16)]
    grid = blocks.create(cfg)
    for f in frames[:4]:
        grid = merged_mod.integrate_frame(grid, f, cfg, intr)
    jax.block_until_ready(grid.wsum)
    emit("merged_scene", blocks=int(grid.n_blocks))

    s_band = cfg.pipeline.resolved_band_steps(cfg.grid, cfg.tsdf)
    lab_shift = max(1, (cfg.grid.num_labels - 1).bit_length())
    B = cfg.pipeline.segment_budget
    frac = cfg.pipeline.stream_active_fraction

    # Prefix-ablation on the REAL pipeline (fusion preserved): each prefix
    # jit runs the step up to stage k and returns a live scalar; stage cost
    # = diff of successive prefixes. Sweeps of 8 frames amortize the
    # ~23 ms tunnel sync.
    def make_prefix(upto):
        @jax.jit
        def run(g, f):
            import dataclasses as dc
            g2, batches, sem_pts, origin, bdest, _ = merged_mod._frame_parts(
                g, f, cfg, intr)
            band, _s = batches[0]
            if upto == 0:
                return jnp.sum(band.weight) + jnp.sum(g2.wsum[0])
            st = integ.expand_jobs(cfg, band, s_band)
            alloc_keys = st.run_key.reshape(-1)
            tk, ts_, bc, nb, ov = integ.bhash.insert_compacted(
                g2.table_keys, g2.table_slots, g2.block_coords, g2.n_blocks,
                alloc_keys, alloc_keys >= 0, cfg.grid.table_size,
                cfg.grid.block_capacity, cfg.grid.world_extent_blocks)
            g2 = dc.replace(g2, table_keys=tk, table_slots=ts_,
                            block_coords=bc, n_blocks=nb)
            cube_vals, cam_block = integ.frame_cube(g2, cfg, origin)
            inform = sem_ops.informative(st.labels) & st.job_valid
            (k2, w_m, wsdf_off, cnt, key, vu, run_slots) = \
                pk.slot_resolve_stream(
                    cfg, cube_vals, cam_block, st.run_key, st.run_idx,
                    st.local, st.w, st.w_sdf, st.wc_gate, st.step_valid,
                    st.labels, inform, lab_shift,
                    cfg.semantic.update_near_surface_only)
            if upto == 1:
                return jnp.sum(w_m) + jnp.sum(key % 97)
            n_jobs = key.shape[1]
            ok, (tw, tsdf_s, tcnt), nd = segment_compact_reduce(
                k2.reshape(-1), (w_m.reshape(-1), wsdf_off.reshape(-1),
                                 cnt.reshape(-1)), B, max_run=n_jobs,
                active_frac=frac)
            if upto == 2:
                return jnp.sum(tw) + jnp.sum(ok % 97)
            pr, pl_, pv, pc = sem_pts
            keyT = key.T
            updT = vu.T
            pkey = keyT[pr]
            pupd = updT[pr] & (pv & sem_ops.informative(pl_))[:, None]
            plab = jnp.clip(pl_, 0, (1 << lab_shift) - 1)[:, None].astype(
                jnp.int32)
            k2p = jnp.where(pupd, (pkey << lab_shift) | plab, TRASH_KEY)
            pcnt = jnp.where(pupd, pc[:, None], 0.0)
            okp, (tpcnt,), ndp = segment_compact_reduce(
                k2p.reshape(-1), (pcnt.reshape(-1),), B,
                max_run=pkey.shape[0], active_frac=frac)
            return jnp.sum(tpcnt) + jnp.sum(okp % 97)
        return run

    prev = None
    names = ["frame_parts", "pre_reduce", "main_reduce", "vote_reduce"]
    for upto, name in enumerate(names):
        run = make_prefix(upto)
        jax.block_until_ready(run(grid, frames[4]))
        ms = async_loop(run, [(grid, f) for f in frames[4:12]],
                        lambda o: o)
        emit(f"merged_prefix_{name}_ms", ms=ms,
             stage_ms=round(ms - prev, 3) if prev is not None else None)
        prev = ms

    # Full step (donating jit, copies per sweep) — the total.
    def full_sweep():
        ts = []
        for r in range(2 + (REPS // 4 or 1)):
            g = jax.tree.map(jnp.copy, grid)
            jax.block_until_ready(g.wsum)
            t0 = time.perf_counter()
            for f in frames[4:12]:
                g = merged_mod.integrate_frame(g, f, cfg, intr)
            jax.block_until_ready(g.wsum)
            if r >= 2:
                ts.append(1000.0 * (time.perf_counter() - t0) / 8)
        return round(float(np.median(ts)), 3)
    full_ms = full_sweep()
    emit("merged_full_ms", ms=full_ms,
         apply_stage_ms=round(full_ms - prev, 3))


def profile_proj():
    from kimera_semantics_tpu.models import projective as proj_mod
    from kimera_semantics_tpu.ops import mip as mip_ops
    from kimera_semantics_tpu.grid import hash as bhash

    cfg, intr = bench_cfg("projective")
    lmap = LabelColorMap.random(cfg.grid.num_labels)
    ds = SyntheticDataset(num_frames=16, intr=intr, label_map=lmap)
    frames = [ds.frame(i) for i in range(16)]
    plan = mip_ops.make_plan(intr.height, intr.width,
                             cfg.pipeline.patch_rows, cfg.pipeline.patch_cols)
    grid = blocks.create(cfg)
    for f in frames[:4]:
        grid = proj_mod.integrate_frame(grid, f, cfg, intr)
    jax.block_until_ready(grid.wsum)
    emit("proj_scene", blocks=int(grid.n_blocks))

    atl = [jax.block_until_ready(jax.jit(
        lambda fr: mip_ops.build_atlas(fr.depth, fr.labels, fr.colors,
                                       plan))(f)) for f in frames[4:12]]

    # Alloc split: candidates (DDA half) vs insert_frame_list (hash half).
    cand = jax.jit(lambda a, T: proj_mod.candidates_from_atlas(
        a, T, cfg, intr, plan))
    jax.block_until_ready(cand(atl[0], frames[4].T_G_C))
    emit("proj_candidates_ms", ms=async_loop(
        cand, [(a, f.T_G_C) for a, f in zip(atl, frames[4:12])] * 4,
        lambda o: o[0]))

    keys0, bvalid0 = jax.block_until_ready(cand(atl[0], frames[4].T_G_C))
    ins = jax.jit(lambda g, k, v: proj_mod.insert_candidates(g, k, v, cfg),
                  donate_argnums=(0,))
    g2 = jax.tree.map(jnp.copy, grid)
    g2 = ins(g2, keys0, bvalid0)[0]
    jax.block_until_ready(g2.wsum)
    ts = []
    for _ in range(REPS // 2 or 1):
        gg = jax.tree.map(jnp.copy, grid)
        jax.block_until_ready(gg.wsum)
        t0 = time.perf_counter()
        for _ in range(32):
            gg = ins(gg, keys0, bvalid0)[0]
        jax.block_until_ready(gg.wsum)
        ts.append(1000.0 * (time.perf_counter() - t0) / 32)
    emit("proj_insert_ms", ms=round(float(np.median(ts)), 3))


def main():
    emit("env", backend=jax.default_backend(), device=str(jax.devices()[0]))
    if WHAT in ("merged", "both"):
        profile_merged()
    if WHAT in ("proj", "both"):
        profile_proj()
    emit("done")


if __name__ == "__main__":
    sys.exit(main())
