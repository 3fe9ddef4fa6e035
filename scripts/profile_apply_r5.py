"""r5: drill into merged's ~22 ms staged-apply stage (profile_r5_stages2).

Splits _staged_segment_apply into (a) staging only (ranking + scatters into
the compact buffers), (b) block_rmw_add kernel only (precomputed staging),
(c) the full apply under packed vs dense sem staging, plus (d) the
projective-carve dense apply that the prefix probes DCE'd out. Inputs are
real reduced segments captured from a warm merged bench frame.

Run:  python -u scripts/profile_apply_r5.py > /tmp/profile_apply_r5.log
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

import dataclasses as dc

from profile_r5_stages import bench_cfg, emit, REPS
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset


def main():
    from kimera_semantics_tpu.models import merged as merged_mod
    from kimera_semantics_tpu.ops import integrate as integ
    from kimera_semantics_tpu.ops import pallas_kernels as pk
    from kimera_semantics_tpu.ops import semantic as sem_ops
    from kimera_semantics_tpu.ops.reduce import (TRASH_KEY,
                                                 segment_compact_reduce)

    emit("env", backend=jax.default_backend())
    cfg, intr = bench_cfg("merged")
    lmap = LabelColorMap.random(cfg.grid.num_labels)
    ds = SyntheticDataset(num_frames=16, intr=intr, label_map=lmap)
    frames = [ds.frame(i) for i in range(16)]
    grid = blocks.create(cfg)
    for f in frames[:4]:
        grid = merged_mod.integrate_frame(grid, f, cfg, intr)
    jax.block_until_ready(grid.wsum)
    emit("scene", blocks=int(grid.n_blocks))

    s_band = cfg.pipeline.resolved_band_steps(cfg.grid, cfg.tsdf)
    lab_shift = max(1, (cfg.grid.num_labels - 1).bit_length())
    B = cfg.pipeline.segment_budget
    frac = cfg.pipeline.stream_active_fraction
    Kb = cfg.pipeline.block_budget
    v3, cap, L = cfg.grid.vps3, cfg.grid.block_capacity, cfg.grid.num_labels
    trunc = cfg.tsdf.truncation_distance

    # Capture real reduced segments for one frame.
    @jax.jit
    def capture(g, f):
        g2, batches, sem_pts, origin, bdest, _ = merged_mod._frame_parts(
            g, f, cfg, intr)
        band, _s = batches[0]
        st = integ.expand_jobs(cfg, band, s_band)
        alloc_keys = st.run_key.reshape(-1)
        tk, ts_, bc, nb, ov = integ.bhash.insert_compacted(
            g2.table_keys, g2.table_slots, g2.block_coords, g2.n_blocks,
            alloc_keys, alloc_keys >= 0, cfg.grid.table_size, cap,
            cfg.grid.world_extent_blocks)
        g2 = dc.replace(g2, table_keys=tk, table_slots=ts_, block_coords=bc,
                        n_blocks=nb)
        cube_vals, cam_block = integ.frame_cube(g2, cfg, origin)
        inform = sem_ops.informative(st.labels) & st.job_valid
        (k2, w_m, wsdf_off, cnt, key, vu, run_slots) = pk.slot_resolve_stream(
            cfg, cube_vals, cam_block, st.run_key, st.run_idx, st.local,
            st.w, st.w_sdf, st.wc_gate, st.step_valid, st.labels, inform,
            lab_shift, cfg.semantic.update_near_surface_only)
        n_jobs = key.shape[1]
        ok, sums, nd = segment_compact_reduce(
            k2.reshape(-1), (w_m.reshape(-1), wsdf_off.reshape(-1),
                             cnt.reshape(-1)), B, max_run=n_jobs,
            active_frac=frac)
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
            k2p.reshape(-1), (pcnt.reshape(-1),), B, max_run=pkey.shape[0],
            active_frac=frac)
        touched = jnp.where(run_slots >= 0, run_slots, cap).reshape(-1)
        return g2, ok, sums, okp, tpcnt, touched

    g1, ok, sums, okp, tpcnt, touched = jax.block_until_ready(
        capture(grid, frames[4]))
    lk = integ.make_likelihood_cached(cfg)

    def sweep_no_grid(fn, args, inner=24):
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            o = None
            for _ in range(inner):
                o = fn(*args)
            jax.block_until_ready(o)
            ts.append(1000.0 * (time.perf_counter() - t0) / inner)
        return round(float(np.median(ts)), 3)

    # (a) staging only — replicate _staged_segment_apply up to the kernel
    # call; return the staged buffers' sums.
    def staging_only(mode):
        P = cfg.pipeline.sem_stage_ranks if mode == "packed" else L

        @jax.jit
        def run(ok, s0, s1, s2, okp, tp):
            cfg2 = dc.replace(cfg, pipeline=dc.replace(
                cfg.pipeline, sem_stage_mode=mode))
            # call the real function but swap the kernel for sums via
            # monkeypatch-free route: rebuild staging inline (same code
            # path shape as _staged_segment_apply steps 1-2).
            n_flat = (cap + 1) * v3
            n_tiles = Kb // 8
            seg_valid = ok != TRASH_KEY
            vox = jnp.where(seg_valid, ok >> lab_shift, n_flat)
            lab = ok & ((1 << lab_shift) - 1)
            slot = vox // v3
            local = vox % v3
            grp = slot // 8
            newg = seg_valid & jnp.concatenate(
                [jnp.ones((1,), bool), grp[1:] != grp[:-1]])
            grank = jnp.cumsum(newg.astype(jnp.int32)) - 1
            pos = jnp.where(seg_valid, grank * 8 + slot % 8, Kb)
            rvox = jnp.where(pos < Kb, pos * v3 + local, Kb * v3)
            tile_idx = jnp.where(newg & (grank < n_tiles), grank, n_tiles)
            tile_groups = jnp.full((n_tiles,), cap // 8, jnp.int32).at[
                tile_idx].set(grp, mode="drop")
            tw, tsdf_s, tcnt = s0, s1, s2
            pay0 = jnp.stack([tw, tsdf_s - trunc * tw, tcnt,
                              jnp.zeros_like(tw)], axis=1)
            st0 = jnp.zeros((Kb * v3 + 1, 4), jnp.float32).at[rvox].add(
                pay0, mode="drop", indices_are_sorted=True)
            if mode == "packed":
                hi = (seg_valid & (tcnt > 0)).astype(jnp.int32)
                c = jnp.cumsum(hi)
                newv = jnp.concatenate([jnp.ones((1,), bool),
                                        vox[1:] != vox[:-1]])
                base = jax.lax.cummax(jnp.where(newv, c - hi, -1))
                rank = jnp.where(hi > 0, c - hi - base, -1)
                pidx = jnp.where((rank >= 0) & (rank < P) & (pos < Kb),
                                 rank * (Kb * v3) + rvox, P * (Kb * v3))
                st_sem = jnp.zeros((P * Kb * v3 + 1,), jnp.float32).at[
                    pidx].add(tcnt * 32.0 + lab.astype(jnp.float32),
                              mode="drop")
            else:
                sem_idx = jnp.where((pos < Kb) & seg_valid & (lab < L),
                                    lab * (Kb * v3) + rvox, P * (Kb * v3))
                st_sem = jnp.zeros((P * Kb * v3 + 1,), jnp.float32).at[
                    sem_idx].add(tcnt, mode="drop")
            return jnp.sum(st0) + jnp.sum(st_sem) + jnp.sum(tile_groups)
        return run

    for mode in ("packed", "dense"):
        ms = sweep_no_grid(staging_only(mode), (ok, *sums, okp, tpcnt))
        emit(f"staging_only_{mode}_ms", ms=ms)

    # (b)+(c) full staged apply, packed vs dense (donating grid chain).
    for mode in ("packed", "dense"):
        cfg2 = dc.replace(cfg, pipeline=dc.replace(
            cfg.pipeline, sem_stage_mode=mode))
        apply_j = jax.jit(
            lambda g, ok, s0, s1, s2, okp, tp, _c=cfg2:
            integ._staged_segment_apply(
                g, _c, ok, (s0, s1, s2), touched, lab_shift, lk,
                jnp.int32(0), pvotes=(okp, tp), csegs=None, Kb=Kb),
            donate_argnums=(0,))
        gg = jax.tree.map(jnp.copy, g1)
        gg = apply_j(gg, ok, *sums, okp, tpcnt)
        jax.block_until_ready(gg.wsum)
        ts = []
        for _ in range(REPS // 2 or 1):
            gg = jax.tree.map(jnp.copy, g1)
            jax.block_until_ready(gg.wsum)
            t0 = time.perf_counter()
            for _ in range(16):
                gg = apply_j(gg, ok, *sums, okp, tpcnt)
            jax.block_until_ready(gg.wsum)
            ts.append(1000.0 * (time.perf_counter() - t0) / 16)
        emit(f"staged_apply_{mode}_ms", ms=round(float(np.median(ts)), 3))

    # (d) the dense projective-carve apply alone (DCE'd out of the prefix
    # probes): _maybe_projective_carve.
    from kimera_semantics_tpu.models.fast import _maybe_projective_carve
    carve_j = jax.jit(lambda g, f: _maybe_projective_carve(g, f, cfg, intr),
                      donate_argnums=(0,))
    gg = jax.tree.map(jnp.copy, g1)
    gg = carve_j(gg, frames[5])
    jax.block_until_ready(gg.wsum)
    ts = []
    for _ in range(REPS // 2 or 1):
        gg = jax.tree.map(jnp.copy, g1)
        jax.block_until_ready(gg.wsum)
        t0 = time.perf_counter()
        for f in frames[4:12]:
            gg = carve_j(gg, f)
        jax.block_until_ready(gg.wsum)
        ts.append(1000.0 * (time.perf_counter() - t0) / 8)
    emit("carve_apply_ms", ms=round(float(np.median(ts)), 3))
    emit("done")


if __name__ == "__main__":
    sys.exit(main())
