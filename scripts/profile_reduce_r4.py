#!/usr/bin/env python
"""Sub-stage attribution of the segment reduce+scatter (r4).

profile_r4_stages.py showed fast B=1 spends 22.5 of 26.5 ms in
"reduce+scatter" (everything after slot_resolve). This script builds the
REAL reduce inputs (the concatenated k2/wv/wsdfv/cntv planes of a bench-
config fast frame after warmup) and times each piece on TPU:

    sort1      4-operand lax.sort (key + 3 channels) over the full stream
    sort1b     2-operand (key, iota) sort + ONE packed 3-channel gather
    scan       segmented_scan_sums at max_run=R over the active slice
    sort2      4-operand compaction sort (current form)
    sort2b     1-operand packed end-compaction sort + budget-sized gather
    scatters   the 3 sorted-unique budget walks + the sem_delta scatter
    full       segment_compact_reduce end-to-end (reference)
    e2e alt    full reduce with the sort1b/sort2b variants composed

Every loop is async-chained with one final sync (house pattern). Env:
PROF_FRAMES (default 64 iterations), PROF_SMOKE=1 for CPU shakeout.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import math

import jax.numpy as jnp
import numpy as np

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.ops.reduce import (TRASH_KEY, segmented_scan_sums)

SMOKE = os.environ.get("PROF_SMOKE", "0") == "1"

INTR = (PinholeIntrinsics(fx=32.0, fy=32.0, cx=31.5, cy=23.5,
                          width=64, height=48) if SMOKE else
        PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                          width=640, height=480))


def bench_cfg():
    if SMOKE:
        return FusionConfig(
            grid=GridConfig(voxel_size=0.2, voxels_per_side=8,
                            block_capacity=512),
            tsdf=TsdfConfig(truncation_distance=0.4, max_ray_length_m=4.0,
                            carve_mode="projective", band_density="matched"),
            semantic=SemanticConfig(semantic_measurement_probability=0.8),
            pipeline=PipelineConfig(max_rays=4096, dedup_table_size=1 << 14,
                                    segment_budget=1 << 14, block_budget=128))
    return FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False,
                        carve_mode="projective", band_density="matched"),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(max_rays=28672, dedup_table_size=1 << 20,
                                segment_budget=98304, alloc_stride=8,
                                block_budget=512))


def loop(name, fn, args, n):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<44} {dt*1000:8.3f} ms", flush=True)
    return dt


def build_inputs(cfg):
    """Run the real fast pipeline up to the reduce inputs for one warm frame."""
    import dataclasses
    from kimera_semantics_tpu.models import fast as fast_mod
    from kimera_semantics_tpu.ops import integrate as int_ops
    from kimera_semantics_tpu.ops import pallas_kernels, semantic
    from kimera_semantics_tpu.grid import hash as bhash

    lmap = LabelColorMap.random(21)
    ds = SyntheticDataset(num_frames=10, intr=INTR, label_map=lmap)
    frames = [ds.frame(i) for i in range(10)]
    grid = blocks.create(cfg)
    for f in frames[:8]:
        grid = fast_mod.integrate_frame(grid, f, cfg, INTR)
    jax.block_until_ready(grid.wsum)
    f = frames[8]
    g_cfg = cfg.grid
    lab_shift = max(1, (g_cfg.num_labels - 1).bit_length())

    @jax.jit
    def upto_reduce(g, f):
        g = fast_mod._maybe_projective_carve(g, f, cfg, INTR)
        g, batches, origin = fast_mod._frame_batches(g, f, cfg, INTR)
        (band, S), = batches
        st = int_ops.expand_jobs(cfg, band, S)
        ak = st.run_key.reshape(-1)
        tk, ts_, bc, nb, ov = bhash.insert_compacted(
            g.table_keys, g.table_slots, g.block_coords, g.n_blocks,
            ak, ak >= 0, g_cfg.table_size, g_cfg.block_capacity,
            g_cfg.world_extent_blocks)
        g = dataclasses.replace(
            g, table_keys=tk, table_slots=ts_, block_coords=bc,
            n_blocks=nb, overflow=g.overflow + ov)
        cube_vals, cam_block = int_ops.frame_cube(g, cfg, origin, None, 1)
        inform = semantic.informative(st.labels) & st.job_valid
        (k2, w_m, wsdf_off, cnt, key, vu, run_slots) = (
            pallas_kernels.slot_resolve_stream(
                cfg, cube_vals, cam_block, st.run_key, st.run_idx, st.local,
                st.w, st.w_sdf, st.wc_gate, st.step_valid, st.labels, inform,
                lab_shift, False, interpret=SMOKE))
        touched = jnp.where(run_slots >= 0, run_slots,
                            g_cfg.block_capacity).reshape(-1)
        return (g, k2.reshape(-1), w_m.reshape(-1), wsdf_off.reshape(-1),
                cnt.reshape(-1), touched)

    grid, k2, wv, wsdfv, cntv, touched = upto_reduce(grid, f)
    jax.block_until_ready(k2)
    return grid, k2, wv, wsdfv, cntv, touched, cfg.pipeline.max_rays


def main():
    n = int(os.environ.get("PROF_FRAMES", "64"))
    cfg = bench_cfg()
    if SMOKE:
        from kimera_semantics_tpu.ops import integrate as _int
        from kimera_semantics_tpu.models import projective as _proj
        _int.FORCE_PALLAS_INTERPRET = True
        _proj.FORCE_PALLAS_INTERPRET = True
    print(f"backend={jax.devices()[0].platform}", flush=True)
    grid, k2, wv, wsdfv, cntv, touched, n_jobs = build_inputs(cfg)
    N = int(k2.shape[0])
    n_act = int(jnp.sum(k2 != TRASH_KEY))
    # Live segment count (host-side, numpy — diagnostics only).
    k2h = np.asarray(k2)
    uniq = np.unique(k2h[k2h != TRASH_KEY]).size
    B = cfg.pipeline.segment_budget
    frac = cfg.pipeline.stream_active_fraction
    n_keep = int(math.ceil(frac * N))
    print(f"stream N={N} active={n_act} unique_segments={uniq} "
          f"budget={B} active_slice={n_keep}", flush=True)

    g_cfg = cfg.grid
    lab_shift = max(1, (g_cfg.num_labels - 1).bit_length())
    n_flat = (g_cfg.block_capacity + 1) * g_cfg.vps3
    row_flat = g_cfg.padded_rows * g_cfg.vps3
    L = g_cfg.num_labels

    # --- sort1 variants ---------------------------------------------------
    sort1 = jax.jit(lambda k, a, b, c: jax.lax.sort((k, a, b, c), num_keys=1))
    loop("sort1: 4-operand full stream", sort1, (k2, wv, wsdfv, cntv), n)

    @jax.jit
    def sort1b(k, a, b, c):
        iota = jnp.arange(k.shape[0], dtype=jnp.int32)
        sk, order = jax.lax.sort((k, iota), num_keys=1)
        packed = jnp.stack([a, b, c], axis=1)[order]
        return sk, packed[:, 0], packed[:, 1], packed[:, 2]
    loop("sort1b: 2-op sort + packed gather", sort1b, (k2, wv, wsdfv, cntv), n)

    @jax.jit
    def sort1c(k, a, b, c):
        iota = jnp.arange(k.shape[0], dtype=jnp.int32)
        sk, order = jax.lax.sort((k, iota), num_keys=1)
        sk = sk[:n_keep]
        order = order[:n_keep]
        packed = jnp.stack([a, b, c], axis=1)[order]
        return sk, packed[:, 0], packed[:, 1], packed[:, 2]
    loop("sort1c: 2-op sort + sliced packed gather", sort1c,
         (k2, wv, wsdfv, cntv), n)

    # Materialize sorted/sliced once for downstream pieces.
    sk4 = sort1(k2, wv, wsdfv, cntv)
    sk = sk4[0][:n_keep]
    sa, sb, sc = (x[:n_keep] for x in sk4[1:])
    jax.block_until_ready(sk)

    # --- scan -------------------------------------------------------------
    @jax.jit
    def scan_only(sk, a, b, c):
        neq = sk[1:] != sk[:-1]
        is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
        return segmented_scan_sums(is_start, (a, b, c), max_run=n_jobs)
    loop(f"scan: {n_keep} x3ch max_run={n_jobs}", scan_only,
         (sk, sa, sb, sc), n)

    scans = scan_only(sk, sa, sb, sc)
    jax.block_until_ready(scans[0])

    # --- sort2 variants ---------------------------------------------------
    @jax.jit
    def sort2(sk, s0, s1, s2):
        neq = sk[1:] != sk[:-1]
        is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
        valid_end = is_end & (sk != TRASH_KEY)
        ck = jnp.where(valid_end, sk, TRASH_KEY)
        out = jax.lax.sort((ck, s0, s1, s2), num_keys=1)
        return tuple(o[:B] for o in out)
    loop("sort2: 4-operand compaction", sort2, (sk,) + scans, n)

    @jax.jit
    def sort2b(sk, s0, s1, s2):
        neq = sk[1:] != sk[:-1]
        is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
        valid_end = is_end & (sk != TRASH_KEY)
        m = sk.shape[0]
        iota = jnp.arange(m, dtype=jnp.int32)
        packed = jnp.where(valid_end, iota, iota | jnp.int32(1 << 30))
        order = jax.lax.sort(packed)[:B]
        keep = order < jnp.int32(1 << 30)
        order = order & jnp.int32((1 << 30) - 1)
        kf = jax.lax.bitcast_convert_type(sk, jnp.float32)
        g = jnp.stack([kf, s0, s1, s2], axis=1)[order]
        ok = jnp.where(keep,
                       jax.lax.bitcast_convert_type(g[:, 0], jnp.int32),
                       TRASH_KEY)
        return ok, g[:, 1], g[:, 2], g[:, 3]
    loop("sort2b: 1-op packed sort + budget gather", sort2b,
         (sk,) + scans, n)

    out4 = sort2(sk, *scans)
    ok, t0c, t1c, t2c = out4
    jax.block_until_ready(ok)

    # --- scatters ---------------------------------------------------------
    trunc = cfg.tsdf.truncation_distance

    def scatters(wsum, wsdf, semc, semd, ok, tw, tsdf_s, tcnt):
        seg_valid = ok != TRASH_KEY
        vox = jnp.where(seg_valid, ok >> lab_shift, n_flat)
        lab_seg = ok & ((1 << lab_shift) - 1)
        wsum = wsum.reshape(-1).at[vox].add(
            tw, mode="drop", indices_are_sorted=True).reshape(wsum.shape)
        wsdf = wsdf.reshape(-1).at[vox].add(
            tsdf_s - trunc * tw, mode="drop",
            indices_are_sorted=True).reshape(wsdf.shape)
        semc = semc.reshape(-1).at[vox].add(
            tcnt, mode="drop", indices_are_sorted=True).reshape(semc.shape)
        sem_key = jnp.where(seg_valid, lab_seg * row_flat + vox, L * row_flat)
        semd = semd.reshape(-1).at[sem_key].add(
            tcnt * 0.5, mode="drop", unique_indices=True).reshape(semd.shape)
        return wsum, wsdf, semc, semd
    scatters = jax.jit(scatters, donate_argnums=(0, 1, 2, 3))
    chans = (grid.wsum, grid.wsdf, grid.sem_count, grid.sem_delta)

    def scatters3(wsum, wsdf, semc, ok, tw, tsdf_s, tcnt):
        seg_valid = ok != TRASH_KEY
        vox = jnp.where(seg_valid, ok >> lab_shift, n_flat)
        wsum = wsum.reshape(-1).at[vox].add(
            tw, mode="drop", indices_are_sorted=True).reshape(wsum.shape)
        wsdf = wsdf.reshape(-1).at[vox].add(
            tsdf_s - trunc * tw, mode="drop",
            indices_are_sorted=True).reshape(wsdf.shape)
        semc = semc.reshape(-1).at[vox].add(
            tcnt, mode="drop", indices_are_sorted=True).reshape(semc.shape)
        return wsum, wsdf, semc
    scatters3 = jax.jit(scatters3, donate_argnums=(0, 1, 2))

    def scatters_semd(semd, ok, tcnt):
        seg_valid = ok != TRASH_KEY
        vox = jnp.where(seg_valid, ok >> lab_shift, n_flat)
        lab_seg = ok & ((1 << lab_shift) - 1)
        sem_key = jnp.where(seg_valid, lab_seg * row_flat + vox, L * row_flat)
        return semd.reshape(-1).at[sem_key].add(
            tcnt * 0.5, mode="drop", unique_indices=True).reshape(semd.shape)
    scatters_semd = jax.jit(scatters_semd, donate_argnums=(0,))

    def sc3_loop(ws, wd, sc_):
        out = scatters3(ws, wd, sc_, ok, t0c, t1c, t2c)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = scatters3(*out, ok, t0c, t1c, t2c)
        jax.block_until_ready(out[0])
        print(f"{'scatters: 3 walks only (real arrays)':<44} "
              f"{(time.perf_counter()-t0)/n*1000:8.3f} ms", flush=True)
        return out

    def semd_loop(sd):
        out = scatters_semd(sd, ok, t2c)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = scatters_semd(out, ok, t2c)
        jax.block_until_ready(out)
        print(f"{'scatters: semd only (real arrays)':<44} "
              f"{(time.perf_counter()-t0)/n*1000:8.3f} ms", flush=True)
        return out

    def sc_loop(chans):
        t0 = None
        out = scatters(*chans, ok, t0c, t1c, t2c)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = scatters(*out, ok, t0c, t1c, t2c)
        jax.block_until_ready(out[0])
        dt = (time.perf_counter() - t0) / n
        print(f"{'scatters: 3 budget walks + semd':<44} {dt*1000:8.3f} ms",
              flush=True)
        return out
    w3 = sc3_loop(grid.wsum, grid.wsdf, grid.sem_count)
    sd = semd_loop(grid.sem_delta)
    import dataclasses as _dc
    grid = _dc.replace(grid, wsum=w3[0], wsdf=w3[1], sem_count=w3[2],
                       sem_delta=sd)
    chans = sc_loop((grid.wsum, grid.wsdf, grid.sem_count, grid.sem_delta))

    # --- full reference + composed alternative ----------------------------
    from kimera_semantics_tpu.ops.reduce import segment_compact_reduce

    full = jax.jit(lambda k, a, b, c: segment_compact_reduce(
        k, (a, b, c), B, max_run=n_jobs, active_frac=frac))
    loop("full segment_compact_reduce (current)", full,
         (k2, wv, wsdfv, cntv), n)

    @jax.jit
    def alt(k, a, b, c):
        iota = jnp.arange(k.shape[0], dtype=jnp.int32)
        skk, order = jax.lax.sort((k, iota), num_keys=1)
        skk = skk[:n_keep]
        order = order[:n_keep]
        packed = jnp.stack([a, b, c], axis=1)[order]
        s0, s1, s2 = packed[:, 0], packed[:, 1], packed[:, 2]
        neq = skk[1:] != skk[:-1]
        is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
        sc0, sc1, sc2 = segmented_scan_sums(is_start, (s0, s1, s2),
                                            max_run=n_jobs)
        is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
        valid_end = is_end & (skk != TRASH_KEY)
        m = skk.shape[0]
        iota2 = jnp.arange(m, dtype=jnp.int32)
        packed2 = jnp.where(valid_end, iota2, iota2 | jnp.int32(1 << 30))
        order2 = jax.lax.sort(packed2)[:B]
        keep = order2 < jnp.int32(1 << 30)
        order2 = order2 & jnp.int32((1 << 30) - 1)
        kf2 = jax.lax.bitcast_convert_type(skk, jnp.float32)
        g2 = jnp.stack([kf2, sc0, sc1, sc2], axis=1)[order2]
        okk = jnp.where(keep,
                        jax.lax.bitcast_convert_type(g2[:, 0], jnp.int32),
                        TRASH_KEY)
        return okk, g2[:, 1], g2[:, 2], g2[:, 3]
    loop("alt: 2-op sort1 + scan + packed sort2", alt,
         (k2, wv, wsdfv, cntv), n)

    # Keys stage through exact f32 bitcasts (gather_packed pattern).


if __name__ == "__main__":
    main()
