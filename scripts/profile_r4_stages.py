#!/usr/bin/env python
"""Round-4 stage attribution: fast B=1, merged B=1/B=8, flagship apply/alloc
sub-stages (VERDICT r3 items 1, 2, 7).

Every measurement is a steady-state ASYNC loop (one host sync per chain,
scripts/profile_projective_r3.py pattern) at the bench operating point
(canonical scene, carve_mode=projective, band_density=matched for fast).
Donated grids are threaded through; frame-only stages loop without state.

Stage model (fast B=1):
    e2e              = full integrate_frame
    carve            = _maybe_projective_carve chain (atlas+alloc+dense carve)
    prep             = _band_prepare (backproject+keep+compact+band jobs)
    prep+expand      = prep + DDA kernel (stream materialization)
    thru_insert      = carve + prep + expand + insert_compacted
    thru_resolve     = thru_insert + frame cube + slot_resolve kernel
    reduce+scatter   = e2e - thru_resolve

Env: PROF_FRAMES (default 48), PROF_SECTIONS=fast,merged,proj (csv).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))

import dataclasses
import jax

# Honor an explicit JAX_PLATFORMS even under the axon sitecustomize (which
# re-pins "axon,cpu" at import) — the CPU smoke shakeout needs this.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models.common import Frame


SMOKE = os.environ.get("PROF_SMOKE", "0") == "1"


def bench_cfg(method):
    if SMOKE:   # CPU shakeout of the harness itself; numbers meaningless
        return FusionConfig(
            grid=GridConfig(voxel_size=0.2, voxels_per_side=8,
                            block_capacity=512),
            tsdf=TsdfConfig(truncation_distance=0.4, max_ray_length_m=4.0,
                            carve_mode="projective",
                            band_density="matched" if method == "fast"
                            else "octave"),
            semantic=SemanticConfig(semantic_measurement_probability=0.8),
            pipeline=PipelineConfig(max_rays=4096,
                                    dedup_table_size=1 << 14,
                                    segment_budget=1 << 14,
                                    block_budget=128))
    return FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False,
                        carve_mode="projective",
                        band_density="matched" if method == "fast"
                        else "octave"),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(
            max_rays=28672 if method == "fast" else 32768,
            dedup_table_size=1 << 20,
            segment_budget=98304 if method == "fast" else 1 << 17,
            alloc_stride=8, block_budget=512),
    )


INTR = (PinholeIntrinsics(fx=32.0, fy=32.0, cx=31.5, cy=23.5,
                          width=64, height=48) if SMOKE else
        PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                          width=640, height=480))


def loop(name, init, step, items):
    state = init
    state = step(state, items[0])          # compile pass
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    for it in items[1:]:
        state = step(state, it)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    dt = (time.perf_counter() - t0) / max(1, len(items) - 1)
    print(f"{name:<34} {dt*1000:8.3f} ms/it", flush=True)
    return dt, state


def section_fast(frames, n):
    from functools import partial
    from kimera_semantics_tpu.models import fast as fast_mod
    from kimera_semantics_tpu.ops import integrate as int_ops
    from kimera_semantics_tpu.ops import pallas_kernels

    cfg = bench_cfg("fast")
    print(f"== fast B=1 (R={cfg.pipeline.max_rays}, "
          f"seg={cfg.pipeline.segment_budget})", flush=True)

    grid = blocks.create(cfg)
    for f in frames[:4]:
        grid = fast_mod.integrate_frame(grid, f, cfg, INTR)
    jax.block_until_ready(grid.wsum)

    e2e, grid = loop("e2e integrate_frame", grid,
                     lambda g, f: fast_mod.integrate_frame(g, f, cfg, INTR),
                     frames[4:4 + n])

    carve_fn = jax.jit(
        lambda g, f: fast_mod._maybe_projective_carve(g, f, cfg, INTR),
        donate_argnums=(0,))
    carve, grid = loop("carve (atlas+alloc+dense)", grid, carve_fn,
                       frames[4:4 + n])

    @jax.jit
    def prep(f):
        band, origin, nd = fast_mod._band_prepare(f, cfg, INTR,
                                                  frame_idx=jnp.int32(1))
        return jax.tree.map(lambda x: jnp.sum(
            x.astype(jnp.float32) if x.dtype != jnp.float32 else x), band)
    tprep, _ = loop("prep (keep+compact+jobs)", None,
                    lambda s, f: prep(f), frames[4:4 + n])

    s_band = cfg.pipeline.resolved_band_steps(cfg.grid, cfg.tsdf)

    @jax.jit
    def prep_expand(f):
        band, origin, nd = fast_mod._band_prepare(f, cfg, INTR,
                                                  frame_idx=jnp.int32(1))
        st = int_ops.expand_jobs(cfg, band, s_band)
        return (jnp.sum(st.w), jnp.sum(st.run_key),
                jnp.sum(st.keys), jnp.sum(st.w_sdf))
    tpe, _ = loop("prep+expand (DDA kernel)", None,
                  lambda s, f: prep_expand(f), frames[4:4 + n])

    g_cfg = cfg.grid

    def thru_insert(g, f):
        g = fast_mod._maybe_projective_carve(g, f, cfg, INTR)
        g, batches, origin = fast_mod._frame_batches(g, f, cfg, INTR)
        (band, S), = batches
        st = int_ops.expand_jobs(cfg, band, S)
        from kimera_semantics_tpu.grid import hash as bhash
        ak = st.run_key.reshape(-1)
        tk, ts_, bc, nb, ov = bhash.insert_compacted(
            g.table_keys, g.table_slots, g.block_coords, g.n_blocks,
            ak, ak >= 0, g_cfg.table_size, g_cfg.block_capacity,
            g_cfg.world_extent_blocks)
        return dataclasses.replace(
            g, table_keys=tk, table_slots=ts_, block_coords=bc,
            n_blocks=nb, overflow=g.overflow + ov)
    thru_insert = jax.jit(thru_insert, donate_argnums=(0,))
    tins, grid = loop("thru insert_compacted", grid, thru_insert,
                      frames[4:4 + n])

    lab_shift = max(1, (g_cfg.num_labels - 1).bit_length())

    def thru_resolve(g, f):
        g = fast_mod._maybe_projective_carve(g, f, cfg, INTR)
        g, batches, origin = fast_mod._frame_batches(g, f, cfg, INTR)
        (band, S), = batches
        st = int_ops.expand_jobs(cfg, band, S)
        from kimera_semantics_tpu.grid import hash as bhash
        from kimera_semantics_tpu.ops import semantic
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
        outs = pallas_kernels.slot_resolve_stream(
            cfg, cube_vals, cam_block, st.run_key, st.run_idx, st.local,
            st.w, st.w_sdf, st.wc_gate, st.step_valid, st.labels, inform,
            lab_shift, False, interpret=SMOKE)
        return g, sum(jnp.sum(o.astype(jnp.float32)
                              if o.dtype != jnp.float32 else o)
                      for o in outs[:4])
    thru_resolve = jax.jit(thru_resolve, donate_argnums=(0,))
    tres, st8 = loop("thru cube+slot_resolve", (grid, 0.0),
                     lambda s, f: thru_resolve(s[0], f), frames[4:4 + n])
    grid = st8[0]

    print(f"{'derived: prepare alone':<34} {tprep*1000:8.3f}")
    print(f"{'derived: expand (pe-prep)':<34} {(tpe-tprep)*1000:8.3f}")
    print(f"{'derived: insert (ti-carve-pe)':<34} "
          f"{(tins-carve-tpe)*1000:8.3f}")
    print(f"{'derived: resolve (tr-ti)':<34} {(tres-tins)*1000:8.3f}")
    print(f"{'derived: reduce+scatter (e2e-tr)':<34} "
          f"{(e2e-tres)*1000:8.3f}", flush=True)


def section_merged(frames, n):
    from kimera_semantics_tpu.models import merged as merged_mod
    cfg = bench_cfg("merged")
    print("== merged", flush=True)
    grid = blocks.create(cfg)
    for f in frames[:4]:
        grid = merged_mod.integrate_frame(grid, f, cfg, INTR)
    jax.block_until_ready(grid.wsum)
    e2e, grid = loop("e2e integrate_frame B=1", grid,
                     lambda g, f: merged_mod.integrate_frame(g, f, cfg, INTR),
                     frames[4:4 + n])

    @jax.jit
    def prep(f):
        band, sem_v, drops, origin = merged_mod._bundle_prepare(f, cfg, INTR)
        s = jax.tree.map(lambda x: jnp.sum(
            x.astype(jnp.float32) if x.dtype != jnp.float32 else x),
            (band, sem_v))
        return s
    tprep, _ = loop("bundle+vote prepare", None, lambda s, f: prep(f),
                    frames[4:4 + n])

    from kimera_semantics_tpu.models import fast as fast_mod
    carve_fn = jax.jit(
        lambda g, f: fast_mod._maybe_projective_carve(g, f, cfg, INTR),
        donate_argnums=(0,))
    carve, grid = loop("carve chain", grid, carve_fn, frames[4:4 + n])
    print(f"{'derived: integrate tail':<34} "
          f"{(e2e - tprep - carve)*1000:8.3f}", flush=True)

    B = 8
    def stack(fs):
        return Frame(depth=jnp.stack([f.depth for f in fs]),
                     labels=jnp.stack([f.labels for f in fs]),
                     colors=jnp.stack([f.colors for f in fs]),
                     T_G_C=jnp.stack([f.T_G_C for f in fs]))
    batches = [stack(frames[4 + i:4 + i + B]) for i in range(0, n - B, B)]
    e2e8, grid = loop("e2e integrate_frames B=8", grid,
                      lambda g, fb: merged_mod.integrate_frames(g, fb, cfg,
                                                               INTR),
                      batches)
    print(f"{'':34} ({e2e8*1000/B:.3f} ms/frame)", flush=True)

    @jax.jit
    def prep8(fb):
        outs = jax.vmap(lambda f: merged_mod._bundle_prepare(f, cfg, INTR)
                        )(fb)
        return jax.tree.map(lambda x: jnp.sum(
            x.astype(jnp.float32) if x.dtype != jnp.float32 else x),
            outs[:2])
    tp8, _ = loop("vmapped bundle prepare B=8", None,
                  lambda s, fb: prep8(fb), batches)
    carve8 = jax.jit(
        lambda g, fb: fast_mod._projective_carve_batched(g, fb, cfg, INTR),
        donate_argnums=(0,))
    tc8, grid = loop("carve chain B=8", grid, carve8, batches)
    print(f"{'derived: B=8 integrate tail':<34} "
          f"{(e2e8 - tp8 - tc8)*1000:8.3f} ms/batch", flush=True)


def section_proj(frames, n):
    from kimera_semantics_tpu.models import projective as proj
    from kimera_semantics_tpu.ops import mip as mip_ops
    from kimera_semantics_tpu.ops import projective as proj_ops
    from kimera_semantics_tpu.ops import pallas_kernels
    from kimera_semantics_tpu.ops.integrate import make_likelihood_cached
    from kimera_semantics_tpu.core import transforms
    from kimera_semantics_tpu.config import ColorMode

    cfg = bench_cfg("projective")
    g_cfg = cfg.grid
    plan = mip_ops.make_plan(INTR.height, INTR.width,
                             cfg.pipeline.patch_rows, cfg.pipeline.patch_cols)
    print("== projective apply/alloc sub-stages", flush=True)
    grid = blocks.create(cfg)
    for f in frames[:4]:
        grid = proj.integrate_frame(grid, f, cfg, INTR)
    jax.block_until_ready(grid.wsum)
    e2e, grid = loop("e2e integrate_frame", grid,
                     lambda g, f: proj.integrate_frame(g, f, cfg, INTR),
                     frames[4:4 + n])

    jit_atlas = jax.jit(lambda fr: mip_ops.build_atlas(
        fr.depth, fr.labels, fr.colors, plan))
    tatlas, _ = loop("atlas", None, lambda s, f: jit_atlas(f),
                     frames[4:4 + n])

    @jax.jit
    def cand(f):
        atlas = mip_ops.build_atlas(f.depth, f.labels, f.colors, plan)
        keys, bvalid = proj.candidates_from_atlas(atlas, f.T_G_C, cfg, INTR,
                                                  plan)
        return jnp.sum(keys), jnp.sum(bvalid)
    tcand, _ = loop("atlas+candidate DDA", None, lambda s, f: cand(f),
                    frames[4:4 + n])

    def alloc(g, f):
        atlas = mip_ops.build_atlas(f.depth, f.labels, f.colors, plan)
        g, fc, fs_, fr = proj.allocate_from_atlas(g, atlas, f.T_G_C, cfg,
                                                  INTR, plan)
        return g
    alloc = jax.jit(alloc, donate_argnums=(0,))
    talloc, grid = loop("atlas+alloc (insert_frame_list)", grid, alloc,
                        frames[4:4 + n])

    # Fixed meta/deltas from one frame for the kernel-only loops.
    f0 = frames[4]
    atlas0 = jit_atlas(f0)

    def alloc_full(g, f):
        atlas = mip_ops.build_atlas(f.depth, f.labels, f.colors, plan)
        return proj.allocate_from_atlas(g, atlas, f.T_G_C, cfg, INTR, plan)
    grid, fc0, fs0, fr0 = jax.jit(alloc_full, donate_argnums=(0,))(grid, f0)
    T_C_G = transforms.inverse(f0.T_G_C)

    @jax.jit
    def meta_only(fcoords, real, T):
        T_C_G = transforms.inverse(T)
        lvl, u0l, v0, u0a = proj_ops.block_patch_meta(fcoords, T_C_G, INTR,
                                                      plan, g_cfg.block_size)
        meta = jnp.stack([v0, u0a, real.astype(jnp.int32), lvl, u0l,
                          fcoords[:, 0], fcoords[:, 1], fcoords[:, 2]],
                         axis=1)
        tflat = jnp.zeros((1, 128), jnp.float32).at[0, :12].set(
            T_C_G[:3, :4].reshape(-1))
        return meta, tflat
    tmeta, _ = loop("meta chain alone", None,
                    lambda s, f: meta_only(fc0, fr0, f.T_G_C),
                    frames[4:4 + n])

    meta0, tflat0 = meta_only(fc0, fr0, f0.T_G_C)
    with_color = cfg.semantic.color_mode == ColorMode.COLOR

    @jax.jit
    def sample_only(meta, tflat, atlas):
        outs = pallas_kernels.projective_sample_update(
            meta, tflat, atlas, cfg, INTR, plan, with_color=with_color,
            interpret=SMOKE)
        return tuple(jnp.sum(o.astype(jnp.float32)
                             if o.dtype != jnp.float32 else o) for o in outs)
    tsample, _ = loop("sample kernel alone", None,
                      lambda s, f: sample_only(meta0, tflat0, atlas0),
                      frames[4:4 + n])

    d_w, d_wsdf, d_cnt, d_lab, d_wc = pallas_kernels.projective_sample_update(
        meta0, tflat0, atlas0, cfg, INTR, plan, with_color=with_color,
        interpret=SMOKE)
    jax.block_until_ready(d_w)

    def rmw_only(wsum, wsdf, semc, semd, wcol, _f):
        return pallas_kernels.block_rmw_add(
            wsum, wsdf, semc, semd, wcol, fs0, d_w, d_wsdf, d_cnt, d_lab,
            d_wc, lk_delta=make_likelihood_cached(cfg).delta,
            interpret=SMOKE)
    rmw_only = jax.jit(rmw_only, donate_argnums=(0, 1, 2, 3, 4))
    chans = (grid.wsum, grid.wsdf, grid.sem_count, grid.sem_delta,
             grid.wcolor)
    trmw, chans = loop("rmw kernel alone", chans,
                       lambda c, f: rmw_only(*c, f), frames[4:4 + n])

    print(f"{'derived: apply total (e2e-alloc)':<34} "
          f"{(e2e-talloc)*1000:8.3f}")
    print(f"{'derived: candidates (cand-atlas)':<34} "
          f"{(tcand-tatlas)*1000:8.3f}")
    print(f"{'derived: insert (alloc-cand)':<34} "
          f"{(talloc-tcand)*1000:8.3f}")
    print(f"{'derived: apply residual':<34} "
          f"{(e2e-talloc-tmeta-tsample-trmw)*1000:8.3f}  "
          "(= e2e - alloc - meta - sample - rmw)", flush=True)


def main():
    n = int(os.environ.get("PROF_FRAMES", "48"))
    sections = os.environ.get("PROF_SECTIONS", "fast,merged,proj").split(",")
    lmap = LabelColorMap.random(21)
    ds = SyntheticDataset(num_frames=n + 8, intr=INTR, label_map=lmap)
    frames = [ds.frame(i) for i in range(n + 8)]
    jax.block_until_ready(frames[-1].depth)
    print(f"backend={jax.devices()[0].platform} frames={n}", flush=True)
    if SMOKE:
        # CPU shakeout: run every Pallas kernel in interpret mode (the
        # _use_pallas gates flip true when the integrate hook is set).
        from kimera_semantics_tpu.ops import integrate as _int
        from kimera_semantics_tpu.models import projective as _proj
        _int.FORCE_PALLAS_INTERPRET = True
        _proj.FORCE_PALLAS_INTERPRET = True
    import faulthandler
    faulthandler.dump_traceback_later(3300, exit=True)
    if "fast" in sections:
        section_fast(frames, n)
    if "merged" in sections:
        section_merged(frames, n)
    if "proj" in sections:
        section_proj(frames, n)
    faulthandler.cancel_dump_traceback_later()


if __name__ == "__main__":
    main()
