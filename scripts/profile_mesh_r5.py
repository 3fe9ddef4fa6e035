"""r5: attribute one warm incremental-mesh cycle end-to-end (VERDICT item 1).

Measures, on the real TPU tunnel, where the r4 1.34-1.59 s warm 200-block
cycle actually goes — device MC vs _compact_tris vs count sync (RTT) vs
packed fetch vs host unpack — then times the new one-dispatch cycle program
(ops/mesh.py extract_mesh_cycle) against the legacy per-batch path.

Scene: GT-filled grid from the analytic sim world (no integrator compile
needed), ~450 blocks at the bench geometry; 200 random blocks marked
updated per cycle, matching BENCH_r04's mesh_cycle_blocks.

Run:  python -u scripts/profile_mesh_r5.py > /tmp/profile_mesh_r5.log 2>&1
Env:  PROF_VPS (16), PROF_REPS (5)
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

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         SemanticConfig, TsdfConfig)
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.ops import mesh as mesh_ops
from kimera_semantics_tpu.sim import world as sim_world

VPS = int(os.environ.get("PROF_VPS", "16"))
REPS = int(os.environ.get("PROF_REPS", "5"))


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def timed(fn, reps=REPS, warm=1):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(1000.0 * (time.perf_counter() - t0))
    return round(float(np.median(ts)), 2), round(float(np.min(ts)), 2)


def main():
    emit("env", backend=jax.default_backend(), device=str(jax.devices()[0]))

    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=VPS,
                        block_capacity=4096 if VPS <= 16 else 768),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
    )
    label_map = LabelColorMap.random(cfg.grid.num_labels)

    world = sim_world.default_eval_world()
    # ~450 blocks at 0.8 m blocks: 5.6 x 5.6 x 4.0 m AABB = 7x7x5 = 245...
    # stretch to ~8x8x7 = 448.
    t0 = time.perf_counter()
    grid = sim_world.generate_semantic_sdf(world, cfg,
                                           lower=(-2.4, -2.4, -2.4),
                                           upper=(3.9, 3.9, 3.1))
    jax.block_until_ready(grid.wsum)
    emit("setup", blocks=int(grid.n_blocks),
         s=round(time.perf_counter() - t0, 1))

    cap = cfg.grid.block_capacity
    nb = int(grid.n_blocks)
    rng = np.random.default_rng(0)
    upd_slots = np.sort(rng.choice(nb, size=min(200, nb), replace=False))
    upd = np.zeros(grid.updated.shape, bool)
    upd[upd_slots] = True
    import dataclasses as dc
    grid = dc.replace(grid, updated=jnp.asarray(upd))
    jax.block_until_ready(grid.updated)

    skip_legacy = os.environ.get("PROF_SKIP_LEGACY", "0") == "1"
    if skip_legacy:
        # Fast re-run: only the new cycle path + equivalence vs legacy.
        def new_cycle():
            return mesh_ops.extract_mesh_cycle(grid, cfg,
                                               label_map=label_map,
                                               only_updated=True,
                                               return_blocks=True)
        t0 = time.perf_counter()
        m2, mr2, tr2 = new_cycle()
        emit("new_cycle_compile", s=round(time.perf_counter() - t0, 1),
             tris=m2.num_triangles)
        emit("new_cycle_warm", ms=timed(lambda: new_cycle(), reps=REPS)[0])
        m1, mr1, tr1 = mesh_ops.extract_mesh(grid, cfg, label_map=label_map,
                                             only_updated=True,
                                             return_blocks=True,
                                             _force_legacy=True)
        # Ground truth rows from geometry: each triangle's centroid lies in
        # its block (MC vertices stay within the cube).
        bs = cfg.grid.block_size
        cent = m2.vertices.reshape(-1, 3, 3).mean(axis=1)
        bc = np.floor(cent / bs - 1e-6).astype(np.int32)
        coord_of_row = np.asarray(grid.block_coords)
        ok_rows = np.mean(np.all(coord_of_row[tr2] == bc, axis=1))
        emit("equiv",
             same_tris=bool(m1.num_triangles == m2.num_triangles),
             verts_equal=bool(np.array_equal(m1.vertices, m2.vertices)),
             cols_equal=bool(np.array_equal(m1.colors, m2.colors)),
             rows_equal=bool(np.array_equal(tr1, tr2)),
             rows_geom_ok_frac=round(float(ok_rows), 4))

        def full_new():
            return mesh_ops.extract_mesh_cycle(grid, cfg,
                                               label_map=label_map)
        t0 = time.perf_counter(); mfn = full_new()
        emit("full_new_first", s=round(time.perf_counter() - t0, 1),
             tris=mfn.num_triangles)
        emit("full_new_warm", ms=timed(full_new, reps=3)[0])
        emit("done")
        return

    render = mesh_ops.render_colors(grid, cfg, label_map)
    jax.block_until_ready(render)
    emit("render_colors", ms=timed(lambda: jax.block_until_ready(
        mesh_ops.render_colors(grid, cfg, label_map)))[0])

    # --- legacy per-batch pieces -----------------------------------------
    chunk = max(1, (32 * 4096) // cfg.grid.vps3)
    slots32 = jnp.asarray(upd_slots[:chunk].astype(np.int32))
    t0 = time.perf_counter()
    out = mesh_ops._mesh_block_batch(grid, render, slots32, cfg)
    jax.block_until_ready(out)
    emit("mc_batch_compile", s=round(time.perf_counter() - t0, 1))
    emit("mc_batch_device", chunk=chunk, ms=timed(
        lambda: jax.block_until_ready(
            mesh_ops._mesh_block_batch(grid, render, slots32, cfg)))[0])

    tri_budget = 32768
    t0 = time.perf_counter()
    packed_d, cnt_d = mesh_ops._compact_tris(out[0], out[1], out[2],
                                             budget=tri_budget)
    jax.block_until_ready(packed_d)
    emit("compact_compile", s=round(time.perf_counter() - t0, 1))
    emit("compact_device", ms=timed(lambda: jax.block_until_ready(
        mesh_ops._compact_tris(out[0], out[1], out[2],
                               budget=tri_budget)))[0])

    # Fresh arrays per rep: jax caches the host copy after the first
    # np.asarray, so re-fetching the same buffer measures nothing.
    def fetch_ms(nbytes):
        ts = []
        for i in range(REPS):
            a = jnp.full((nbytes // 4,), float(i), jnp.float32)
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            np.asarray(a)
            ts.append(1000.0 * (time.perf_counter() - t0))
        return round(float(np.median(ts)), 2)

    def rtt_ms():
        ts = []
        for i in range(REPS):
            a = jnp.float32(i) + 1.0
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            float(a)
            ts.append(1000.0 * (time.perf_counter() - t0))
        return round(float(np.median(ts)), 2)

    emit("count_sync_rtt_ms", ms=rtt_ms())
    m1f = fetch_ms(1 << 20)
    m10f = fetch_ms(10 << 20)
    emit("fetch_1MB", ms=m1f)
    emit("fetch_10MB", ms=m10f,
         mbps=round(10.0 / max(m10f, 1e-3) * 1000.0, 1))

    # --- MC sub-stage attribution ----------------------------------------
    # Approximate: jit prefixes of the MC body, return a scalar reduce.
    from functools import partial

    g = cfg.grid
    V = g.voxels_per_side

    @partial(jax.jit, static_argnames=())
    def stage_lattice(grid, render, slots):
        from kimera_semantics_tpu.grid import blocks as gblocks
        coords = grid.block_coords[jnp.minimum(slots, cap - 1)]
        nbr = coords[:, None, :] + jnp.asarray(mesh_ops._NBR_OFFSETS)[None]
        nbr_slots = gblocks.lookup_slots(grid, nbr, g)
        self_ok = slots < cap
        nbr_slots = jnp.where(self_ok[:, None], nbr_slots, cap)
        safe_slots = jnp.where(self_ok, slots, cap)
        dist = gblocks.tsdf_distance(grid, cfg.tsdf.truncation_distance)
        sdf = mesh_ops._padded_channel(dist, safe_slots, nbr_slots, V)
        row_ok = (jnp.arange(grid.wsum.shape[0]) < cap)[:, None]
        wgt = mesh_ops._padded_channel(jnp.where(row_ok, grid.wsum, 0.0),
                                       safe_slots, nbr_slots, V)
        cols = [mesh_ops._padded_channel(render[c], safe_slots, nbr_slots, V)
                for c in range(3)]
        return sdf.sum() + wgt.sum() + sum(c.sum() for c in cols)

    jax.block_until_ready(stage_lattice(grid, render, slots32))
    emit("mc_stage_lattice", ms=timed(lambda: jax.block_until_ready(
        stage_lattice(grid, render, slots32)))[0])

    # --- cycle-level comparisons ------------------------------------------
    def legacy_cycle():
        m, mr, tr = mesh_ops.extract_mesh(grid, cfg, label_map=label_map,
                                          only_updated=True,
                                          return_blocks=True,
                                          _force_legacy=True)
        return m

    t0 = time.perf_counter()
    m = legacy_cycle()
    emit("legacy_cycle_compile", s=round(time.perf_counter() - t0, 1),
         tris=m.num_triangles)
    emit("legacy_cycle_warm", ms=timed(legacy_cycle, reps=REPS)[0])

    def new_cycle():
        return mesh_ops.extract_mesh_cycle(grid, cfg, label_map=label_map,
                                           only_updated=True,
                                           return_blocks=True)

    t0 = time.perf_counter()
    m2, mr2, tr2 = new_cycle()
    emit("new_cycle_compile", s=round(time.perf_counter() - t0, 1),
         tris=m2.num_triangles)
    emit("new_cycle_warm", ms=timed(lambda: new_cycle(), reps=REPS)[0])

    # Equivalence check vs legacy.
    m1, mr1, tr1 = mesh_ops.extract_mesh(grid, cfg, label_map=label_map,
                                         only_updated=True,
                                         return_blocks=True,
                                         _force_legacy=True)
    emit("equiv",
         same_tris=bool(m1.num_triangles == m2.num_triangles),
         verts_equal=bool(np.array_equal(m1.vertices, m2.vertices)),
         cols_equal=bool(np.array_equal(m1.colors, m2.colors)),
         rows_equal=bool(np.array_equal(tr1, tr2)))

    # Full-map extract comparison.
    def full_legacy():
        return mesh_ops.extract_mesh(grid, cfg, label_map=label_map,
                                     _force_legacy=True)
    def full_new():
        return mesh_ops.extract_mesh_cycle(grid, cfg, label_map=label_map)
    t0 = time.perf_counter(); mfl = full_legacy()
    emit("full_legacy_first", s=round(time.perf_counter() - t0, 1),
         tris=mfl.num_triangles)
    emit("full_legacy_warm", ms=timed(full_legacy, reps=3)[0])
    t0 = time.perf_counter(); mfn = full_new()
    emit("full_new_first", s=round(time.perf_counter() - t0, 1),
         tris=mfn.num_triangles)
    emit("full_new_warm", ms=timed(full_new, reps=3)[0])
    emit("done")


if __name__ == "__main__":
    sys.exit(main())
