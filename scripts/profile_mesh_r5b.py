"""r5b: split the compacted-cube mesh cycle's remaining device time.

The one-dispatch cycle costs ~50-70 ms of device time per 256-block page
(BENCH r5). Prefix-ablation over the cycle program's stages (selection +
subset render | lattices + case detect | cube compaction | full) on the
GT-world scene attributes it for the round-6 lattice-layout work.

Run:  python -u scripts/profile_mesh_r5b.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses as dc
import numpy as np
import jax
import jax.numpy as jnp

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         SemanticConfig, TsdfConfig)
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks as gblocks
from kimera_semantics_tpu.ops import mesh as mesh_ops
from kimera_semantics_tpu.ops import mc_tables
from kimera_semantics_tpu.sim import world as sim_world

REPS = int(os.environ.get("PROF_REPS", "16"))


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def sweep(fn, args, inner=8, reps=REPS):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(inner):
            o = fn(*args)
        jax.block_until_ready(o)
        ts.append(1000.0 * (time.perf_counter() - t0) / inner)
    return round(float(np.median(ts)), 2)


def main():
    emit("env", backend=jax.default_backend())
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0),
        semantic=SemanticConfig(semantic_measurement_probability=0.8))
    lmap = LabelColorMap.random(cfg.grid.num_labels)
    world = sim_world.default_eval_world()
    grid = sim_world.generate_semantic_sdf(world, cfg,
                                           lower=(-2.4, -2.4, -2.4),
                                           upper=(3.9, 3.9, 3.1))
    jax.block_until_ready(grid.wsum)
    rng = np.random.default_rng(0)
    upd_slots = np.sort(rng.choice(int(grid.n_blocks), size=200,
                                   replace=False))
    upd = np.zeros(grid.updated.shape, bool)
    upd[upd_slots] = True
    grid = dc.replace(grid, updated=jnp.asarray(upd))
    emit("scene", blocks=int(grid.n_blocks))

    g = cfg.grid
    V, V3, cap = g.voxels_per_side, g.vps3, g.block_capacity
    chunk, n_chunks, per_budget, cube_budget = mesh_ops._cycle_geometry(cfg)
    kmax = chunk * n_chunks
    label_table = jnp.asarray(lmap.label_colors)

    def make_prefix(upto):
        @jax.jit
        def run(grid):
            iota = jnp.arange(cap, dtype=jnp.int32)
            sel = (iota < grid.n_blocks) & grid.updated[:cap]
            flag = (~sel).astype(jnp.int32)
            sflag, order = jax.lax.sort((flag, iota), num_keys=1)
            slots_flat = jnp.where(sflag[:kmax] == 0, order[:kmax], cap)
            coords_p = grid.block_coords[jnp.minimum(slots_flat, cap - 1)]
            nsl = gblocks.lookup_slots(
                grid, coords_p[:, None, :]
                + jnp.asarray(mesh_ops._NBR_OFFSETS)[None], g)
            ok = slots_flat < cap
            nsl = jnp.where(ok[:, None], nsl, cap)
            allrows = jnp.concatenate(
                [jnp.where(ok, slots_flat, cap)[:, None], nsl],
                axis=1).reshape(-1)
            present = jnp.zeros((cap + 1,), bool).at[allrows].set(True)
            present = present.at[cap].set(False)
            R2 = min(1024, kmax * 8, cap + 1)
            iota_r = jnp.arange(cap + 1, dtype=jnp.int32)
            rs, rorder = jax.lax.sort(((~present).astype(jnp.int32),
                                       iota_r), num_keys=1)
            rows_list = jnp.where(rs[:R2] == 0, rorder[:R2], cap)
            rank = jnp.full((cap + 1,), R2, jnp.int32).at[rows_list].set(
                jnp.arange(R2, dtype=jnp.int32), mode="drop")
            rank = rank.at[cap].set(R2)
            render_sel = mesh_ops._render_rows(grid, cfg, label_table,
                                               rows_list)
            render_pad = jnp.pad(render_sel, ((0, 0), (0, 1), (0, 0)))
            if upto == 0:       # selection + subset render
                return jnp.sum(render_pad) + jnp.sum(rank)
            slots_c = slots_flat
            coords = grid.block_coords[jnp.minimum(slots_c, cap - 1)]
            nbr = coords[:, None, :] \
                + jnp.asarray(mesh_ops._NBR_OFFSETS)[None, :, :]
            nbr_slots = gblocks.lookup_slots(grid, nbr, g)
            self_ok = slots_c < cap
            nbr_slots = jnp.where(self_ok[:, None], nbr_slots, cap)
            safe_slots = jnp.where(self_ok, slots_c, cap)
            dist = gblocks.tsdf_distance(grid, cfg.tsdf.truncation_distance)
            sdf = mesh_ops._padded_channel(dist, safe_slots, nbr_slots, V)
            row_ok = (jnp.arange(grid.wsum.shape[0]) < cap)[:, None]
            wgt = mesh_ops._padded_channel(
                jnp.where(row_ok, grid.wsum, 0.0), safe_slots, nbr_slots, V)
            offs = mc_tables.CORNER_OFFSETS

            def corner_stack(lat):
                return jnp.stack(
                    [lat[:, int(o[0]):int(o[0]) + V,
                         int(o[1]):int(o[1]) + V,
                         int(o[2]):int(o[2]) + V] for o in offs], axis=-1)
            N = kmax * V3
            csdf = corner_stack(sdf).reshape(N, 8)
            cwgt = corner_stack(wgt).reshape(N, 8)
            observed = jnp.all(cwgt > mesh_ops.MIN_WEIGHT, axis=-1)
            case = jnp.sum((csdf < 0.0).astype(jnp.int32) *
                           (1 << jnp.arange(8, dtype=jnp.int32))[None],
                           axis=-1)
            case = jnp.where(observed, case, 0)
            active = (case > 0) & (case < 255)
            if upto == 1:       # + sdf/wgt lattices + corners + case
                return jnp.sum(active) + jnp.sum(csdf)
            iota2 = jnp.arange(N, dtype=jnp.int32)
            sfl, order2 = jax.lax.sort(((~active).astype(jnp.int32), iota2),
                                       num_keys=1)
            cidx = order2[:cube_budget]
            if upto == 2:       # + cube compaction sort
                return jnp.sum(cidx) + jnp.sum(sfl[:cube_budget])
            # upto 3: color lattices + corner stack (the (N, 8, 3) build)
            rsel = rank[jnp.minimum(safe_slots, cap)]
            rnbr = rank[jnp.minimum(nbr_slots, cap)]
            cols = [mesh_ops._padded_channel(render_pad[c], rsel, rnbr, V)
                    for c in range(3)]
            ccol_full = jnp.stack([corner_stack(c) for c in cols],
                                  axis=-1).reshape(N, 8, 3)
            return jnp.sum(ccol_full[cidx])
        return run

    prev = None
    for upto, name in enumerate(["sel_render", "lattice_case",
                                 "cube_sort", "color_lattice"]):
        ms = sweep(make_prefix(upto), (grid,))
        emit(f"cycle_prefix_{name}", ms=ms,
             stage_ms=round(ms - prev, 2) if prev is not None else None)
        prev = ms

    # Full cycle (sync) for the total.
    def full():
        return mesh_ops.extract_mesh_cycle(grid, cfg, lmap,
                                           only_updated=True,
                                           return_blocks=True)
    t0 = time.perf_counter(); full()
    emit("full_cycle_first_s", s=round(time.perf_counter() - t0, 1))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter(); full()
        ts.append(1000.0 * (time.perf_counter() - t0))
    emit("full_cycle_warm_ms", ms=round(float(np.median(ts)), 1))
    emit("done")


if __name__ == "__main__":
    sys.exit(main())
