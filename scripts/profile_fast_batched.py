#!/usr/bin/env python
"""Stage decomposition of the BATCHED fast path (B frames/dispatch,
projective carve) at the canonical config — finds where the per-frame ms go
after the round-2 batching work. Stages (each jitted separately; standalone
numbers include pass-through copies of untouched grid channels, so compare
RELATIVE magnitudes and the end-to-end):

  e2e       fast.integrate_frames (donation-threaded)
  carve     B x _maybe_projective_carve chain
  prepare   vmapped _band_prepare over the batch
  expand    dda_job_stream over the flattened band batch
  insert    insert_compacted over the run keys
  resolve   frame_cube x B + slot_resolve_stream (batched cubes)
  reduce    segment reduce + scatters (integrate_jobs minus the above)

Env: PROF_B (default 8), PROF_REPS (default 5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))

import jax
import jax.numpy as jnp

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import fast
from kimera_semantics_tpu.models.common import Frame
from kimera_semantics_tpu.ops import integrate as int_ops


def timeit(name, fn, *args, reps=None, thread=False):
    reps = reps or int(os.environ.get("PROF_REPS", "5"))
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
    print(f"{name:<52} {dt*1000:9.2f} ms   (compile {compile_s:6.1f} s)",
          flush=True)
    return out


def main():
    B = int(os.environ.get("PROF_B", "8"))
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False,
                        carve_mode="projective",
                        band_density=os.environ.get("PROF_BAND", "octave")),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(max_rays=int(os.environ.get("PROF_RAYS",
                                                            "32768")),
                                dedup_table_size=1 << 20,
                                scatter_mode="segment",
                                # scatters pay ~11 ns per budget slot x 4
                                # channels — size to unique segments, which
                                # do NOT scale with B (bench.py note)
                                segment_budget=int(os.environ.get(
                                    "PROF_SEG", str(1 << 18))),
                                alloc_stride=8, block_budget=512),
    )
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    lmap = LabelColorMap.random(21)
    ds = SyntheticDataset(num_frames=3 * B, intr=intr, label_map=lmap)
    allf = [ds.frame(i) for i in range(3 * B)]
    jax.block_until_ready(allf[-1].depth)
    print(f"backend={jax.devices()[0].platform} B={B}", flush=True)

    def stack(fs):
        return Frame(depth=jnp.stack([f.depth for f in fs]),
                     labels=jnp.stack([f.labels for f in fs]),
                     colors=jnp.stack([f.colors for f in fs]),
                     T_G_C=jnp.stack([f.T_G_C for f in fs]))

    import faulthandler
    faulthandler.dump_traceback_later(2100, exit=True)

    batches = [stack(allf[i * B:(i + 1) * B]) for i in range(3)]
    grid = blocks.create(cfg)
    for fb in batches[:2]:                        # warm scene + compile
        grid = fast.integrate_frames(grid, fb, cfg, intr)
        jax.block_until_ready(grid.wsum)
        print("warm", flush=True)
    fb = batches[2]

    grid = timeit("e2e: fast.integrate_frames (per dispatch)",
                  lambda g: fast.integrate_frames(g, fb, cfg, intr), grid,
                  thread=True)
    print(f"   == {float(0):.0f} overflow={int(grid.overflow)} "
          f"blocks={int(grid.n_blocks)}", flush=True)

    def carve_chain(g):
        for b in range(B):
            f = jax.tree.map(lambda x, _b=b: x[_b], fb)
            g = fast._maybe_projective_carve(g, f, cfg, intr)
        return g
    grid = timeit("carve: B x _maybe_projective_carve",
                  jax.jit(carve_chain), grid)

    prep = jax.jit(lambda fr: jax.vmap(
        lambda f: fast._band_prepare(f, cfg, intr))(fr))
    bands, origins, _drops = timeit("prepare: vmapped _band_prepare", prep,
                                    fb)
    band = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), bands)
    s_band = cfg.pipeline.resolved_band_steps(cfg.grid, cfg.tsdf)
    print(f"   band R={band.valid.shape[0]} S={s_band} "
          f"valid={int(jnp.sum(band.valid))}", flush=True)

    # _Stream is a plain dataclass (not a pytree) — return raw arrays.
    def _expand(j):
        st = int_ops.expand_jobs(cfg, j, s_band)
        return (st.keys, st.local, st.w, st.w_sdf, st.wc_gate,
                st.step_valid, st.run_key, st.run_idx)
    outs = timeit("expand: dda_job_stream", jax.jit(_expand), band)
    import types
    st = types.SimpleNamespace(
        keys=outs[0], local=outs[1], w=outs[2], w_sdf=outs[3],
        wc_gate=outs[4], step_valid=outs[5], run_key=outs[6],
        run_idx=outs[7])

    g = cfg.grid
    alloc_keys = st.run_key.reshape(-1)
    ins = jax.jit(lambda tk, ts, bc, nb: int_ops.bhash.insert_compacted(
        tk, ts, bc, nb, alloc_keys, alloc_keys >= 0, g.table_size,
        g.block_capacity, g.world_extent_blocks))
    timeit("insert: insert_compacted (band runs)", ins, grid.table_keys,
           grid.table_slots, grid.block_coords, grid.n_blocks)

    cube = jax.jit(lambda gg: int_ops.frame_cube(gg, cfg, origins))
    cube_vals, cam_blocks = timeit("cube: frame_cube x B", cube, grid)

    from kimera_semantics_tpu.ops import pallas_kernels, semantic
    lab_shift = max(1, (g.num_labels - 1).bit_length())
    inform = semantic.informative(band.label) & band.valid
    res = jax.jit(lambda cv, cb: pallas_kernels.slot_resolve_stream(
        cfg, cv, cb, st.run_key, st.run_idx, st.local, st.w, st.w_sdf,
        st.wc_gate, st.step_valid, band.label, inform, lab_shift, False))
    timeit("resolve: slot_resolve_stream (batched cubes)", res, cube_vals,
           cam_blocks)

    tail = jax.jit(lambda gg: int_ops.integrate_jobs(
        gg, cfg, [(band, s_band)], cube_origin=origins))
    timeit("tail: integrate_jobs (insert+resolve+reduce)", tail, grid)


if __name__ == "__main__":
    main()
