#!/usr/bin/env python
"""Post-reduce grid-scatter strategies (r4).

profile_reduce_r4.py attribution at the fast B=1 operating point: the sorted
sort/scan/compact reduce is 1.5 ms; the FOUR grid scatters that follow are
21.0 ms. This script times each scatter alone and the candidate replacements:

  A  wsum budget walk alone (sorted unique indices, budget 98304)
  B  all three voxel-channel walks
  C  semd scatter alone (unique, unsorted, 1.4 GB operand)
  D  budget=32768 variants (live segments are ~19k at B=1)
  E  staged fusion: ONE (budget, 8)-row payload scatter into a (flat, 8)
     staging buffer + dense adds into the channels (row payloads ride free;
     r3's negative result scattered into the channels' own axis-1 windows —
     this stages in scatter-native layout instead)
  F  semd with label-major combined keys => indices_are_sorted semd
  G  scatter into a COMPACT staging target (touched-rows domain, 512 rows)
     then one aligned dense row-gather/add into the grid channels

Env: PROF_FRAMES (default 64), PROF_SMOKE=1 CPU shakeout.
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

import jax.numpy as jnp
import numpy as np

from kimera_semantics_tpu.ops.reduce import TRASH_KEY

SMOKE = os.environ.get("PROF_SMOKE", "0") == "1"


def loop(name, fn, args, n, donate=False):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<52} {dt*1000:8.3f} ms", flush=True)
    return dt


def chain(name, init, step, n):
    """Donated-state loop: state threads through (scatter in-place form)."""
    state = step(*init)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        state = step(*state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<52} {dt*1000:8.3f} ms", flush=True)
    return dt, state


def main():
    n = int(os.environ.get("PROF_FRAMES", "64"))
    if SMOKE:
        cap, v3, L, B, nseg = 512, 512, 21, 1 << 14, 1200
    else:
        cap, v3, L, B, nseg = 4096, 4096, 21, 98304, 18885
    rows = cap + 8
    n_flat = (cap + 1) * v3
    row_flat = rows * v3
    lab_shift = max(1, (L - 1).bit_length())
    print(f"backend={jax.devices()[0].platform} cap={cap} v3={v3} "
          f"B={B} nseg={nseg}", flush=True)

    # Optional HBM ballast: hold N GB of live arrays to reproduce the heavy
    # pipeline process's allocator state (r4 finding: the same scatter is
    # 250x slower in the real process than in a light one).
    ballast_gb = float(os.environ.get("BALLAST_GB", "0"))
    ballast = []
    while ballast_gb > 0:
        chunk = min(ballast_gb, 0.5)
        ballast.append(jnp.ones((int(chunk * (1 << 28)),), jnp.float32))
        ballast_gb -= chunk
    if ballast:
        jax.block_until_ready(ballast[-1])
        print(f"ballast: {sum(b.nbytes for b in ballast)/2**30:.2f} GiB",
              flush=True)

    # WARM_PALLAS=1: run one trivial Pallas kernel with the pipeline's
    # raised scoped-vmem limit first (tests whether executing such a kernel
    # flips per-device state that slows later XLA scatters).
    if os.environ.get("WARM_PALLAS", "0") == "1":
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _add(x_ref, y_ref, o_ref):
            o_ref[:] = x_ref[:] + y_ref[:]
        x = jnp.ones((8, 128), jnp.float32)
        o = pl.pallas_call(
            _add, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))(x, x)
        jax.block_until_ready(o)
        print("warm: trivial pallas kernel (100MB vmem limit) ran",
              flush=True)

    # WARM_MODE: run one isolated pipeline piece first, to find which one
    # flips the process into the slow-scatter regime.
    wm = os.environ.get("WARM_MODE", "")
    if wm:
        import dataclasses as dc
        from kimera_semantics_tpu.grid import blocks as gblocks
        from kimera_semantics_tpu.grid import hash as bhash
        from profile_reduce_r4 import bench_cfg as rcfg, INTR as RINTR
        cfgp = rcfg()
        if wm == "grid":
            gr = gblocks.create(cfgp)
            jax.block_until_ready(gr.sem_delta)
            del gr
        elif wm == "dda":
            from kimera_semantics_tpu.ops import pallas_kernels as pk
            R = cfgp.pipeline.max_rays
            S = cfgp.pipeline.resolved_band_steps(cfgp.grid, cfgp.tsdf)
            z3 = jnp.zeros((3, R), jnp.float32)
            o = pk.dda_job_stream(cfgp, S, z3, z3 + 1.0, z3, z3 + 1.0,
                                  jnp.ones((R,), jnp.float32),
                                  jnp.ones((R,), bool))
            jax.block_until_ready(o[0])
        elif wm == "sorts":
            ks = jnp.arange(143360, dtype=jnp.int32) % 997
            sk = jnp.sort(ks)
            is_first = jnp.concatenate(
                [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
            uk = jnp.sort(jnp.where(is_first, sk, jnp.int32(0x7FFFFFFF)))
            jax.block_until_ready(uk)
        elif wm == "lookup":
            gr = gblocks.create(cfgp)
            uk = jnp.arange(4096, dtype=jnp.int32)
            sl = bhash.lookup(gr.table_keys, gr.table_slots, uk,
                              cfgp.grid.table_size)
            jax.block_until_ready(sl)
            del gr
        elif wm == "raceset":
            tkeys = jnp.full((cfgp.grid.table_size,), -1, jnp.int32)
            ks = jnp.arange(512, dtype=jnp.int32)
            idx = bhash.mix(ks) & (cfgp.grid.table_size - 1)
            out = tkeys.at[jnp.where(ks >= 0, idx, cfgp.grid.table_size)
                           ].set(ks, mode="drop")
            jax.block_until_ready(out)
        elif wm == "whileset":
            # while_loop WITH a scatter inside, one round (static-ish trip)
            tkeys = jnp.full((cfgp.grid.table_size,), -1, jnp.int32)
            ks = jnp.arange(512, dtype=jnp.int32)

            @jax.jit
            def f(tkeys, ks):
                idx = bhash.mix(ks) & (cfgp.grid.table_size - 1)

                def cond(st):
                    return st[2] < 2

                def body(st):
                    tk, ix, r = st
                    tk = tk.at[ix].set(ks, mode="drop")
                    ix = (ix + 1) & (cfgp.grid.table_size - 1)
                    return tk, ix, r + 1
                return jax.lax.while_loop(cond, body,
                                          (tkeys, idx, jnp.int32(0)))
            out = f(tkeys, ks)
            jax.block_until_ready(out[0])
        elif wm == "probe":
            gr = gblocks.create(cfgp)
            uk = jnp.arange(512, dtype=jnp.int32)
            tk, ts2, bc, nb, ov = bhash.insert(
                gr.table_keys, gr.table_slots, gr.block_coords, gr.n_blocks,
                uk, uk >= 0, cfgp.grid.table_size, cfgp.grid.block_capacity,
                cfgp.grid.world_extent_blocks)
            jax.block_until_ready(tk)
            del gr
        elif wm == "insert":
            gr = gblocks.create(cfgp)
            ks = jnp.arange(143360, dtype=jnp.int32) % 997
            tk, ts2, bc, nb, ov = bhash.insert_compacted(
                gr.table_keys, gr.table_slots, gr.block_coords, gr.n_blocks,
                ks, ks >= 0, cfgp.grid.table_size, cfgp.grid.block_capacity,
                cfgp.grid.world_extent_blocks)
            jax.block_until_ready(tk)
            del gr
        elif wm == "carve":
            from kimera_semantics_tpu.core.color import LabelColorMap
            from kimera_semantics_tpu.io.dataset import SyntheticDataset
            from kimera_semantics_tpu.models import fast as fast_mod
            lmap = LabelColorMap.random(21)
            ds = SyntheticDataset(num_frames=2, intr=RINTR, label_map=lmap)
            gr = gblocks.create(cfgp)
            cf = jax.jit(
                lambda g, f: fast_mod._maybe_projective_carve(g, f, cfgp,
                                                              RINTR),
                donate_argnums=(0,))
            gr = cf(gr, ds.frame(0))
            jax.block_until_ready(gr.wsum)
            del gr
        print(f"warm: mode={wm} ran", flush=True)

    # WARM_PIPE=1: run two real fast-pipeline frames first (the heavy
    # process's prelude) at the bench config.
    if os.environ.get("WARM_PIPE", "0") == "1":
        from kimera_semantics_tpu.core.color import LabelColorMap
        from kimera_semantics_tpu.io.dataset import SyntheticDataset
        from kimera_semantics_tpu.grid import blocks as gblocks
        from kimera_semantics_tpu.models import fast as fast_mod
        from profile_reduce_r4 import bench_cfg as rcfg, INTR as RINTR
        cfgp = rcfg()
        lmap = LabelColorMap.random(21)
        ds = SyntheticDataset(num_frames=3, intr=RINTR, label_map=lmap)
        gr = gblocks.create(cfgp)
        for i in range(2):
            gr = fast_mod.integrate_frame(gr, ds.frame(i), cfgp, RINTR)
        jax.block_until_ready(gr.wsum)
        del gr
        print("warm: 2 real fast frames ran", flush=True)

    # Synthetic but realistic segment list: nseg live segments over ~460
    # touched slots, sorted ascending, trash beyond.
    rng = np.random.default_rng(0)
    n_touched = 460 if not SMOKE else 60
    slots = np.sort(rng.choice(cap, size=n_touched, replace=False))
    seg_slot = rng.choice(slots, size=nseg)
    seg_local = rng.integers(0, v3, size=nseg)
    seg_lab = rng.integers(1, L, size=nseg)
    vox_np = seg_slot.astype(np.int64) * v3 + seg_local
    k2 = np.sort((vox_np << lab_shift) | seg_lab).astype(np.int32)
    ok_np = np.full((B,), TRASH_KEY, np.int32)
    ok_np[:nseg] = k2
    ok = jnp.asarray(ok_np)
    tw = jnp.where(ok != TRASH_KEY, 1.0, 0.0)
    tsdf_s = tw * 0.5
    tcnt = tw

    seg_valid = ok != TRASH_KEY
    vox = jnp.where(seg_valid, ok >> lab_shift, n_flat)
    lab = ok & ((1 << lab_shift) - 1)
    sem_key = jnp.where(seg_valid, lab * row_flat + vox, L * row_flat)
    jax.block_until_ready(sem_key)

    def mk(k=1):
        outs = [jnp.zeros((rows, v3), jnp.float32) for _ in range(k)]
        jax.block_until_ready(outs[-1])
        return outs if k > 1 else outs[0]

    def mkd():
        d = jnp.zeros((L, rows, v3), jnp.float32)
        jax.block_until_ready(d)
        return d

    # --- A: single budget walk -------------------------------------------
    one = jax.jit(lambda t, v, x: t.reshape(-1).at[v].add(
        x, mode="drop", indices_are_sorted=True).reshape(t.shape),
        donate_argnums=(0,))
    chain("A  wsum walk alone (sorted unique)", (mk(), vox, tw),
          lambda t, v, x: (one(t, v, x), v, x), n)

    # unique_indices promise added
    oneu = jax.jit(lambda t, v, x: t.reshape(-1).at[v].add(
        x, mode="drop", indices_are_sorted=True, unique_indices=True
        ).reshape(t.shape), donate_argnums=(0,))
    chain("A' wsum walk (sorted AND unique promise)", (mk(), vox, tw),
          lambda t, v, x: (oneu(t, v, x), v, x), n)

    # --- B: all three voxel walks ----------------------------------------
    def three(a, b, c, v, x, y, z):
        a = a.reshape(-1).at[v].add(x, mode="drop",
                                    indices_are_sorted=True).reshape(a.shape)
        b = b.reshape(-1).at[v].add(y, mode="drop",
                                    indices_are_sorted=True).reshape(b.shape)
        c = c.reshape(-1).at[v].add(z, mode="drop",
                                    indices_are_sorted=True).reshape(c.shape)
        return a, b, c
    three = jax.jit(three, donate_argnums=(0, 1, 2))
    chain("B  three voxel walks", tuple(mk(3)) + (vox, tw, tsdf_s, tcnt),
          lambda a, b, c, v, x, y, z: three(a, b, c, v, x, y, z)
          + (v, x, y, z), n)

    # --- C: semd scatter alone -------------------------------------------
    semd_s = jax.jit(lambda t, k, x: t.reshape(-1).at[k].add(
        x, mode="drop", unique_indices=True).reshape(t.shape),
        donate_argnums=(0,))
    chain("C  semd scatter (unique, unsorted)", (mkd(), sem_key, tcnt),
          lambda t, k, x: (semd_s(t, k, x), k, x), n)

    semd_s2 = jax.jit(lambda t, k, x: t.reshape(-1).at[k].add(
        x, mode="drop", unique_indices=True,
        indices_are_sorted=True).reshape(t.shape), donate_argnums=(0,))
    chain("F  semd walk (label-major sorted keys)", (mkd(), sem_key, tcnt),
          lambda t, k, x: (semd_s2(t, k, x), k, x), n)
    # (sem_key here IS ascending in (lab-major)? no — built voxel-major.
    #  Sortedness promise with unsorted keys is a LIE for correctness but
    #  timing shows what the sorted form would cost; real impl re-keys.)

    # --- D: small-budget variants ----------------------------------------
    for Bs in (32768, 24576):
        voxs, tws = vox[:Bs], tw[:Bs]
        chain(f"D  wsum walk at budget {Bs}", (mk(), voxs, tws),
              lambda t, v, x: (one(t, v, x), v, x), n)

    # --- E: staged row-payload fusion ------------------------------------
    # ONE scatter of (B, 8) rows into (n_flat+1, 8) staging + 3 dense adds.
    pay = jnp.stack([tw, tsdf_s, tcnt, tcnt,
                     jnp.zeros_like(tw), jnp.zeros_like(tw),
                     jnp.zeros_like(tw), jnp.zeros_like(tw)], axis=1)
    jax.block_until_ready(pay)

    def staged(a, b, c, v, p):
        # Staging spans the full channel flat domain (incl. trash rows, which
        # the system never reads) so the dense adds are shape-aligned.
        st = jnp.zeros((rows * v3, 8), jnp.float32)
        st = st.at[v].add(p, mode="drop", indices_are_sorted=True,
                          unique_indices=False)
        a = (a.reshape(-1) + st[:, 0]).reshape(a.shape)
        b = (b.reshape(-1) + st[:, 1]).reshape(b.shape)
        c = (c.reshape(-1) + st[:, 2]).reshape(c.shape)
        return a, b, c
    staged = jax.jit(staged, donate_argnums=(0, 1, 2))
    chain("E  staged (B,8) row scatter + dense adds",
          tuple(mk(3)) + (vox, pay),
          lambda a, b, c, v, p: staged(a, b, c, v, p) + (v, p), n)

    # --- G: compact staging over touched rows ----------------------------
    # Map segment slots to frame-row ranks (<=512 rows): scatter into a
    # (512*v3,) staging then ONE aligned add per channel via row gather.
    # Rank map: dense (cap+1,) lut built per frame (tiny scatter).
    lut_np = np.full((cap + 1,), 511, np.int32)
    for i, s in enumerate(slots[:511]):
        lut_np[s] = i
    lut = jnp.asarray(lut_np)
    rvox = jnp.where(seg_valid,
                     lut[jnp.minimum(vox // v3, cap)] * v3 + (vox % v3),
                     512 * v3)
    jax.block_until_ready(rvox)
    fslots = jnp.asarray(np.concatenate([slots[:511],
                                         [cap]* (512 - min(511, len(slots)))]
                                        ).astype(np.int32))

    def compactstage(a, b, c, v, x, y, z):
        st = jnp.zeros((512 * v3 + 1, 4), jnp.float32)
        p = jnp.stack([x, y, z, z], axis=1)
        st = st.at[v].add(p, mode="drop", indices_are_sorted=False)
        stf = st[:512 * v3].reshape(512, v3, 4)
        a = a.at[fslots].add(stf[:, :, 0], mode="drop")
        b = b.at[fslots].add(stf[:, :, 1], mode="drop")
        c = c.at[fslots].add(stf[:, :, 2], mode="drop")
        return a, b, c
    compactstage = jax.jit(compactstage, donate_argnums=(0, 1, 2))
    chain("G  compact staging (512 rows) + row adds",
          tuple(mk(3)) + (rvox, tw, tsdf_s, tcnt),
          lambda a, b, c, v, x, y, z: compactstage(a, b, c, v, x, y, z)
          + (v, x, y, z), n)


if __name__ == "__main__":
    main()
