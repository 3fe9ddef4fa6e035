#!/usr/bin/env python
"""Isolate WHY the real sem_delta scatter costs 17.8 ms (r4).

profile_scatter_r4.py's synthetic semd scatter runs in 0.067 ms; the same op
on the real pipeline arrays costs 17.8 ms. Variants here bisect the cause on
the REAL reduce outputs (rebuilt via profile_reduce_r4.build_inputs):

  v0  real composite (key+val computed in-jit, donate)      [slow baseline]
  v1  keys+vals PRECOMPUTED outside, scatter-only jit
  v2  in-jit key computation, precomputed vals
  v3  as v0 but NO unique_indices promise
  v4  as v0 but trash routed to DISTINCT OOB keys (no 79k-duplicate index)
  v5  as v0 on a FRESH zeros sem_delta (not the pipeline's buffer)
  v6  as v0 but scatter into (rows*v3*L,) flat via vox*L+lab keys (compact
      label-minor addressing, same information)
  w0  real 3-channel walks composite                          [3.6 ms base]
  w1  precomputed vox, scatter-only
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

from profile_reduce_r4 import bench_cfg, build_inputs, SMOKE
from kimera_semantics_tpu.ops.reduce import TRASH_KEY, segment_compact_reduce


def chain(name, init, step, n):
    state = step(*init)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        state = step(*state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<56} {dt*1000:8.3f} ms", flush=True)
    return dt, state


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

    g_cfg = cfg.grid
    lab_shift = max(1, (g_cfg.num_labels - 1).bit_length())
    n_flat = (g_cfg.block_capacity + 1) * g_cfg.vps3
    row_flat = g_cfg.padded_rows * g_cfg.vps3
    L = g_cfg.num_labels
    B = cfg.pipeline.segment_budget
    frac = cfg.pipeline.stream_active_fraction

    red = jax.jit(lambda k, a, b, c: segment_compact_reduce(
        k, (a, b, c), B, max_run=n_jobs, active_frac=frac))
    ok, (t0c, t1c, t2c), _ = red(k2, wv, wsdfv, cntv)
    jax.block_until_ready(ok)

    rows = g_cfg.padded_rows
    v3 = g_cfg.vps3

    def mkd():
        d = jnp.zeros((L, rows, v3), jnp.float32)
        jax.block_until_ready(d)
        return d

    # v0: composite (the pipeline form)
    def v0f(semd, ok, tcnt):
        seg_valid = ok != TRASH_KEY
        vox = jnp.where(seg_valid, ok >> lab_shift, n_flat)
        lab_seg = ok & ((1 << lab_shift) - 1)
        sem_key = jnp.where(seg_valid, lab_seg * row_flat + vox, L * row_flat)
        return semd.reshape(-1).at[sem_key].add(
            tcnt * 0.5, mode="drop", unique_indices=True).reshape(semd.shape)
    v0j = jax.jit(v0f, donate_argnums=(0,))
    chain("v0 composite (pipeline form)", (mkd(), ok, t2c),
          lambda t, k, x: (v0j(t, k, x), k, x), n)

    # v1: precomputed keys+vals
    seg_valid = ok != TRASH_KEY
    vox = jnp.where(seg_valid, ok >> lab_shift, n_flat)
    lab_seg = ok & ((1 << lab_shift) - 1)
    sem_key = jnp.where(seg_valid, lab_seg * row_flat + vox, L * row_flat)
    val = t2c * 0.5
    jax.block_until_ready(sem_key)
    v1j = jax.jit(lambda t, k, x: t.reshape(-1).at[k].add(
        x, mode="drop", unique_indices=True).reshape(t.shape),
        donate_argnums=(0,))
    chain("v1 precomputed keys+vals", (mkd(), sem_key, val),
          lambda t, k, x: (v1j(t, k, x), k, x), n)

    # v2: in-jit keys, precomputed vals
    def v2f(semd, ok, x):
        sv = ok != TRASH_KEY
        vx = jnp.where(sv, ok >> lab_shift, n_flat)
        lb = ok & ((1 << lab_shift) - 1)
        k = jnp.where(sv, lb * row_flat + vx, L * row_flat)
        return semd.reshape(-1).at[k].add(
            x, mode="drop", unique_indices=True).reshape(semd.shape)
    v2j = jax.jit(v2f, donate_argnums=(0,))
    chain("v2 in-jit keys, precomputed vals", (mkd(), ok, val),
          lambda t, k, x: (v2j(t, k, x), k, x), n)

    # v3: no unique promise
    def v3f(semd, ok, tcnt):
        sv = ok != TRASH_KEY
        vx = jnp.where(sv, ok >> lab_shift, n_flat)
        lb = ok & ((1 << lab_shift) - 1)
        k = jnp.where(sv, lb * row_flat + vx, L * row_flat)
        return semd.reshape(-1).at[k].add(
            tcnt * 0.5, mode="drop").reshape(semd.shape)
    v3j = jax.jit(v3f, donate_argnums=(0,))
    chain("v3 composite, NO unique promise", (mkd(), ok, t2c),
          lambda t, k, x: (v3j(t, k, x), k, x), n)

    # v4: distinct OOB trash keys
    def v4f(semd, ok, tcnt):
        sv = ok != TRASH_KEY
        vx = jnp.where(sv, ok >> lab_shift, n_flat)
        lb = ok & ((1 << lab_shift) - 1)
        slot = jnp.arange(ok.shape[0], dtype=jnp.int32)
        k = jnp.where(sv, lb * row_flat + vx, L * row_flat + slot)
        return semd.reshape(-1).at[k].add(
            tcnt * 0.5, mode="drop", unique_indices=True).reshape(semd.shape)
    v4j = jax.jit(v4f, donate_argnums=(0,))
    chain("v4 composite, distinct OOB trash", (mkd(), ok, t2c),
          lambda t, k, x: (v4j(t, k, x), k, x), n)

    # v5: pipeline's own sem_delta buffer
    chain("v5 composite on pipeline sem_delta", (grid.sem_delta, ok, t2c),
          lambda t, k, x: (v0j(t, k, x), k, x), n)

    # v6: label-minor compact addressing
    def v6f(semd_lm, ok, tcnt):
        sv = ok != TRASH_KEY
        vx = jnp.where(sv, ok >> lab_shift, n_flat)
        lb = ok & ((1 << lab_shift) - 1)
        Lp = 1 << lab_shift
        k = jnp.where(sv, vx * Lp + lb, n_flat * Lp)
        return semd_lm.at[k].add(tcnt * 0.5, mode="drop",
                                 indices_are_sorted=True,
                                 unique_indices=True)
    v6j = jax.jit(v6f, donate_argnums=(0,))
    semd_lm = jnp.zeros((n_flat * (1 << lab_shift) + 1,), jnp.float32)
    jax.block_until_ready(semd_lm)
    chain("v6 label-minor flat (sorted walk)", (semd_lm, ok, t2c),
          lambda t, k, x: (v6j(t, k, x), k, x), n)

    # v7: real keys ROUND-TRIPPED through host (fresh default-layout array)
    ok_rt = jnp.asarray(np.asarray(ok))
    val_rt = jnp.asarray(np.asarray(val))
    key_rt = jnp.asarray(np.asarray(sem_key))
    jax.block_until_ready(key_rt)
    chain("v7 host-round-tripped real keys", (mkd(), key_rt, val_rt),
          lambda t, k, x: (v1j(t, k, x), k, x), n)

    # v8: synthetic keys, SAME process (scatter_r4 recipe)
    nseg = int(np.sum(np.asarray(ok) != TRASH_KEY))
    rng = np.random.default_rng(0)
    slots_s = np.sort(rng.choice(g_cfg.block_capacity, size=460,
                                 replace=False))
    seg_slot = rng.choice(slots_s, size=nseg)
    seg_local = rng.integers(0, g_cfg.vps3, size=nseg)
    seg_lab = rng.integers(1, L, size=nseg)
    vox_np = seg_slot.astype(np.int64) * g_cfg.vps3 + seg_local
    k2s = np.sort((vox_np << lab_shift) | seg_lab).astype(np.int32)
    ok_syn = np.full((B,), TRASH_KEY, np.int32)
    ok_syn[:nseg] = k2s
    ok_syn = jnp.asarray(ok_syn)
    sv_s = ok_syn != TRASH_KEY
    key_syn = jnp.where(sv_s, (ok_syn & ((1 << lab_shift) - 1)) * row_flat
                        + (ok_syn >> lab_shift), L * row_flat)
    jax.block_until_ready(key_syn)
    chain("v8 synthetic keys, same process", (mkd(), key_syn, val_rt),
          lambda t, k, x: (v1j(t, k, x), k, x), n)

    # v9: real keys with live segments REPLACED by first-460-slot synthetic
    # (tests whether slot concentration matters)
    seg_slot2 = rng.choice(np.arange(460), size=nseg)
    vox2 = seg_slot2.astype(np.int64) * g_cfg.vps3 + seg_local
    k2c = np.sort((vox2 << lab_shift) | seg_lab).astype(np.int32)
    ok_c = np.full((B,), TRASH_KEY, np.int32)
    ok_c[:nseg] = k2c
    ok_c = jnp.asarray(ok_c)
    sv_c = ok_c != TRASH_KEY
    key_c = jnp.where(sv_c, (ok_c & ((1 << lab_shift) - 1)) * row_flat
                      + (ok_c >> lab_shift), L * row_flat)
    jax.block_until_ready(key_c)
    chain("v9 synthetic keys in slots [0,460)", (mkd(), key_c, val_rt),
          lambda t, k, x: (v1j(t, k, x), k, x), n)

    # w0/w1: three-channel walks
    trunc = cfg.tsdf.truncation_distance

    def w0f(a, b, c, ok, x, y, z):
        sv = ok != TRASH_KEY
        vx = jnp.where(sv, ok >> lab_shift, n_flat)
        a = a.reshape(-1).at[vx].add(x, mode="drop",
                                     indices_are_sorted=True).reshape(a.shape)
        b = b.reshape(-1).at[vx].add(y - trunc * x, mode="drop",
                                     indices_are_sorted=True).reshape(b.shape)
        c = c.reshape(-1).at[vx].add(z, mode="drop",
                                     indices_are_sorted=True).reshape(c.shape)
        return a, b, c
    w0j = jax.jit(w0f, donate_argnums=(0, 1, 2))

    def mk3():
        outs = [jnp.zeros((rows, v3), jnp.float32) for _ in range(3)]
        jax.block_until_ready(outs[-1])
        return tuple(outs)
    chain("w0 three walks composite", mk3() + (ok, t0c, t1c, t2c),
          lambda a, b, c, k, x, y, z: w0j(a, b, c, k, x, y, z)
          + (k, x, y, z), n)

    wsdf_val = t1c - trunc * t0c
    jax.block_until_ready(wsdf_val)
    w1j = jax.jit(lambda a, b, c, v, x, y, z: (
        a.reshape(-1).at[v].add(x, mode="drop",
                                indices_are_sorted=True).reshape(a.shape),
        b.reshape(-1).at[v].add(y, mode="drop",
                                indices_are_sorted=True).reshape(b.shape),
        c.reshape(-1).at[v].add(z, mode="drop",
                                indices_are_sorted=True).reshape(c.shape)),
        donate_argnums=(0, 1, 2))
    chain("w1 three walks precomputed", mk3() + (vox, t0c, wsdf_val, t2c),
          lambda a, b, c, v, x, y, z: w1j(a, b, c, v, x, y, z)
          + (v, x, y, z), n)


if __name__ == "__main__":
    main()
