"""Pallas TPU kernels for the integration hot path.

`dda_update_stream` fuses the per-frame pipeline stages that XLA would
otherwise materialize through a 180-step lax.scan (ops/raycast.py) plus a chain
of (S, R) elementwise passes: ray setup, Amanatides-Woo stepping, block/local
index math, key packing, projective SDF, and weight drop-off — all per ray
tile, entirely in VMEM/registers, one HBM write per output stream.

This is the speed-of-light treatment of the reference's HOT LOOP #2 (the
per-voxel-along-ray loop, semantic_tsdf_integrator_fast.cpp:110-140 — SURVEY
CS1): arithmetic intensity is tiny, so the kernel is sized to touch HBM exactly
once per emitted update-stream element. Hash lookup + scatter-adds stay in XLA
(random-access gathers/scatters are XLA's job; sequential streams are ours).

Layout: rays ride the 128-lane axis; per-axis state is (3, T) sublane-stacked;
outputs are (S, T) planes per quantity (SURVEY 7 / grid/blocks.py layout note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FusionConfig

TILE = 512  # rays per program (lane-dim multiple of 128)


def _dda_kernel(origin_ref, point_ref, weight_ref, flags_ref,
                key_ref, local_ref, w_ref, wsdf_ref, wc_ref, valid_ref,
                run_key_ref, run_idx_ref,
                *, S, MAXR, voxel_size, trunc, max_ray, carving, vps, ext,
                use_dropoff):
    f32 = jnp.float32
    origin = origin_ref[:]        # (3, T)
    point = point_ref[:]          # (3, T)
    weight = weight_ref[0, :]     # (T,)
    flags = flags_ref[:]          # (2, T) int32: [clearing, ray_valid]
    clearing = flags[0] != 0
    ray_valid = flags[1] != 0

    vec = point - origin
    dist_g = jnp.sqrt(jnp.sum(vec * vec, axis=0))              # (T,)
    unit = vec / jnp.maximum(dist_g, 1e-12)[None, :]

    clear_len = jnp.clip(dist_g - trunc, 0.0, max_ray)
    clear_end = origin + unit * clear_len[None, :]
    norm_end = point + unit * trunc
    end = jnp.where(clearing[None, :], clear_end, norm_end)
    if carving:
        start = origin
    else:
        band = point - unit * trunc
        start = jnp.where(clearing[None, :], clear_end, band)

    inv = f32(1.0 / voxel_size)
    start3 = start * inv
    end3 = end * inv
    eps = f32(1e-6)
    curr = jnp.floor(start3 + eps).astype(jnp.int32)           # (3, T)
    end_i = jnp.floor(end3 + eps).astype(jnp.int32)
    n_steps = jnp.sum(jnp.abs(end_i - curr), axis=0)           # (T,)

    ray = end3 - start3
    sign = jnp.sign(ray).astype(jnp.int32)
    corrected = jnp.maximum(sign, 0).astype(f32)
    safe_ray = jnp.where(ray == 0.0, 1.0, ray)
    t_next = jnp.where(ray == 0.0, jnp.inf,
                       (corrected - (start3 - curr.astype(f32))) / safe_ray)
    t_step = jnp.where(ray == 0.0, 0.0, sign.astype(f32) / safe_ray)

    if use_dropoff:
        dropoff_eps = f32(voxel_size)
        dropoff_scale = f32(1.0) / jnp.maximum(f32(trunc) - dropoff_eps,
                                               f32(1e-12))

    # Block-run compaction state: rays stay in one block for ~vps steps, so
    # hash insert/lookup downstream run at (run, ray) granularity — MAXR
    # bounds the block transitions (sum over axes of steps/vps).
    T = origin.shape[1]
    run_key_ref[:, :] = jnp.full((MAXR, T), -1, dtype=jnp.int32)
    run_rows = jax.lax.broadcasted_iota(jnp.int32, (MAXR, T), 0)

    def step(s, state):
        curr, t_next, pos, prev_key = state
        vx, vy, vz = curr[0], curr[1], curr[2]
        bx = jnp.floor_divide(vx, vps)
        by = jnp.floor_divide(vy, vps)
        bz = jnp.floor_divide(vz, vps)
        key = ((bx + ext) << 20) | ((by + ext) << 10) | (bz + ext)
        local = ((vx - bx * vps) * vps + (vy - by * vps)) * vps + (vz - bz * vps)
        in_b = ((bx >= -ext) & (bx < ext) & (by >= -ext) & (by < ext)
                & (bz >= -ext) & (bz < ext))
        valid = (s <= n_steps) & ray_valid & in_b

        # Projective sdf at the voxel center (voxblox computeDistance).
        num = ((vx.astype(f32) + 0.5) * voxel_size - origin[0]) * vec[0]
        num += ((vy.astype(f32) + 0.5) * voxel_size - origin[1]) * vec[1]
        num += ((vz.astype(f32) + 0.5) * voxel_size - origin[2]) * vec[2]
        sdf = dist_g - num / jnp.maximum(dist_g, 1e-12)

        if use_dropoff:
            scale = (trunc + sdf) * dropoff_scale
            w = jnp.where(sdf < -dropoff_eps,
                          jnp.maximum(weight * scale, 0.0), weight)
        else:
            w = weight
        w = jnp.where(valid, w, 0.0)
        w_sdf = w * jnp.clip(sdf, -trunc, trunc)
        wc = jnp.where(jnp.abs(sdf) < trunc, w, 0.0)

        key_ref[s, :] = jnp.where(valid, key, -1)
        local_ref[s, :] = local
        w_ref[s, :] = w
        wsdf_ref[s, :] = w_sdf
        wc_ref[s, :] = wc
        valid_ref[s, :] = valid.astype(jnp.int32)

        # Run bookkeeping: bump the run counter on block change, record the
        # block key at the new run slot (one-hot accumulate across MAXR rows).
        # A ray's valid steps form one contiguous segment (prefix length x
        # single in-bounds interval), so tracking transitions only on valid
        # steps is exact.
        changed = (key != prev_key) & valid
        pos = jnp.minimum(pos + changed.astype(jnp.int32), MAXR - 1)
        upd = (run_rows == pos[None, :]) & changed[None, :]
        run_key_ref[:, :] = jnp.where(upd, key[None, :], run_key_ref[:, :])
        run_idx_ref[s, :] = pos
        prev_key = jnp.where(valid, key, prev_key)

        # Advance DDA: axis of min crossing time (first-min tie break).
        min01 = jnp.minimum(t_next[0], t_next[1])
        a = jnp.where(t_next[1] < t_next[0], 1, 0)
        axis = jnp.where(t_next[2] < min01, 2, a)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, t_next.shape, 0)
                  == axis[None, :])
        curr = curr + jnp.where(onehot, sign, 0)
        t_next = t_next + jnp.where(onehot, t_step, 0.0)
        return curr, t_next, pos, prev_key

    jax.lax.fori_loop(0, S, step, (
        curr, t_next, jnp.full((origin.shape[1],), -1, dtype=jnp.int32),
        jnp.full((origin.shape[1],), -2, dtype=jnp.int32)))


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def dda_update_stream(cfg: FusionConfig, origin3: jnp.ndarray,
                      points3: jnp.ndarray, weights: jnp.ndarray,
                      is_clearing: jnp.ndarray, ray_valid: jnp.ndarray,
                      interpret: bool = False):
    """Expand rays into the per-(step, ray) update stream.

    Args:
      origin3 / points3: (3, R) float32 world-frame.
      weights: (R,) float32; is_clearing / ray_valid: (R,) bool.
    Returns (key, local, w, wsdf, wc_gate, valid) each (S, R); key == -1 where
    invalid.
    """
    g, t = cfg.grid, cfg.tsdf
    S = cfg.resolved_max_steps()
    MAXR = max_runs(cfg)
    R = points3.shape[1]
    tile = TILE if R % TILE == 0 else R  # small-R fallback (tests)
    flags = jnp.stack([is_clearing.astype(jnp.int32),
                       ray_valid.astype(jnp.int32)])

    kernel = functools.partial(
        _dda_kernel, S=S, MAXR=MAXR, voxel_size=g.voxel_size,
        trunc=t.truncation_distance, max_ray=t.max_ray_length_m,
        carving=t.voxel_carving_enabled, vps=g.voxels_per_side,
        ext=g.world_extent_blocks, use_dropoff=t.use_weight_dropoff)

    grid_spec = pl.GridSpec(
        grid=(R // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            [pl.BlockSpec((S, tile), lambda i: (0, i),
                          memory_space=pltpu.VMEM) for _ in range(6)]
            + [pl.BlockSpec((MAXR, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM),
               pl.BlockSpec((S, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)]
        ),
    )
    shapes = ([jax.ShapeDtypeStruct((S, R), jnp.int32)] * 2
              + [jax.ShapeDtypeStruct((S, R), jnp.float32)] * 3
              + [jax.ShapeDtypeStruct((S, R), jnp.int32),
                 jax.ShapeDtypeStruct((MAXR, R), jnp.int32),
                 jax.ShapeDtypeStruct((S, R), jnp.int32)])
    key, local, w, wsdf, wc, valid, run_key, run_idx = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=shapes, interpret=interpret,
    )(origin3, points3, weights[None, :], flags)
    return key, local, w, wsdf, wc, valid.astype(bool), run_key, run_idx


def max_runs(cfg: FusionConfig) -> int:
    """Upper bound on block transitions per ray: each axis crosses a block
    boundary at most steps_axis/vps + 1 times; summed <= S/vps + 3, plus the
    initial run."""
    return cfg.resolved_max_steps() // cfg.grid.voxels_per_side + 5


# ---------------------------------------------------------------------------
# Blockwise read-modify-write accumulation (projective integrator apply).
# ---------------------------------------------------------------------------

def _rmw_kernel(slots_ref, d_w, d_wsdf, d_cnt, d_sem, d_wc,
                in_w, in_wsdf, in_cnt, in_sem, in_wc,
                out_w, out_wsdf, out_cnt, out_sem, out_wc):
    out_w[:] = in_w[:] + d_w[:]
    out_wsdf[:] = in_wsdf[:] + d_wsdf[:]
    out_cnt[:] = in_cnt[:] + d_cnt[:]
    # grid blocks are (L, 1, VS, 128) / (3, 1, VS, 128); deltas (1, L, VS, 128).
    out_sem[:, 0] = in_sem[:, 0] + d_sem[0]
    out_wc[:, 0] = in_wc[:, 0] + d_wc[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_rmw_add(wsum, wsdf, sem_count, sem_delta, wcolor, slots,
                  d_w, d_wsdf, d_cnt, d_sem, d_wc, interpret=False):
    """grid_channel[slots[k]] += delta[k] for K touched blocks, in place.

    XLA's scatter walks indices serially (~3-14 us per row at these payload
    sizes — scripts/profile_projective_core2.py); here each grid step is one
    block-row DMA in + add + DMA out, pipelined by Pallas, with the channels
    aliased input->output so untouched rows are never copied. `slots` must
    place padding (trash-row) entries consecutively (the frame block list is
    compacted: real slots first, then padding) — Pallas coalesces consecutive
    equal block indices into a single fetch/writeback.

    Layouts: wsum/wsdf/sem_count (B+1, V3); sem_delta (L, B+1, V3);
    wcolor (3, B+1, V3); deltas (K, V3) / (K, L, V3) / (K, 3, V3).
    V3 must be a multiple of 128 (Mosaic (8, 128) block-tiling rule — the
    voxel axis is reshaped to trailing (V3/128, 128) dims, a free bitcast).
    """
    K, V3 = d_w.shape
    L = d_sem.shape[1]
    if V3 % 128:
        raise ValueError(f"block_rmw_add needs vps^3 % 128 == 0, got {V3}")
    VS = V3 // 128
    shp = wsum.shape
    B1 = shp[0]
    r2 = lambda x: x.reshape(x.shape[:-1] + (VS, 128))
    wsum, wsdf, sem_count, sem_delta, wcolor, d_w, d_wsdf, d_cnt, d_sem, \
        d_wc = map(r2, (wsum, wsdf, sem_count, sem_delta, wcolor, d_w,
                        d_wsdf, d_cnt, d_sem, d_wc))

    def by_slot(i, slots):
        return (slots[i], 0, 0)

    def by_slot_mid(i, slots):
        return (0, slots[i], 0, 0)

    def by_i(i, slots):
        return (i, 0, 0)

    def by_i4(i, slots):
        return (i, 0, 0, 0)

    chan_spec = lambda: pl.BlockSpec((1, VS, 128), by_slot)
    sem_spec = lambda: pl.BlockSpec((L, 1, VS, 128), by_slot_mid)
    col_spec = lambda: pl.BlockSpec((3, 1, VS, 128), by_slot_mid)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, VS, 128), by_i), pl.BlockSpec((1, VS, 128), by_i),
            pl.BlockSpec((1, VS, 128), by_i),
            pl.BlockSpec((1, L, VS, 128), by_i4),
            pl.BlockSpec((1, 3, VS, 128), by_i4),
            chan_spec(), chan_spec(), chan_spec(), sem_spec(), col_spec(),
        ],
        out_specs=[chan_spec(), chan_spec(), chan_spec(), sem_spec(),
                   col_spec()],
    )
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)
                  for x in (wsum, wsdf, sem_count, sem_delta, wcolor)]
    # Aliases index the pallas_call operands (scalar-prefetch arg included):
    # operands are (slots, 5 deltas, 5 grid channels) -> channels at 6..10.
    outs = pl.pallas_call(
        _rmw_kernel, grid_spec=grid_spec, out_shape=out_shapes,
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3, 10: 4},
        interpret=interpret,
    )(slots, d_w, d_wsdf, d_cnt, d_sem, d_wc,
      wsum, wsdf, sem_count, sem_delta, wcolor)
    return tuple(x.reshape(x.shape[:-2] + (V3,)) for x in outs)
