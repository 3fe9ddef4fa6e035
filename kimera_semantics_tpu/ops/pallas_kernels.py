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


def _dda_kernel(origin_ref, point_ref, start_ref, end_ref, weight_ref,
                flags_ref,
                key_ref, local_ref, w_ref, wsdf_ref, wc_ref, valid_ref,
                run_key_ref, run_idx_ref,
                *, S, MAXR, voxel_size, trunc, vps, ext, use_dropoff):
    f32 = jnp.float32
    origin = origin_ref[:]        # (3, T)
    point = point_ref[:]          # (3, T) sdf anchor (surface sample)
    weight = weight_ref[0, :]     # (T,)
    ray_valid = flags_ref[0, :] != 0

    vec = point - origin
    dist_g = jnp.sqrt(jnp.sum(vec * vec, axis=0))              # (T,)

    inv = f32(1.0 / voxel_size)
    start3 = start_ref[:] * inv
    end3 = end_ref[:] * inv
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

        # NB: mirrors ops/tsdf.py update_terms (weight dropoff, sdf clamp,
        # color gate) with the division pre-hoisted to a reciprocal — keep
        # the two in sync (tests/test_pallas.py enforces bit-parity with
        # the XLA path built on update_terms).
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


@functools.partial(jax.jit, static_argnames=("cfg", "S", "interpret"))
def dda_job_stream(cfg: FusionConfig, S: int, origin3: jnp.ndarray,
                   point3: jnp.ndarray, start3: jnp.ndarray,
                   end3: jnp.ndarray, weights: jnp.ndarray,
                   job_valid: jnp.ndarray, interpret: bool = False):
    """Expand traversal jobs into the per-(step, job) update stream.

    Args:
      origin3 / point3 / start3 / end3: (3, R) float32 world-frame — sdf
        anchor pair (origin, point) and traversal extent (start, end)
        (ops/carve.py JobBatch semantics).
      weights: (R,) float32; job_valid: (R,) bool. S: static step budget.
    Returns (key, local, w, wsdf, wc_gate, valid, run_key, run_idx):
    key/local/w/wsdf/wc_gate/valid are (S, R) step-level planes (key == -1
    where invalid); run_key/run_idx are (MAXR, R) block-run compaction
    streams (run_key == -1 for unused run rows; run_idx maps each run to
    its first step) consumed by the run-compacted hash ops in
    ops/integrate.py.
    """
    g, t = cfg.grid, cfg.tsdf
    MAXR = max_runs(cfg, S)
    R = point3.shape[1]
    tile = TILE if R % TILE == 0 else R  # small-R fallback (tests)
    flags = job_valid.astype(jnp.int32)[None, :]

    kernel = functools.partial(
        _dda_kernel, S=S, MAXR=MAXR, voxel_size=g.voxel_size,
        trunc=t.truncation_distance, vps=g.voxels_per_side,
        ext=g.world_extent_blocks, use_dropoff=t.use_weight_dropoff)

    grid_spec = pl.GridSpec(
        grid=(R // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
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
    )(origin3, point3, start3, end3, weights[None, :], flags)
    return key, local, w, wsdf, wc, valid.astype(bool), run_key, run_idx


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def dda_update_stream(cfg: FusionConfig, origin3: jnp.ndarray,
                      points3: jnp.ndarray, weights: jnp.ndarray,
                      is_clearing: jnp.ndarray, ray_valid: jnp.ndarray,
                      interpret: bool = False):
    """Voxblox-extent ray expansion (round-1 entry): computes per-ray
    start/end (raycast.py setup_rays semantics, world units) and defers to
    dda_job_stream with the full-traversal step budget."""
    t = cfg.tsdf
    S = cfg.resolved_max_steps()
    vec = points3 - origin3
    dist_g = jnp.sqrt(jnp.sum(vec * vec, axis=0))
    unit = vec / jnp.maximum(dist_g, 1e-12)[None, :]
    clear_len = jnp.clip(dist_g - t.truncation_distance, 0.0,
                         t.max_ray_length_m)
    clear_end = origin3 + unit * clear_len[None, :]
    norm_end = points3 + unit * t.truncation_distance
    end = jnp.where(is_clearing[None, :], clear_end, norm_end)
    if t.voxel_carving_enabled:
        start = origin3
    else:
        band = points3 - unit * t.truncation_distance
        start = jnp.where(is_clearing[None, :], clear_end, band)
    return dda_job_stream(cfg, S, origin3, points3, start, end, weights,
                          ray_valid, interpret=interpret)


def max_runs(cfg: FusionConfig, S: int | None = None) -> int:
    """Upper bound on block transitions per job: each axis crosses a block
    boundary at most steps_axis/vps + 1 times; summed <= S/vps + 3, plus the
    initial run."""
    if S is None:
        S = cfg.resolved_max_steps()
    return S // cfg.grid.voxels_per_side + 5


# ---------------------------------------------------------------------------
# Cube-LUT slot resolution: block-hash lookup without serial gathers.
#
# XLA lowers hash-table probing (grid/hash.py lookup) to serial per-index
# gathers (~11-14 ns each); at run-stream sizes (300-500k) that is 12-18 ms
# per frame — the single largest stage after the segment sorts (measured,
# scripts/profile_fast_r2.py). But every update of a frame lies within
# max_ray + trunc of the camera, i.e. inside a static (2E+1)^3 cube of
# blocks around the camera block. This kernel resolves slots against a
# VMEM-resident dense cube LUT (built once per frame from ~5k hash probes)
# with a vectorized masked lane-reduction — no serial memory ops — and
# fuses the whole segment-reduce input preparation (flat voxel key, label
# packing, validity masking, trunc offset) behind it.
# ---------------------------------------------------------------------------


def _block_meta_kernel(tcg_ref, coords_ref, real_ref, meta_ref, *,
                       intr, plan, block_size):
    """Per-block mip level + aligned patch origins, fully vectorized.

    The XLA form (ops/projective.py block_patch_meta) is ~30 small ops over
    (K, 8, 3) arrays — ~0.7 ms/frame of pure op-count overhead in the
    flagship chain (r3 attribution). Here the whole computation is one grid
    step of (1, K) vector math: 8 statically-unrolled corner projections,
    comparison-ladder level selection (bit-identical to the XLA form — both
    use exact power-of-two compares), and static where-chains in place of
    vector-by-vector shifts. Output (8, K) int32 rows
    [v0, u0_atlas, real, lvl, u0_level, bx, by, bz] — transposed by the
    wrapper into the sampler's (K, 8) scalar-prefetch meta.
    """
    f32 = jnp.float32
    FL = plan.full_level
    T = tcg_ref[:]                                      # (1, 128) f32

    def tc(j):
        return T[:, j:j + 1]

    bx = coords_ref[0:1, :]
    by = coords_ref[1:2, :]
    bz = coords_ref[2:3, :]
    bs = f32(block_size)
    big = f32(1e9)
    zeps = f32(1e-3)
    umin = jnp.full(bx.shape, big, f32)
    vmin = jnp.full(bx.shape, big, f32)
    umax = jnp.full(bx.shape, -big, f32)
    vmax = jnp.full(bx.shape, -big, f32)
    n_front = jnp.zeros(bx.shape, jnp.int32)
    for c in range(8):
        ox, oy, oz = (c >> 2) & 1, (c >> 1) & 1, c & 1
        x = (bx + ox).astype(f32) * bs
        y = (by + oy).astype(f32) * bs
        z = (bz + oz).astype(f32) * bs
        pX = tc(0) * x + tc(1) * y + tc(2) * z + tc(3)
        pY = tc(4) * x + tc(5) * y + tc(6) * z + tc(7)
        pZ = tc(8) * x + tc(9) * y + tc(10) * z + tc(11)
        zsafe = jnp.maximum(pZ, zeps)
        u = f32(intr.fx) * pX / zsafe + f32(intr.cx)
        v = f32(intr.fy) * pY / zsafe + f32(intr.cy)
        front = pZ > zeps
        umin = jnp.minimum(umin, jnp.where(front, u, big))
        umax = jnp.maximum(umax, jnp.where(front, u, -big))
        vmin = jnp.minimum(vmin, jnp.where(front, v, big))
        vmax = jnp.maximum(vmax, jnp.where(front, v, -big))
        n_front = n_front + front.astype(jnp.int32)
    all_front = n_front == 8

    # Division, not reciprocal-multiply: must be bit-identical to the XLA
    # form at level boundaries (the parity test compares block-for-block).
    need = jnp.maximum((umax - umin) / f32(plan.col_threshold),
                       (vmax - vmin) / f32(plan.row_threshold))
    lvl = jnp.zeros(bx.shape, jnp.int32)
    for l in range(FL):
        lvl = lvl + (need > f32(1 << l)).astype(jnp.int32)
    bbox_ok = all_front & (need <= f32(1 << FL))
    lvl = jnp.where(bbox_ok, lvl, FL)

    # Static chains over the <= FL+1 levels (vector-by-vector shifts and
    # gathered level offsets are both awkward in Mosaic).
    off_l = jnp.zeros(bx.shape, jnp.int32)
    vmin_i = jnp.floor(vmin).astype(jnp.int32)
    umin_i = jnp.floor(umin).astype(jnp.int32)
    vmin_l = jnp.zeros(bx.shape, jnp.int32)
    umin_l = jnp.zeros(bx.shape, jnp.int32)
    for l in range(FL + 1):
        sel = lvl == l
        off_l = jnp.where(sel, jnp.int32(plan.offsets[l]), off_l)
        vmin_l = jnp.where(sel, jnp.right_shift(vmin_i, l) - 1, vmin_l)
        umin_l = jnp.where(sel, jnp.right_shift(umin_i, l) - 1, umin_l)
    vmin_l = jnp.where(bbox_ok, vmin_l, 0)
    umin_l = jnp.where(bbox_ok, umin_l, 0)
    v0 = jnp.clip(jnp.floor_divide(vmin_l, 8) * 8, 0,
                  plan.atlas_height - plan.row_window)
    u0a = jnp.clip(jnp.floor_divide(off_l + umin_l, 128) * 128, 0,
                   plan.atlas_width - plan.col_window)

    meta_ref[0:1, :] = v0
    meta_ref[1:2, :] = u0a
    meta_ref[2:3, :] = real_ref[:]
    meta_ref[3:4, :] = lvl
    meta_ref[4:5, :] = u0a - off_l
    meta_ref[5:6, :] = bx
    meta_ref[6:7, :] = by
    meta_ref[7:8, :] = bz


@functools.partial(jax.jit, static_argnames=("intr", "plan", "block_size",
                                             "interpret"))
def block_meta(fcoords, freal, T_C_G_flat, intr, plan, block_size,
               interpret=False):
    """Pallas form of ops/projective.py block_patch_meta + the meta stack:
    returns the (K, 8) int32 scalar-prefetch meta for
    projective_sample_update. Bit-identical level/origin selection to the
    XLA form (tests/test_projective.py pins it)."""
    K = fcoords.shape[0]
    assert K % 128 == 0, "meta kernel lanes must tile by 128"
    coords_T = fcoords.T                                 # (3, K)
    real = freal.astype(jnp.int32)[None, :]
    kernel = functools.partial(_block_meta_kernel, intr=intr, plan=plan,
                               block_size=block_size)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, K), jnp.int32),
        interpret=interpret,
    )(T_C_G_flat, coords_T, real)
    return out.T


def cube_geometry(cfg: FusionConfig):
    """Static cube extent: blocks within max_ray + trunc (+1 slack) of the
    camera block. Returns (E, side, padded lane count)."""
    import math
    reach = cfg.tsdf.max_ray_length_m + cfg.tsdf.truncation_distance
    E = int(math.ceil(reach / cfg.grid.block_size)) + 1
    side = 2 * E + 1
    pad = ((side ** 3 + 127) // 128) * 128
    return E, side, pad


def cube_lut_supported(cfg: FusionConfig) -> bool:
    """The lane-reduction costs O(stream * side^3) compares and the LUT row
    chunk must fit VMEM — small cubes only (plenty for the canonical
    configs: side 17 at 0.8 m blocks, 11 at 1.6 m)."""
    _, _, pad = cube_geometry(cfg)
    return pad <= 8192


def _slot_kernel(params_s, cube_ref, runk_ref, runidx_ref, local_ref,
                 w_ref, wsdf_ref, wc_ref, valid_ref, lab_ref,
                 k2_ref, key_ref, w_out, wsdf_out, cnt_out, vout, runslot_ref,
                 slot_scr,
                 *, MAXR, side, E, ext, v3, cap, lab_shift, trunc,
                 gate_near, pad, trash, tiles_per_frame, two_level):
    f32 = jnp.float32
    # Batched streams concatenate B frames along the ray axis in equal
    # chunks, so each ray tile belongs to exactly one frame — its cube was
    # selected by the BlockSpec index map; the camera block comes from the
    # frame's row of the scalar-prefetch params.
    fb = (pl.program_id(0) // tiles_per_frame) * 8
    cbx, cby, cbz = params_s[fb + 0], params_s[fb + 1], params_s[fb + 2]
    rk = runk_ref[:]                                   # (MAXR, T)
    bx = ((rk >> 20) & 0x3FF) - ext - cbx + E
    by = ((rk >> 10) & 0x3FF) - ext - cby + E
    bz = (rk & 0x3FF) - ext - cbz + E
    in_c = ((rk >= 0) & (bx >= 0) & (bx < side) & (by >= 0) & (by < side)
            & (bz >= 0) & (bz < side))
    cidx = jnp.where(in_c, (bx * side + by) * side + bz, -1)

    T = rk.shape[1]
    if two_level:
        # Two-level MXU gather (round-3 tail plan): cell index = row * 128 +
        # lane over the TRANSPOSED cube (128, RSUB). Row selection is a
        # one-hot MXU contraction (exactly one active term per output, so
        # any precision is exact given the bf16 hi/lo value split — slots
        # < 2^17 split exactly); lane selection is a masked cross-sublane
        # reduce. ~30x fewer VPU ops than the flat (T, pad) lane reduction
        # (which costs O(T * side^3) compares per run row).
        cube_t = cube_ref[0]                            # (128, RSUB) f32
        RSUB = cube_t.shape[1]
        chi = cube_t.astype(jnp.bfloat16)
        clo = (cube_t - chi.astype(f32)).astype(jnp.bfloat16)
        riota = jax.lax.broadcasted_iota(jnp.int32, (RSUB, T), 0)
        siota = jax.lax.broadcasted_iota(jnp.int32, (128, T), 0)
        dn = (((1,), (0,)), ((), ()))
        for m in range(MAXR):
            hi = cidx[m] >> 7                           # (T,) -1 stays -1
            lo = cidx[m] & 127
            oh = (riota == hi[None, :]).astype(jnp.bfloat16)   # (RSUB, T)
            picked = jax.lax.dot_general(
                chi, oh, dimension_numbers=dn,
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=f32)
            picked = picked + jax.lax.dot_general(
                clo, oh, dimension_numbers=dn,
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=f32)             # (128, T)
            sl = jnp.max(jnp.where(siota == lo[None, :], picked, f32(-2.0)),
                         axis=0)                        # (T,)
            sl = jnp.where(cidx[m] >= 0, sl, f32(-1.0))
            slot_scr[m, :] = sl.astype(jnp.int32)
    else:
        cube = cube_ref[0]                              # (1, pad) f32
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, pad), 1)
        for m in range(MAXR):
            # Masked lane-reduction gather: exactly one lane matches (or
            # none).
            match = iota == cidx[m][:, None]
            sl = jnp.max(jnp.where(match, jnp.broadcast_to(cube, (T, pad)),
                                   f32(-1.0)), axis=1)  # (T,)
            slot_scr[m, :] = sl.astype(jnp.int32)

    # Broadcast run slots to steps (at most one run row matches per step).
    ridx = runidx_ref[:]                                # (S, T)
    slot = jnp.full(ridx.shape, -1, dtype=jnp.int32)
    for m in range(MAXR):
        slot = slot + jnp.where(ridx == m, slot_scr[m:m + 1, :] + 1, 0)

    v = (valid_ref[:] > 0) & (slot >= 0) & (slot < cap)
    key = slot * v3 + local_ref[:]
    lab = lab_ref[0, :]
    w = w_ref[:]
    k2_ref[:] = jnp.where(v, (key << lab_shift) | lab[None, :], trash)
    key_ref[:] = key
    w_out[:] = jnp.where(v, w, 0.0)
    wsdf_out[:] = jnp.where(v, wsdf_ref[:] + f32(trunc) * w, 0.0)
    sem_gate = v & (wc_ref[:] > 0.0) if gate_near else v
    inform = lab_ref[1, :] > 0
    cnt_ref_val = jnp.where(sem_gate & inform[None, :], 1.0, 0.0)
    cnt_out[:] = cnt_ref_val
    vout[:] = v.astype(jnp.int32)
    runslot_ref[:] = slot_scr[:]


@functools.partial(jax.jit, static_argnames=("cfg", "lab_shift", "gate_near",
                                             "interpret"))
def slot_resolve_stream(cfg: FusionConfig, cube_vals, cam_block,
                        run_key, run_idx, local, w, wsdf, wc, step_valid,
                        labels, informative, lab_shift: int,
                        gate_near: bool, interpret: bool = False):
    """Resolve block slots for one expanded stream via the frame cube LUT and
    emit segment-reduce inputs.

    Args:
      cube_vals: (B, pad) f32 — slot per cube cell (-1 missing/unowned),
        from ops/integrate.py frame_cube; B > 1 for batched streams whose
        ray axis concatenates B frames in equal chunks (each chunk a
        multiple of the ray tile — integrate_jobs checks).
      cam_block: (B, 3) or (3,) int32 camera block coords per frame.
      run_key/run_idx: (MAXR, R)/(S, R) from dda_job_stream.
      local/w/wsdf/wc: (S, R) stream planes; step_valid (S, R) bool.
      labels: (R,) int32; informative: (R,) bool.
    Returns (k2, w_m, wsdf_off, cnt, key, valid_upd, run_slots):
      k2 (S, R) int32 combined (voxel << lab_shift | label) key (TRASH where
      invalid); w_m/wsdf_off/cnt masked value channels (wsdf offset by
      +trunc*w — ops/integrate.py contract); key (S, R) raw flat voxel key;
      valid_upd (S, R) bool; run_slots (MAXR, R) int32 (-1 invalid).
    """
    import numpy as np
    g, t = cfg.grid, cfg.tsdf
    E, side, pad = cube_geometry(cfg)
    S, R = local.shape
    MAXR = run_key.shape[0]
    if cam_block.ndim == 1:
        cam_block = cam_block[None, :]
    B = cube_vals.shape[0]
    assert R % B == 0, (R, B)
    per_frame = R // B
    tile = TILE if per_frame % TILE == 0 else per_frame
    tiles_per_frame = per_frame // tile
    params = jnp.concatenate(
        [cam_block.astype(jnp.int32),
         jnp.zeros((B, 5), jnp.int32)], axis=1).reshape(-1)
    labs2 = jnp.stack([labels.astype(jnp.int32),
                       informative.astype(jnp.int32)])

    # Two-level MXU gather needs the bf16 hi/lo value split to be exact
    # (slots < 2^17) and the transposed cube's sublane rows to fit one
    # 128-row tile. Falls back to the flat lane reduction otherwise.
    two_level = (g.block_capacity + 1 < (1 << 17)) and pad <= 128 * 128
    if two_level:
        rsub = max(8, ((pad + 127) // 128 + 7) // 8 * 8)  # sublane-tile mult
        # cube_t[b, l, r] = cube[b, r*128 + l] (pad to rsub full rows).
        cube_in = jnp.transpose(
            jnp.pad(cube_vals, ((0, 0), (0, rsub * 128 - pad)),
                    constant_values=-1.0).reshape(B, rsub, 128), (0, 2, 1))
        cube_spec = pl.BlockSpec((1, 128, rsub),
                                 lambda i, m: (i // tiles_per_frame, 0, 0))
    else:
        cube_in = cube_vals[:, None, :]
        # cube: (B, 1, pad) — the (1, pad) trailing shape matches the array
        # dims exactly (Mosaic full-dim rule)
        cube_spec = pl.BlockSpec((1, 1, pad),
                                 lambda i, m: (i // tiles_per_frame, 0, 0))

    kernel = functools.partial(
        _slot_kernel, MAXR=MAXR, side=side, E=E, ext=g.world_extent_blocks,
        v3=g.vps3, cap=g.block_capacity, lab_shift=lab_shift,
        trunc=t.truncation_distance, gate_near=gate_near, pad=pad,
        trash=np.int32(0x7FFFFFFF), tiles_per_frame=tiles_per_frame,
        two_level=two_level)

    bs = lambda s: pl.BlockSpec((s, tile), lambda i, m: (0, i))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // tile,),
        in_specs=[cube_spec,
                  bs(MAXR), bs(S), bs(S),                     # runk/idx/local
                  bs(S), bs(S), bs(S), bs(S),                 # w/wsdf/wc/valid
                  bs(2)],                                     # labels/inform
        out_specs=[bs(S), bs(S), bs(S), bs(S), bs(S), bs(S), bs(MAXR)],
        scratch_shapes=[pltpu.VMEM((MAXR, tile), jnp.int32)],
    )
    out_shapes = [jax.ShapeDtypeStruct((S, R), jnp.int32),
                  jax.ShapeDtypeStruct((S, R), jnp.int32),
                  jax.ShapeDtypeStruct((S, R), jnp.float32),
                  jax.ShapeDtypeStruct((S, R), jnp.float32),
                  jax.ShapeDtypeStruct((S, R), jnp.float32),
                  jax.ShapeDtypeStruct((S, R), jnp.int32),
                  jax.ShapeDtypeStruct((MAXR, R), jnp.int32)]
    k2, key, w_m, wsdf_off, cnt, vu, run_slots = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(params, cube_in, run_key, run_idx, local, w, wsdf, wc,
      step_valid.astype(jnp.int32), labs2)
    return k2, w_m, wsdf_off, cnt, key, vu.astype(bool), run_slots


# ---------------------------------------------------------------------------
# Fused projective sample + update-term kernel (models/projective.py).
# ---------------------------------------------------------------------------

import os as _os
# Blocks per sampler grid step (full sublane tiles for the voxel math).
# The apply stage is per-step-overhead-bound (docs/DESIGN.md r3 roofline);
# env override for A/B measurement.
PROJ_BPS = int(_os.environ.get("KSD_PROJ_BPS", "8"))


def _proj_kernel(meta_s, tcg_ref, metav_ref, atlas_d, atlas_l, atlas_rg,
                 atlas_b, w_ref, wsdf_ref, cnt_ref, lab_ref, wc_ref,
                 samp, e_scratch, rc_scratch, *, cfg, intr, plan,
                 with_color, region="all"):
    """Per grid step: PROJ_BPS touched blocks.

    Vector phase ((BPS, V3) planes, voxels on lanes): voxel centers ->
    camera -> projected mip coords. Per-block phase: patch slice from the
    VMEM-resident atlas (offsets 8/128-aligned by block_patch_meta), one-hot
    MXU contraction per channel. Epilogue: the exact ops/projective.py
    update math (shared code), outputs written as (BPS, V3) blocks.

    samp scratch rows: [0..BPS) depth, [BPS..2BPS) label (+ rg, b when
    with_color).

    Tiles with no real rows (the frame list's trash tail and any in-group
    padding-only tile) skip the whole body: their outputs stay garbage,
    which is safe because the RMW apply kernel never reads delta tiles whose
    group is trash, and the XLA fallback path does not use this kernel.
    """
    i = pl.program_id(0)
    tile_real = meta_s[i * PROJ_BPS, 2]
    for _b in range(1, PROJ_BPS):
        tile_real = tile_real | meta_s[i * PROJ_BPS + _b, 2]

    @pl.when(tile_real > 0)
    def _tile_body():
        _proj_tile(meta_s, tcg_ref, metav_ref, atlas_d, atlas_l, atlas_rg,
                   atlas_b, w_ref, wsdf_ref, cnt_ref, lab_ref, wc_ref,
                   samp, e_scratch, rc_scratch, i=i, cfg=cfg, intr=intr,
                   plan=plan, with_color=with_color, region=region)


def _proj_tile(meta_s, tcg_ref, metav_ref, atlas_d, atlas_l, atlas_rg,
               atlas_b, w_ref, wsdf_ref, cnt_ref, lab_ref, wc_ref,
               samp, e_scratch, rc_scratch, *, i, cfg, intr, plan,
               with_color, region="all"):
    g = cfg.grid
    vps, V3 = g.voxels_per_side, g.vps3
    ROWS, COLS = plan.row_window, plan.col_window
    BPS = PROJ_BPS
    f32 = jnp.float32

    mv = metav_ref[:]                                   # (BPS, 8) int32
    real_v = mv[:, 2:3] > 0
    lvl = mv[:, 3:4]
    u0l = mv[:, 4:5]
    v0v = mv[:, 0:1]
    bx, by, bz = mv[:, 5:6], mv[:, 6:7], mv[:, 7:8]

    # Voxel centers (BPS, V3).
    lin = jax.lax.broadcasted_iota(jnp.int32, (BPS, V3), 1)
    lx = lin // (vps * vps)
    ly = (lin // vps) % vps
    lz = lin % vps
    vs = f32(g.voxel_size)
    cx = ((bx * vps + lx).astype(f32) + 0.5) * vs
    cy = ((by * vps + ly).astype(f32) + 0.5) * vs
    cz = ((bz * vps + lz).astype(f32) + 0.5) * vs

    T = tcg_ref[:]                                      # (1, 128) f32
    def tc(j):
        return T[:, j:j + 1]
    pX = tc(0) * cx + tc(1) * cy + tc(2) * cz + tc(3)
    pY = tc(4) * cx + tc(5) * cy + tc(6) * cz + tc(7)
    pZ = tc(8) * cx + tc(9) * cy + tc(10) * cz + tc(11)
    zok = pZ > 1e-3
    zsafe = jnp.maximum(pZ, 1e-3)
    u = f32(intr.fx) * pX / zsafe + f32(intr.cx)
    v = f32(intr.fy) * pY / zsafe + f32(intr.cy)
    ui = jnp.floor(u + 0.5).astype(jnp.int32)
    vi = jnp.floor(v + 0.5).astype(jnp.int32)
    in_img = (zok & (ui >= 0) & (ui < plan.width) & (vi >= 0)
              & (vi < plan.height))
    ul = jnp.right_shift(jnp.clip(ui, 0, plan.width - 1), lvl)
    vl = jnp.right_shift(jnp.clip(vi, 0, plan.height - 1), lvl)
    lvl_ok = ((ul < jnp.right_shift(jnp.full_like(lvl, plan.width), lvl))
              & (vl < jnp.right_shift(jnp.full_like(lvl, plan.height), lvl)))
    row = vl - v0v
    col = ul - u0l
    # Round-trip row/col through scratch: the one-hot compare feeding the MXU
    # must read from a plain VMEM buffer (a long traced producer chain gives
    # Mosaic a layout it rejects as a dot operand — "Bad lhs type").
    rc_scratch[0:BPS, :] = row
    rc_scratch[BPS:2 * BPS, :] = col

    riota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, V3), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (COLS, V3), 0)
    n_ch = 6 if with_color else 3

    for b in range(BPS):
        @pl.when(meta_s[i * BPS + b, 2] > 0)
        def _():
            v0b = pl.multiple_of(meta_s[i * BPS + b, 0], 8)
            u0b = pl.multiple_of(meta_s[i * BPS + b, 1], 128)
            pd = atlas_d[pl.ds(v0b, ROWS), pl.ds(u0b, COLS)]
            hi = pd.astype(jnp.bfloat16)
            lo = (pd - hi.astype(f32)).astype(jnp.bfloat16)
            chans = [hi, lo,
                     atlas_l[pl.ds(v0b, ROWS),
                             pl.ds(u0b, COLS)].astype(jnp.bfloat16)]
            if with_color:
                prg = atlas_rg[pl.ds(v0b, ROWS), pl.ds(u0b, COLS)]
                rg_hi = prg.astype(jnp.bfloat16)
                rg_lo = (prg - rg_hi.astype(f32)).astype(jnp.bfloat16)
                chans += [rg_hi, rg_lo,
                          atlas_b[pl.ds(v0b, ROWS),
                                  pl.ds(u0b, COLS)].astype(jnp.bfloat16)]
            Ct = (rc_scratch[BPS + b:BPS + b + 1, :] == ciota
                  ).astype(jnp.bfloat16)
            Rt = (rc_scratch[b:b + 1, :] == riota).astype(f32)
            acc = []
            for ch in chans:
                # precision must be pinned: the package default is HIGHEST
                # (f32 geometry), which Mosaic rejects for bf16 operands
                # ("Bad lhs type"); one-hot contractions are exact at any
                # precision (single active term per output).
                e_scratch[:] = jax.lax.dot_general(
                    ch, Ct, dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=f32)          # (ROWS, V3)
                acc.append(jnp.sum(e_scratch[:] * Rt, axis=0,
                                   keepdims=True))       # (1, V3)
            samp[b:b + 1, :] = acc[0] + acc[1]           # depth
            samp[BPS + b:BPS + b + 1, :] = acc[2]        # label
            if with_color:
                samp[2 * BPS + b:2 * BPS + b + 1, :] = acc[3] + acc[4]
                samp[3 * BPS + b:3 * BPS + b + 1, :] = acc[5]

    from . import projective as proj_ops
    from . import mip as mip_ops
    depth = samp[0:BPS, :]
    label = jnp.round(samp[BPS:2 * BPS, :]).astype(jnp.int32)
    w, w_sdf, cnt, upd, color_gate = proj_ops.update_terms_from_sample(
        depth, label, pX, pY, pZ, zsafe, in_img & lvl_ok, real_v, cfg,
        region=region)
    w_ref[:] = w
    wsdf_ref[:] = w_sdf
    cnt_ref[:] = cnt
    lab_ref[:] = jnp.where(upd, label, 0)
    if with_color:
        rg = samp[2 * BPS:3 * BPS, :]
        bb = samp[3 * BPS:4 * BPS, :]
        rgb3 = mip_ops.unpack_color(rg, bb)              # (BPS, V3, 3)
        wc = jnp.where(upd & color_gate, w, 0.0)
        for c in range(3):
            # rgb3 reads samp scratch rows that padding blocks never wrote
            # (their pl.when body is skipped): select, don't multiply —
            # 0 * garbage-NaN would poison the whole RMW'd tile group.
            wc_ref[:, c, :] = jnp.where(wc > 0.0, wc * rgb3[..., c], 0.0)
    else:
        wc_ref[:] = jnp.zeros_like(wc_ref)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "intr", "plan", "with_color",
                                    "interpret", "region"))
def projective_sample_update(meta, T_C_G_flat, atlas, cfg, intr, plan,
                             with_color=False, interpret=False,
                             region="all"):
    """Fused projective per-voxel stage for K touched blocks.

    Args:
      meta: (K, 8) int32 [v0, u0_atlas, real, lvl, u0_level, bx, by, bz];
        v0 multiple of 8, u0_atlas multiple of 128 (block_patch_meta).
      T_C_G_flat: (1, 128) f32, rows of T_C_G in the first 12 slots.
      atlas: (4, AH, AW) f32 mip atlas [depth, label, rg, b].
    Returns (d_w, d_wsdf, d_cnt (K, V3) f32, label (K, V3) int32,
             d_wc (K, 3, V3) f32 — zeros unless with_color).
    """
    K = meta.shape[0]
    V3 = cfg.grid.vps3
    BPS = PROJ_BPS
    assert K % BPS == 0, "block_budget must be a multiple of PROJ_BPS"
    ROWS = plan.row_window

    kernel = functools.partial(_proj_kernel, cfg=cfg, intr=intr, plan=plan,
                               with_color=with_color, region=region)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    bykv = lambda: pl.BlockSpec((BPS, V3), lambda i, m: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // BPS,),
        in_specs=[full(),                                  # T_C_G
                  pl.BlockSpec((BPS, 8), lambda i, m: (i, 0)),   # metav
                  full(), full(), full(), full()],         # atlas channels
        out_specs=[bykv(), bykv(), bykv(), bykv(),
                   pl.BlockSpec((BPS, 3, V3), lambda i, m: (i, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM(((4 if with_color else 2) * BPS, V3), jnp.float32),
            pltpu.VMEM((ROWS, V3), jnp.float32),
            pltpu.VMEM((2 * BPS, V3), jnp.int32),
        ],
    )
    out_shapes = [jax.ShapeDtypeStruct((K, V3), jnp.float32),
                  jax.ShapeDtypeStruct((K, V3), jnp.float32),
                  jax.ShapeDtypeStruct((K, V3), jnp.float32),
                  jax.ShapeDtypeStruct((K, V3), jnp.int32),
                  jax.ShapeDtypeStruct((K, 3, V3), jnp.float32)]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(meta, T_C_G_flat, meta, atlas[0], atlas[1], atlas[2], atlas[3])


def _proj_fused_kernel(groups_ref, meta_s, tcg_ref, metav_ref, atlas_d,
                       atlas_l, atlas_rg, atlas_b,
                       in_w, in_wsdf, in_cnt, in_sem, in_wc,
                       out_w, out_wsdf, out_cnt, out_sem, out_wc,
                       w_s, wsdf_s, cnt_s, lab_s, wc_s,
                       samp, e_scratch, rc_scratch,
                       *, cfg, intr, plan, with_color, region, lk_delta,
                       num_labels, trash_group):
    """Fused sample + aliased RMW: one grid step per touched 8-block tile
    group. The sample phase is exactly _proj_tile (writing VMEM scratch
    instead of HBM delta arrays); the apply phase is the rmw kernel's
    aligned add. Kills the five (K, V3) delta arrays' HBM round trip and
    the second kernel launch (r4 flagship item)."""
    i = pl.program_id(0)

    @pl.when(groups_ref[i] != trash_group)
    def _body():
        _proj_tile(meta_s, tcg_ref, metav_ref, atlas_d, atlas_l, atlas_rg,
                   atlas_b, w_s, wsdf_s, cnt_s, lab_s, wc_s,
                   samp, e_scratch, rc_scratch, i=i, cfg=cfg, intr=intr,
                   plan=plan, with_color=with_color, region=region)
        out_w[:] = in_w[:] + w_s[:]
        out_wsdf[:] = in_wsdf[:] + wsdf_s[:]
        cnt = cnt_s[:]
        out_cnt[:] = in_cnt[:] + cnt
        labiota = jax.lax.broadcasted_iota(jnp.int32, (num_labels, 1, 1), 0)
        out_sem[:] = in_sem[:] + jnp.where(labiota == lab_s[:][None],
                                           cnt[None] * lk_delta, 0.0)
        if with_color:
            for c in range(3):
                out_wc[c, :, :] = in_wc[c, :, :] + wc_s[:, c, :]
        else:
            out_wc[:] = in_wc[:]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "intr", "plan", "with_color",
                                    "interpret", "region", "lk_delta"))
def projective_apply_fused(wsum, wsdf, sem_count, sem_delta, wcolor, slots,
                           meta, T_C_G_flat, atlas, cfg, intr, plan,
                           lk_delta, with_color=False, interpret=False,
                           region="all"):
    """grid_channel[slots] += sample(meta, atlas) in ONE aliased kernel.

    Drop-in replacement for projective_sample_update + block_rmw_add when
    V3 <= 8192 (no lane split) and PROJ_BPS == 8 (tile == row group).
    `slots` is the group-aligned frame list (grid/hash.py
    insert_frame_list); trash tiles skip the body and land in the grid's
    trash tile group, exactly the rmw kernel's contract."""
    K = meta.shape[0]
    V3 = cfg.grid.vps3
    L = sem_delta.shape[0]
    ROWS = plan.row_window
    assert PROJ_BPS == 8 and K % 8 == 0 and V3 <= 8192
    groups = slots[::8] // 8
    trash_group = (wsum.shape[0] - 8) // 8

    kernel = functools.partial(
        _proj_fused_kernel, cfg=cfg, intr=intr, plan=plan,
        with_color=with_color, region=region, lk_delta=lk_delta,
        num_labels=L, trash_group=trash_group)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    by_group = pl.BlockSpec((8, V3), lambda i, g, m: (g[i], 0))
    by_group3 = lambda C: pl.BlockSpec((C, 8, V3),
                                       lambda i, g, m: (0, g[i], 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K // 8,),
        in_specs=[full(),                                   # T_C_G
                  pl.BlockSpec((8, 8), lambda i, g, m: (i, 0)),   # metav
                  full(), full(), full(), full(),           # atlas channels
                  by_group, by_group, by_group,             # channels in
                  by_group3(L), by_group3(3)],
        out_specs=[by_group, by_group, by_group,
                   by_group3(L), by_group3(3)],
        scratch_shapes=[
            pltpu.VMEM((8, V3), jnp.float32),               # w
            pltpu.VMEM((8, V3), jnp.float32),               # wsdf
            pltpu.VMEM((8, V3), jnp.float32),               # cnt
            pltpu.VMEM((8, V3), jnp.int32),                 # lab
            pltpu.VMEM((8, 3, V3), jnp.float32),            # wc
            pltpu.VMEM(((4 if with_color else 2) * 8, V3), jnp.float32),
            pltpu.VMEM((ROWS, V3), jnp.float32),
            pltpu.VMEM((2 * 8, V3), jnp.int32),
        ],
    )
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)
                  for x in (wsum, wsdf, sem_count, sem_delta, wcolor)]
    # Operands: (groups, meta, tcg, metav, atlas x4, channels x5) — the
    # channels sit at operand indices 8..12.
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3, 12: 4},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(groups, meta, T_C_G_flat, meta, atlas[0], atlas[1], atlas[2], atlas[3],
      wsum, wsdf, sem_count, sem_delta, wcolor)


# ---------------------------------------------------------------------------
# Blockwise read-modify-write accumulation (projective integrator apply).
# ---------------------------------------------------------------------------

def _rmw_kernel(groups_ref, d_w, d_wsdf, d_cnt, d_labsem, d_wc,
                in_w, in_wsdf, in_cnt, in_sem, in_wc,
                out_w, out_wsdf, out_cnt, out_sem, out_wc,
                *, lk_delta, num_labels, trash_group, sem_mode="onehot"):
    """One touched tile GROUP per grid step.

    The frame list is group-aligned (grid/hash.py insert_frame_list): delta
    tile i's 8 rows sit at exactly the in-group rows of channel group
    groups[i], so the update is a straight aligned add — no row placement,
    no cross-step accumulation. The semantic one-hot expansion
    (ops/semantic.py decomposition: sem_delta[l] += lk_delta * cnt at the
    measured label) runs once per *group*, not once per slot.

    Trash tiles (groups[i] == trash_group, consecutive at the tail) skip the
    body; their uninitialized output buffers land only in the grid's
    exclusive trash tile (garbage by contract)."""
    @pl.when(groups_ref[pl.program_id(0)] != trash_group)
    def _body():
        out_w[:] = in_w[:] + d_w[:]
        out_wsdf[:] = in_wsdf[:] + d_wsdf[:]
        cnt = d_cnt[:]
        out_cnt[:] = in_cnt[:] + cnt
        labiota = jax.lax.broadcasted_iota(jnp.int32, (num_labels, 1, 1), 0)
        if sem_mode == "onehot":
            # One label per voxel (projective sampler): expand on the fly.
            out_sem[:] = in_sem[:] + jnp.where(labiota == d_labsem[:][None],
                                               cnt[None] * lk_delta, 0.0)
        elif sem_mode == "dense":
            # Dense per-(label, row) vote counts (staged segment apply,
            # ops/integrate.py): exact for any label multiplicity per voxel.
            out_sem[:] = in_sem[:] + d_labsem[:] * lk_delta
        else:  # "packed": P planes of (count * 32 + label) packed f32
            # (staged segment apply — per-voxel label ranks; exact while
            # count < 2^19: both factors integral, product < 2^24).
            sem = in_sem[:]
            P = d_labsem.shape[0]
            for r in range(P):
                v = d_labsem[r]
                cr = jnp.floor(v * (1.0 / 32.0))
                lr = (v - 32.0 * cr).astype(jnp.int32)
                sem = sem + jnp.where(labiota == lr[None],
                                      cr[None] * lk_delta, 0.0)
            out_sem[:] = sem
        out_wc[:] = in_wc[:] + d_wc[:]


@functools.partial(jax.jit, static_argnames=("lk_delta", "interpret",
                                             "sem_packed_ranks"))
def block_rmw_add(wsum, wsdf, sem_count, sem_delta, wcolor, slots,
                  d_w, d_wsdf, d_cnt, d_lab, d_wc, lk_delta,
                  interpret=False, d_sem=None, sem_packed_ranks=0):
    """grid_channel[slots[k]] += delta[k] for K touched-list rows, in place.

    Constraints this design routes around (measured / Mosaic rules):
      - XLA scatter walks indices serially (~3-14 us per row at these
        payload sizes — scripts/profile_projective_core2.py);
      - reshaping channels to Mosaic-tileable (.., V3/128, 128) shapes is a
        layout *copy* on TPU (~12 ms/frame over the grid);
      - single rows of a (8, 128)-tiled array cannot be block-fetched or
        DMA-sliced.
    So: channels keep their native (rows, V3) layout and `slots` arrives
    GROUP-ALIGNED (grid/hash.py insert_frame_list): every 8-row delta tile
    covers exactly one (8, V3) channel tile group, rows pre-placed, distinct
    groups per tile, trash tiles last. The kernel runs one grid step per
    tile: fetch group, add the aligned delta tile, write back. Traffic and
    compute scale with *distinct groups touched*; in-group padding rows
    carry zero deltas by construction (the sample kernel's `real` gate).

    Layouts: wsum/wsdf/sem_count (rows, V3); sem_delta (L, rows, V3);
    wcolor (3, rows, V3); deltas (K, V3) f32 / d_lab (K, V3) int32 /
    d_wc (K, 3, V3), all in frame-list (group-aligned) order.
    """
    K, V3 = d_w.shape
    L = sem_delta.shape[0]
    assert K % 8 == 0
    if d_sem is not None:
        # (L, K, V3) dense vote counts or (P, K, V3) packed rank planes —
        # distinguished by dtype/shape at the caller via sem_mode.
        d_labsem = d_sem
        sem_mode = "dense" if d_sem.shape[0] == L else "packed"
        if d_sem.shape[0] == L and sem_packed_ranks == L:
            sem_mode = "packed"  # P == L: explicit override
    else:
        d_labsem = d_lab
        sem_mode = "onehot"
    # color delta to channel-major (XLA transpose — cheap at (K, 3, V3))
    d_wc = jnp.transpose(d_wc, (1, 0, 2))
    # Per-tile group ids; row 0 of each tile carries the tile's slot.
    groups = slots[::8] // 8
    trash_group = (wsum.shape[0] - 8) // 8

    # Lane tiling: the body is elementwise over lanes, and at the reference's
    # vps=32 (V3=32768) a full-lane step needs ~61 MB of VMEM x2 buffers —
    # over the ~100 MB scoped limit. Split lanes into <=8192-wide blocks
    # (vps<=16 keeps one block — identical schedule to before).
    Vt = V3 if V3 <= 8192 else 8192
    assert V3 % Vt == 0

    # Trash tiles (tail of the group-aligned frame list) skip the kernel body,
    # but their delta-input DMAs would still be issued per grid step — ~60% of
    # the list is trash at the default budget, a few hundred MB/frame. Mapping
    # every trash tile's delta fetch to tile 0 makes consecutive steps see an
    # unchanged block index, which Mosaic skips (same mechanism that already
    # makes the trash *group* fetches free via g[i] == trash_group runs).
    live = lambda i, g: jnp.where(g[i] == trash_group, 0, i)
    by_tile = lambda i, v, g: (live(i, g), v)
    by_tile3 = lambda i, v, g: (0, live(i, g), v)
    by_group = lambda i, v, g: (g[i], v)
    by_group3 = lambda i, v, g: (0, g[i], v)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // 8, V3 // Vt),
        in_specs=[
            pl.BlockSpec((8, Vt), by_tile), pl.BlockSpec((8, Vt), by_tile),
            pl.BlockSpec((8, Vt), by_tile),
            (pl.BlockSpec((d_labsem.shape[0], 8, Vt), by_tile3)
             if sem_mode != "onehot" else pl.BlockSpec((8, Vt), by_tile)),
            pl.BlockSpec((3, 8, Vt), by_tile3),
            pl.BlockSpec((8, Vt), by_group), pl.BlockSpec((8, Vt), by_group),
            pl.BlockSpec((8, Vt), by_group),
            pl.BlockSpec((L, 8, Vt), by_group3),
            pl.BlockSpec((3, 8, Vt), by_group3),
        ],
        out_specs=[
            pl.BlockSpec((8, Vt), by_group), pl.BlockSpec((8, Vt), by_group),
            pl.BlockSpec((8, Vt), by_group),
            pl.BlockSpec((L, 8, Vt), by_group3),
            pl.BlockSpec((3, 8, Vt), by_group3),
        ],
    )
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)
                  for x in (wsum, wsdf, sem_count, sem_delta, wcolor)]
    # Aliases index the pallas_call operands (scalar-prefetch arg included):
    # operands are (groups, 5 deltas, 5 grid channels) -> channels at 6..10.
    return pl.pallas_call(
        functools.partial(_rmw_kernel, lk_delta=lk_delta, num_labels=L,
                          trash_group=trash_group, sem_mode=sem_mode),
        grid_spec=grid_spec, out_shape=out_shapes,
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3, 10: 4},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(groups, d_w, d_wsdf, d_cnt, d_labsem, d_wc,
      wsum, wsdf, sem_count, sem_delta, wcolor)
