"""Projective semantic TSDF integrator — the TPU flagship speed path.

Capability-equivalent third integrator alongside "fast" and "merged"
(semantic_tsdf_integrator_factory.h:49-54 defines the reference's two): same
per-voxel update mathematics (ops/tsdf.py, ops/semantic.py), but voxel-centric
instead of ray-centric (ops/projective.py rationale). Per frame:

  1. mip atlas of the depth/label/color images      (ops/mip.py, dense XLA)
  2. allocation: a *block-granularity* DDA over a pixel-subsampled ray set
     finds every block any ray corridor crosses; batch hash-insert yields this
     frame's touched-block list (grid/hash.py insert_frame_list)
  3. dense per-voxel updates for K touched blocks: project voxel centers,
     sample the atlas via the one-hot MXU gather, compute TSDF/semantic terms
  4. apply: blockwise in-place Pallas read-modify-write add on TPU
     (pallas_kernels.block_rmw_add), XLA scatter-add elsewhere.

No sorts, no per-element scatters, no update stream — the per-frame cost is
O(touched blocks x vps^3) dense MXU/VPU work. The ray-centric early-exit
heuristics of the reference (start-voxel subsampling, approx sets,
_fast.cpp:87-121) have no projective analogue and are not needed: each voxel
is updated at most once per frame by construction.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import ColorMode, FusionConfig
from ..core import transforms
from ..core.camera import PinholeIntrinsics
from ..grid import hash as bhash
from ..grid.blocks import VoxelGrid
from ..ops import mip as mip_ops
from ..ops import projective as proj_ops
from ..ops import raycast, tsdf as tsdf_ops
from ..ops import semantic as sem_ops
from . import common

# Test hook (mirrors ops/integrate.py): run the Pallas apply interpreted.
FORCE_PALLAS_INTERPRET = False


def _use_pallas(cfg: FusionConfig) -> bool:
    v3 = cfg.grid.vps3
    return (cfg.pipeline.use_pallas
            and v3 % 128 == 0             # Mosaic (8,128) tiling rule
            # block_rmw_add lane-splits V3 > 8192 into 8192-wide tiles
            and (v3 <= 8192 or v3 % 8192 == 0)
            # the fused sampler's label channel rides a single bf16 dot —
            # exact only for ids <= 256 (8 mantissa bits); larger label
            # spaces take the XLA hi/lo-split path
            and cfg.grid.num_labels <= 256
            and (jax.default_backend() in ("tpu", "axon")
                 or FORCE_PALLAS_INTERPRET))


def _sample_mode(cfg: FusionConfig) -> str:
    mode = cfg.pipeline.sample_mode
    if mode != "auto":
        return mode
    return ("onehot" if jax.default_backend() in ("tpu", "axon")
            else "gather")


def _allocate(grid: VoxelGrid, frame: common.Frame, cfg: FusionConfig,
              intr: PinholeIntrinsics, shard=None):
    """Block-granularity allocation: coarse DDA over subsampled pixel rays.

    Mirrors the reference's allocate-on-demand along every ray
    (semantic_integrator_base.cpp:205-254) as a pre-pass at block resolution:
    any block a ray corridor crosses (extended by the truncation band) is
    allocated. Pixel subsampling by `alloc_stride` is safe because a block at
    the maximum ray length still spans many strides of pixels.

    `shard`: optional (my_index, num_shards) — keep only blocks this shard
    owns by block-key hash (parallel/sharding.py ownership protocol).
    """
    return allocate_from_depth(grid, frame.depth, frame.labels, frame.T_G_C,
                               cfg, intr, shard)


def allocate_from_depth(grid: VoxelGrid, depth, labels, T_G_C,
                        cfg: FusionConfig, intr: PinholeIntrinsics,
                        shard=None):
    """Raw-image entry: strided pixel subsampling (CPU/XLA reference path).

    On the TPU hot path use allocate_from_atlas instead — a 2-D strided
    slice lowers to a serial per-element gather (~12 ns/px measured)."""
    import math
    g, t, stride = cfg.grid, cfg.tsdf, cfg.pipeline.alloc_stride
    depth = depth[::stride, ::stride]
    labels = labels[::stride, ::stride].reshape(-1)
    # Exact 1/stride intrinsics sized to the actual strided-slice shape —
    # floor-divided dims would skew fx/cx when W or H isn't a multiple of
    # the stride (ceil(481/2)=241 rows scaled by 240/481 != 1/2).
    sub = PinholeIntrinsics(
        fx=intr.fx / stride, fy=intr.fy / stride,
        cx=intr.cx / stride, cy=intr.cy / stride,
        width=int(math.ceil(intr.width / stride)),
        height=int(math.ceil(intr.height / stride)))
    from ..core import camera as cam
    pts_C, px_valid = cam.backproject(depth, sub)
    return _allocate_rays(grid, pts_C, labels, px_valid, T_G_C, cfg, shard)


def allocate_from_atlas(grid: VoxelGrid, atlas, T_G_C, cfg: FusionConfig,
                        intr: PinholeIntrinsics, plan, shard=None):
    """Block allocation pre-pass reading the already-built mip atlas at
    level log2(alloc_stride): the subsampled depth/label images are static
    aligned slices of the atlas (no strided-pixel gather), and the
    min-pooled depth makes ray endpoints conservative (the nearest surface
    in each tile wins — a missed far surface at a depth discontinuity is
    the same contract as the reference's subsampled rays,
    semantic_tsdf_integrator_fast.cpp:87-91)."""
    keys, bvalid = candidates_from_atlas(atlas, T_G_C, cfg, intr, plan)
    return insert_candidates(grid, keys, bvalid, cfg, shard=shard)


def candidates_from_atlas(atlas, T_G_C, cfg: FusionConfig,
                          intr: PinholeIntrinsics, plan):
    """Candidate block keys for one frame, from its mip atlas (the DDA half
    of allocate_from_atlas — see _candidate_keys)."""
    import math
    from ..ops import mip as mip_ops
    stride = cfg.pipeline.alloc_stride
    lvl = int(math.log2(stride)) if stride > 1 else 0
    assert (1 << lvl) == stride, "alloc_stride must be a power of two"
    lvl = min(lvl, plan.num_levels - 1)
    H, W, off = plan.heights[lvl], plan.widths[lvl], plan.offsets[lvl]
    depth = atlas[0, :H, off:off + W]
    labels = jnp.round(atlas[1, :H, off:off + W]).astype(jnp.int32
                                                         ).reshape(-1)
    px_ok = depth < mip_ops.DEPTH_SENTINEL * 0.5
    depth = jnp.where(px_ok, depth, 0.0)
    from ..core import camera as cam
    pts_C, px_valid = cam.backproject(depth, intr.scaled(W, H))
    return _candidate_keys(pts_C, labels, px_valid, T_G_C, cfg)


def _candidate_keys(pts_C, labels, px_valid, T_G_C, cfg: FusionConfig):
    """The block-DDA half of allocation: candidate block keys for one frame's
    subsampled ray set. Returns (keys (S, R) int32, bvalid (S, R) bool).
    Split out so the sharded path can run it ONCE per device (own frame) and
    all-gather compact key lists instead of re-running the DDA for every
    frame on every shard (weak-scaling fix, VERDICT r1 item 2).

    On TPU the walk runs through the Pallas DDA kernel at BLOCK granularity
    (a FusionConfig view with voxel_size=block_size, vps=1): the alloc chain
    is op-count-bound (docs/DESIGN.md r3 roofline — the unrolled XLA walk is
    ~120 fused ops of 4.8k-lane work), and one kernel replaces all of them.
    Both paths consume identical world-unit ray extents, so the emitted
    block sets agree bit-for-bit (tests/test_projective.py pins it)."""
    import dataclasses as dc
    import math

    g, t = cfg.grid, cfg.tsdf
    valid, is_clearing = tsdf_ops.point_validity(pts_C, t)
    valid = valid & px_valid & sem_ops.dynamic_label_mask(labels, cfg.semantic)
    pts_G = transforms.apply(T_G_C, pts_C)
    origin = transforms.translation(T_G_C)

    # World-unit extents (voxel_size=1.0): both branches scale by
    # 1/block_size themselves with the same op order.
    start_w, end_w = raycast.setup_rays(
        jnp.broadcast_to(origin, pts_G.shape), pts_G, is_clearing,
        voxel_size=1.0,
        truncation_distance=t.truncation_distance,
        max_ray_length_m=t.max_ray_length_m,
        voxel_carving_enabled=t.voxel_carving_enabled)
    S = int(math.ceil(1.7321 * (t.max_ray_length_m + t.truncation_distance)
                      / g.block_size)) + 3
    R = pts_G.shape[0]

    # Gate through ops.integrate._use_pallas so the Mosaic pre-flight
    # (scripts/check_mosaic.py patches that gate) exports this kernel too.
    # Interpret mode must follow EITHER module's test hook: the ray-path
    # suites flip ops.integrate.FORCE_PALLAS_INTERPRET, which makes
    # _use_pallas true on CPU — running the kernel non-interpreted there
    # raises ("Only interpret mode is supported on CPU backend").
    from ..ops import integrate as int_ops
    interp = FORCE_PALLAS_INTERPRET or int_ops.FORCE_PALLAS_INTERPRET
    use_kernel = int_ops._use_pallas(cfg) or FORCE_PALLAS_INTERPRET
    if use_kernel:
        from ..ops import pallas_kernels
        TILE = pallas_kernels.TILE
        Rp = ((R + TILE - 1) // TILE) * TILE
        pad = Rp - R
        p2 = lambda a: jnp.pad(a, ((0, pad), (0, 0))).T       # (3, Rp)
        cfg_b = dc.replace(cfg, grid=dc.replace(
            g, voxel_size=g.block_size, voxels_per_side=1))
        keys, _, _, _, _, step_valid, _, _ = pallas_kernels.dda_job_stream(
            cfg_b, S, p2(jnp.broadcast_to(origin, pts_G.shape)), p2(pts_G),
            p2(start_w), p2(end_w), jnp.ones((Rp,), jnp.float32),
            jnp.pad(valid, (0, pad)), interpret=interp)
        return keys, step_valid

    inv = 1.0 / g.block_size
    bvox, bvalid = raycast.traverse_soa(start_w.T * inv, end_w.T * inv, S)
    bx, by, bz = bvox[:, 0], bvox[:, 1], bvox[:, 2]             # (S, R)
    bvalid = bvalid & valid[None, :]
    bvalid = bvalid & bhash.in_bounds_soa(bx, by, bz, g.world_extent_blocks)
    keys = bhash.pack_block_coords_soa(bx, by, bz, g.world_extent_blocks)
    return keys, bvalid


def insert_candidates(grid: VoxelGrid, keys, active, cfg: FusionConfig,
                      shard=None):
    """The insert half of allocation: ownership-filter + frame-list insert.
    `keys`/`active` may be the raw (S, R) DDA planes or an already
    unique-compacted list (bhash.unique_keys)."""
    g = cfg.grid
    if shard is not None:
        # Hash-ownership filter (same salt/mix as ops/integrate.py so the
        # ray-centric and projective sharded paths agree on owners).
        my, num = shard
        owner = bhash.mix(keys ^ jnp.int32(0x2545F491)) % num
        active = active & (owner == my)
    tk, ts, bc, nb, ov, fcoords, fslots, freal = bhash.insert_frame_list(
        grid.table_keys, grid.table_slots, grid.block_coords, grid.n_blocks,
        keys.reshape(-1), active.reshape(-1), g.table_size, g.block_capacity,
        g.world_extent_blocks, cfg.pipeline.block_budget)
    grid = dataclasses.replace(
        grid, table_keys=tk, table_slots=ts, block_coords=bc, n_blocks=nb,
        overflow=grid.overflow + ov)
    return grid, fcoords, fslots, freal


def _allocate_rays(grid: VoxelGrid, pts_C, labels, px_valid, T_G_C,
                   cfg: FusionConfig, shard=None):
    keys, bvalid = _candidate_keys(pts_C, labels, px_valid, T_G_C, cfg)
    return insert_candidates(grid, keys, bvalid, cfg, shard=shard)


@partial(jax.jit, static_argnames=("cfg", "intr", "wire_sim"),
         donate_argnames=("grid",))
def integrate_frame(grid: VoxelGrid, frame: common.Frame,
                    cfg: FusionConfig, intr: PinholeIntrinsics,
                    wire_sim: bool = False) -> VoxelGrid:
    """One full projective frame update, jit-compiled end to end.

    `wire_sim`: roundtrip the atlas through the sharded u16 wire codec
    (ops/mip.py) before use — the single-device equivalent of what every
    shard sees under the wire protocol. Used by the sharded-exactness
    dryrun/tests; production single-chip stays f32."""
    plan = mip_ops.make_plan(intr.height, intr.width,
                             cfg.pipeline.patch_rows, cfg.pipeline.patch_cols)
    atlas = mip_ops.build_atlas(frame.depth, frame.labels, frame.colors, plan)
    if wire_sim:
        atlas = mip_ops.wire_roundtrip_atlas(atlas, cfg)
    grid, fcoords, fslots, freal = allocate_from_atlas(grid, atlas,
                                                       frame.T_G_C, cfg, intr,
                                                       plan)
    return apply_frame(grid, atlas, frame.T_G_C, fcoords, fslots, freal, cfg,
                       intr, plan)


def apply_frame(grid: VoxelGrid, atlas, T_G_C, fcoords, fslots, freal,
                cfg: FusionConfig, intr: PinholeIntrinsics,
                plan, region: str = "all") -> VoxelGrid:
    """Sample + update the listed blocks from one frame's atlas (trace-level
    building block shared by integrate_frame and the sharded step).

    fcoords/fslots/freal are the group-aligned frame list of
    grid/hash.py insert_frame_list; `freal` gates which rows sample (padding
    rows emit zero deltas so the aligned tile add is a no-op for them)."""
    g = cfg.grid
    real = freal

    if _use_pallas(cfg):
        from ..ops import pallas_kernels
        from ..ops.integrate import make_likelihood_cached
        T_C_G = transforms.inverse(T_G_C)
        tflat = jnp.zeros((1, 128), jnp.float32).at[0, :12].set(
            T_C_G[:3, :4].reshape(-1))
        if cfg.pipeline.meta_kernel and fcoords.shape[0] % 128 == 0:
            # One-grid-step Pallas meta (r4): replaces the ~0.7 ms XLA
            # small-op chain (pallas_kernels.block_meta docstring).
            meta = pallas_kernels.block_meta(
                fcoords, real, tflat, intr, plan, g.block_size,
                interpret=FORCE_PALLAS_INTERPRET)
        else:
            lvl, u0l, v0, u0a = proj_ops.block_patch_meta(
                fcoords, T_C_G, intr, plan, g.block_size)
            meta = jnp.stack(
                [v0, u0a, real.astype(jnp.int32), lvl, u0l,
                 fcoords[:, 0], fcoords[:, 1], fcoords[:, 2]], axis=1)
        with_color = cfg.semantic.color_mode == ColorMode.COLOR
        if (cfg.pipeline.fused_apply and g.vps3 <= 8192
                and pallas_kernels.PROJ_BPS == 8):
            # One aliased kernel: sample + RMW fused (r4) — no (K, V3)
            # delta round trip, one launch.
            wsum, wsdf, sem_count, sem_delta, wcolor = (
                pallas_kernels.projective_apply_fused(
                    grid.wsum, grid.wsdf, grid.sem_count, grid.sem_delta,
                    grid.wcolor, fslots, meta, tflat, atlas, cfg, intr,
                    plan, lk_delta=make_likelihood_cached(cfg).delta,
                    with_color=with_color,
                    interpret=FORCE_PALLAS_INTERPRET, region=region))
        else:
            d_w, d_wsdf, d_cnt, d_lab, d_wc = (
                pallas_kernels.projective_sample_update(
                    meta, tflat, atlas, cfg, intr, plan,
                    with_color=with_color,
                    interpret=FORCE_PALLAS_INTERPRET, region=region))
            wsum, wsdf, sem_count, sem_delta, wcolor = (
                pallas_kernels.block_rmw_add(
                    grid.wsum, grid.wsdf, grid.sem_count, grid.sem_delta,
                    grid.wcolor, fslots, d_w, d_wsdf, d_cnt, d_lab, d_wc,
                    lk_delta=make_likelihood_cached(cfg).delta,
                    interpret=FORCE_PALLAS_INTERPRET))
    else:
        d = proj_ops.voxel_deltas(fcoords, real, atlas, T_G_C, intr,
                                  plan, cfg, _sample_mode(cfg),
                                  region=region)
        safe = jnp.where(real, fslots, g.block_capacity)
        wsum = grid.wsum.at[safe].add(d["w"], mode="drop")
        wsdf = grid.wsdf.at[safe].add(d["wsdf"], mode="drop")
        sem_count = grid.sem_count.at[safe].add(d["cnt"], mode="drop")
        sem_delta = grid.sem_delta.at[:, safe].add(
            d["sem"].transpose(1, 0, 2), mode="drop")
        wcolor = grid.wcolor.at[:, safe].add(
            d["wcolor"].transpose(1, 0, 2), mode="drop")

    updated = grid.updated.at[jnp.where(real, fslots, g.padded_rows)].set(
        True, mode="drop")
    return dataclasses.replace(
        grid, wsum=wsum, wsdf=wsdf, wcolor=wcolor, sem_count=sem_count,
        sem_delta=sem_delta, updated=updated)


def apply_rows_multi(grid: VoxelGrid, atlases, T_G_C_all, frame_idx,
                     fcoords, fslots, freal, cfg: FusionConfig,
                     intr: PinholeIntrinsics, plan,
                     region: str = "all") -> VoxelGrid:
    """Sample + update a MIXED-frame row list: row j samples frame
    frame_idx[j]'s atlas/pose (ops/projective.py voxel_deltas_multi). Used
    by the sharded data-parallel step so all D frames' owned rows share ONE
    row budget (XLA scatter path; the per-frame Pallas kernel skips its
    padding tiles at runtime instead)."""
    g = cfg.grid
    d = proj_ops.voxel_deltas_multi(frame_idx, fcoords, freal, atlases,
                                    T_G_C_all, intr, plan, cfg,
                                    _sample_mode(cfg), region=region)
    safe = jnp.where(freal, fslots, g.block_capacity)
    wsum = grid.wsum.at[safe].add(d["w"], mode="drop")
    wsdf = grid.wsdf.at[safe].add(d["wsdf"], mode="drop")
    sem_count = grid.sem_count.at[safe].add(d["cnt"], mode="drop")
    sem_delta = grid.sem_delta.at[:, safe].add(
        d["sem"].transpose(1, 0, 2), mode="drop")
    wcolor = grid.wcolor.at[:, safe].add(
        d["wcolor"].transpose(1, 0, 2), mode="drop")
    updated = grid.updated.at[jnp.where(freal, fslots, g.padded_rows)].set(
        True, mode="drop")
    return dataclasses.replace(
        grid, wsum=wsum, wsdf=wsdf, wcolor=wcolor, sem_count=sem_count,
        sem_delta=sem_delta, updated=updated)


class ProjectiveSemanticTsdfIntegrator:
    """Object-style API (factory-compatible, models/factory.py)."""

    def __init__(self, cfg: FusionConfig, intr: PinholeIntrinsics):
        self.cfg = cfg
        self.intr = intr

    def integrate(self, grid: VoxelGrid, frame: common.Frame) -> VoxelGrid:
        return integrate_frame(grid, frame, self.cfg, self.intr)


@partial(jax.jit, static_argnames=("cfg", "intr"), donate_argnames=("grid",))
def integrate_frames(grid: VoxelGrid, frames: common.Frame,
                     cfg: FusionConfig, intr: PinholeIntrinsics) -> VoxelGrid:
    """Batched multi-frame update: B frames in one jit dispatch.

    frames: a Frame whose arrays carry a leading batch axis (B, ...). The
    frames are integrated sequentially on-device (allocation state chains
    through the hash table), amortizing host dispatch and letting XLA
    pipeline the B x (atlas, alloc, sample, apply) stages.

    NB (r3, measured on v5e): batching the allocation (vmapped candidates
    + ONE union hash insert + vmapped per-frame lists) was tried and is
    SLOWER (projective B=8 408 -> 339 fps) — the union sort plus vmapped
    list tails cost more than B small sequential chains. Sequential is the
    fast form; see docs/DESIGN.md negative results."""
    B = frames.depth.shape[0]
    plan = mip_ops.make_plan(intr.height, intr.width,
                             cfg.pipeline.patch_rows, cfg.pipeline.patch_cols)
    for b in range(B):
        f = jax.tree.map(lambda x: x[b], frames)
        atlas = mip_ops.build_atlas(f.depth, f.labels, f.colors, plan)
        grid, fcoords, fslots, freal = allocate_from_atlas(grid, atlas,
                                                           f.T_G_C, cfg, intr,
                                                           plan)
        grid = apply_frame(grid, atlas, f.T_G_C, fcoords, fslots, freal, cfg,
                           intr, plan)
    return grid
