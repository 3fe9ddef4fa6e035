"""Merged semantic TSDF integrator — TPU-native ray bundling.

Capability equivalent of `kimera::MergedSemanticTsdfIntegrator`
(kimera_semantics/src/semantic_tsdf_integrator_merged.cpp): points are binned by
their destination voxel (`bundleRays`, _merged.cpp:110-124), each bin is
collapsed to one weighted-average ray carrying a full label-frequency histogram
(:254-285), and the merged rays are cast with the histogram applied to every
traversed voxel (:288-328). Clearing rays are bundled separately and take only
the first point of each bin (:282-284).

TPU re-derivation (SURVEY 2c): binning = lexicographic sort on packed voxel
keys + segment-reduce; the two sequential passes (normal then clearing) become
two ray batches through the same fused update; static thread striping
disappears (data parallelism over segments).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..core.camera import PinholeIntrinsics
from ..grid.blocks import VoxelGrid, point_to_voxel
from ..ops.integrate import integrate_ray_batch
from . import common

_EPS_WEIGHT = 1e-6  # voxblox kEpsilon gate on point weights (_merged.cpp:263-266)


def _bundle(points_G, weights, colors, labels, active, *, voxel_size_inv: float,
            num_labels: int, max_bundles: int):
    """Bin points by destination voxel; reduce each bin to one merged ray.

    Returns per-bundle (valid, point_G, weight, color, hist, first_idx) where
    `first_idx` is the original index of the bin's first point (for the
    clearing-ray first-point-only rule).
    """
    n = points_G.shape[0]
    vox = point_to_voxel(points_G, voxel_size_inv)
    # Pack 15-bit-per-axis voxel coords into two int32 sort keys.
    c = jnp.clip(vox + (1 << 14), 0, (1 << 15) - 1)
    key_hi = (c[..., 0] << 15) | c[..., 1]
    key_lo = c[..., 2]
    # Inactive points sort to the back.
    key_hi = jnp.where(active, key_hi, jnp.int32(0x7FFFFFFF))
    idx = jnp.arange(n, dtype=jnp.int32)
    key_hi, key_lo, perm = jax.lax.sort((key_hi, key_lo, idx), num_keys=2)

    # ONE packed gather for all per-point channels (TPU gathers cost per
    # index, not per byte — models/common.py gather_packed).
    w, pg, col, lab, act, vox_p = common.gather_packed(
        perm, jnp.where(active, weights, 0.0), points_G, colors, labels,
        active, vox)
    contrib = w > _EPS_WEIGHT

    is_first = jnp.ones((n,), dtype=bool)
    is_first = is_first.at[1:].set(
        (key_hi[1:] != key_hi[:-1]) | (key_lo[1:] != key_lo[:-1]))
    seg = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    # Bins beyond the bundle budget are dropped and COUNTED (fixed-capacity
    # contract): n_dropped rides the last return slot.
    n_bins = jnp.sum((is_first & act).astype(jnp.int32))
    n_dropped = jnp.maximum(0, n_bins - max_bundles)
    seg = jnp.where(act, seg, max_bundles)  # drop inactive

    def segsum(vals, width=None):
        shape = (max_bundles + 1,) if width is None else (max_bundles + 1, width)
        return jnp.zeros(shape, dtype=jnp.float32).at[seg].add(vals, mode="drop")

    wsum = segsum(w * contrib)
    wpoint = segsum((w * contrib)[:, None] * pg, 3)
    wcolor = segsum((w * contrib)[:, None] * col, 3)
    hist = jnp.zeros((max_bundles + 1, num_labels), dtype=jnp.float32).at[
        seg, lab].add(contrib.astype(jnp.float32), mode="drop")
    # Destination voxel coords of each bundle (constant within a segment).
    dest = jnp.zeros((max_bundles + 1, 3), dtype=jnp.int32).at[seg].max(
        vox_p + (1 << 14), mode="drop") - (1 << 14)
    # Bin's earliest point in original order (reference takes the first point
    # of each bin for clearing rays; ordering there is thread-mixed, here
    # deterministic raster order — tolerance contract).
    first_idx = jnp.full((max_bundles + 1,), n, dtype=jnp.int32).at[seg].min(
        perm, mode="drop")

    valid = wsum[:max_bundles] > _EPS_WEIGHT
    denom = jnp.maximum(wsum[:max_bundles, None], 1e-12)
    # Point -> bundle map in ORIGINAL point order (for per-point semantic
    # votes riding the merged rays — ops/integrate.py sem_points).
    seg_orig = jnp.full((n,), max_bundles, dtype=jnp.int32).at[perm].set(
        jnp.where(act & contrib, seg, max_bundles))
    return (valid,
            wpoint[:max_bundles] / denom,
            wsum[:max_bundles],
            wcolor[:max_bundles] / denom,
            hist[:max_bundles],
            first_idx[:max_bundles],
            dest[:max_bundles],
            seg_orig,
            n_dropped)


def _bundle_scan(points_G, weights, colors, labels, active, *,
                 voxel_size_inv: float, max_bundles: int):
    """Scan-form bundling for the banded paths (no histogram, no
    original-order bin map): sort by destination voxel, segmented-scan the
    weighted sums, compact segment heads with the packed 1-operand sort.

    Replaces _bundle's `.at[seg].add/.set` segment scatters for the banded
    prepare: in the slow-scatter runtime regime (ops/integrate.py
    _staged_segment_apply rationale) those four 307k-index scatters cost
    ~12 ms/frame; scans and gathers are unaffected (~3-4 ns/element).

    Returns (valid, point, weight, color, seg_sorted, lab_sorted,
    act_sorted, contrib_sorted, dest, n_dropped): per-bundle reductions in
    bin rank order (rank = first-appearance order in the voxel-sorted
    stream, exactly _bundle's segment ids), plus the SORTED-ORDER per-point
    (bin, label, gates) streams for the sparse vote build — votes reduce to
    identical (bin, label) sums from sorted order, so the original-order
    scatter map is never materialized.
    """
    from ..ops.reduce import segmented_scan_sums

    n = points_G.shape[0]
    vox = point_to_voxel(points_G, voxel_size_inv)
    c = jnp.clip(vox + (1 << 14), 0, (1 << 15) - 1)
    key_hi = (c[..., 0] << 15) | c[..., 1]
    key_lo = c[..., 2]
    key_hi = jnp.where(active, key_hi, jnp.int32(0x7FFFFFFF))
    idx = jnp.arange(n, dtype=jnp.int32)
    key_hi, key_lo, perm = jax.lax.sort((key_hi, key_lo, idx), num_keys=2)

    w, pg, col, lab, act, vox_p = common.gather_packed(
        perm, jnp.where(active, weights, 0.0), points_G, colors, labels,
        active, vox)
    contrib = w > _EPS_WEIGHT
    wc = jnp.where(contrib, w, 0.0)

    is_first = jnp.ones((n,), dtype=bool)
    is_first = is_first.at[1:].set(
        (key_hi[1:] != key_hi[:-1]) | (key_lo[1:] != key_lo[:-1]))
    seg = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    n_bins = jnp.sum((is_first & act).astype(jnp.int32))
    n_dropped = jnp.maximum(0, n_bins - max_bundles)

    # Inclusive segmented prefix sums; segment totals sit at the last
    # element of each segment.
    scans = segmented_scan_sums(
        is_first, (wc, wc * pg[:, 0], wc * pg[:, 1], wc * pg[:, 2],
                   wc * col[:, 0], wc * col[:, 1], wc * col[:, 2]))
    is_end = jnp.concatenate([is_first[1:], jnp.ones((1,), bool)])

    # Compact the segment END positions to bin rank order (packed 1-op
    # sort): ends appear in stream order == ascending seg rank.
    assert n < (1 << 30)
    packed = jnp.where(is_end & act, idx, idx | jnp.int32(1 << 30))
    order_e = jax.lax.sort(packed)[:max_bundles]
    if order_e.shape[0] < max_bundles:   # fewer points than the bundle cap
        order_e = jnp.pad(order_e, (0, max_bundles - order_e.shape[0]),
                          constant_values=1 << 30)
    bin_ok = order_e < jnp.int32(1 << 30)
    order_e = order_e & jnp.int32((1 << 30) - 1)
    sums = common.gather_packed(order_e, *scans)
    wsum = jnp.where(bin_ok, sums[0], 0.0)
    valid = wsum > _EPS_WEIGHT
    denom = jnp.maximum(wsum[:, None], 1e-12)
    point = jnp.stack(sums[1:4], axis=-1) / denom
    colorb = jnp.stack(sums[4:7], axis=-1) / denom
    # Destination voxel: constant within a segment — read it at the end.
    (dest,) = common.gather_packed(order_e, vox_p.astype(jnp.float32))
    # Invalid bins: far out-of-range coords (anti-grazing lookups miss,
    # matching _bundle's empty-segment value).
    dest = jnp.where(bin_ok[:, None], jnp.round(dest).astype(jnp.int32),
                     -(1 << 14))
    return (valid, point, wsum, colorb, seg, lab, act, contrib, dest,
            n_dropped)


def _bundle_prepare(frame, cfg: FusionConfig, intr: PinholeIntrinsics):
    """Grid-independent bundled prepare for ONE frame (projective-carve
    mode): bundling, sparse (bundle, label) votes, band jobs. Pure in the
    frame — vmappable across a batch (integrate_frames). Returns
    (band_jobs, sem_pts, pair_drop, origin).

    NB: mirrors the proj-carve slice of _frame_parts (which additionally
    threads grid state / anti-grazing dests for the sequential path) — the
    batched-vs-sequential equality test (tests/test_carve.py
    TestCubeLutBatched) pins the two against each other."""
    from ..ops import carve as carve_ops
    from ..ops import semantic
    from ..ops.reduce import TRASH_KEY, segment_compact_reduce
    (_, pts_G, origin, colors, labels, weights, valid,
     is_clearing) = common.prepare_points(frame, intr, cfg)
    R = cfg.pipeline.max_rays
    L = cfg.grid.num_labels
    inv = 1.0 / cfg.grid.voxel_size
    (bvalid, bpoint, bweight, bcolor, seg_s, lab_s, act_s, contrib_s, _,
     bin_drop) = _bundle_scan(
        pts_G, weights, colors, labels, valid & ~is_clearing,
        voxel_size_inv=inv, max_bundles=R)
    n_pts = pts_G.shape[0]
    p_ray = jnp.minimum(seg_s, R - 1)
    p_valid = (act_s & contrib_s & (seg_s < R) & bvalid[p_ray]
               & semantic.informative(lab_s))
    lab_shift = max(1, (L - 1).bit_length())
    lab_c = jnp.clip(lab_s, 0, (1 << lab_shift) - 1)
    pair_key = jnp.where(p_valid, (p_ray << lab_shift) | lab_c, TRASH_KEY)
    pk, (pcounts,), pair_drop = segment_compact_reduce(
        pair_key, (jnp.where(p_valid, 1.0, 0.0),), 2 * R, max_run=n_pts)
    sp_valid = pk != TRASH_KEY
    sp_ray = jnp.where(sp_valid, pk >> lab_shift, 0)
    sp_lab = jnp.where(sp_valid, pk & ((1 << lab_shift) - 1), 0)
    zlab = jnp.zeros((R,), dtype=jnp.int32)
    origin_b = jnp.broadcast_to(origin[None, :], bpoint.shape)
    band = carve_ops.band_jobs(origin_b, bpoint, bweight, zlab, bcolor,
                               jnp.zeros((R,), dtype=bool), bvalid, cfg)
    return (band, (sp_ray, sp_lab, sp_valid, pcounts),
            pair_drop + bin_drop, origin)


def _frame_parts(grid, frame, cfg: FusionConfig, intr: PinholeIntrinsics,
                 apply_proj_carve: bool = True):
    """Pass-1 bundling + sparse semantic votes + free-space batches for one
    frame (the banded carve modes). Returns (grid, batches, sem_pts, origin,
    bdest, full_path_state): `batches` is the integrate_jobs list (band
    [, carve jobs]); under carve_mode == "projective" the dense free-space
    carve has ALREADY been applied to `grid` — unless `apply_proj_carve` is
    False (sharded callers run their ownership-filtered dense carve
    themselves, parallel/sharding.py). full_path_state carries what
    the non-banded voxblox-extent path needs (see integrate_frame)."""
    (_, pts_G, origin, colors, labels, weights, valid,
     is_clearing) = common.prepare_points(frame, intr, cfg)

    R = cfg.pipeline.max_rays
    L = cfg.grid.num_labels
    inv = 1.0 / cfg.grid.voxel_size

    # Pass 1: normal rays (voxel_map bins) — scan-form bundling (the
    # `.at[seg]` scatter form costs ~12 ms/frame in the slow-scatter
    # runtime regime; see _bundle_scan).
    (bvalid, bpoint, bweight, bcolor, seg_s, lab_s, act_s, contrib_s,
     bdest, bin_drop) = _bundle_scan(
        pts_G, weights, colors, labels, valid & ~is_clearing,
        voxel_size_inv=inv, max_bundles=R)
    grid = dataclasses.replace(grid,
                               dropped_rays=grid.dropped_rays + bin_drop)
    # Anti-grazing (_merged.cpp:306-313): dest set = the normal-pass bins;
    # a normal ray may still update its own bin.
    ag = cfg.tsdf.enable_anti_grazing
    # Semantic votes in sparse-histogram form: hist[r][l] applied to every
    # traversed voxel == each nonzero (bundle, label) pair votes its count
    # along the merged ray (ops/integrate.py sem_points; the dense (R, L)
    # histogram scatter path costs ~2.9 s/frame on v5e, measured). Raw
    # points (P = all pixels) are pre-reduced to unique (bundle, label)
    # pairs first — the vote stream then expands over ray *steps* at the
    # bundle budget (R), not the pixel count (~10x fewer entries).
    from ..ops import semantic
    from ..ops.reduce import TRASH_KEY, segment_compact_reduce
    n_pts = pts_G.shape[0]
    p_ray = jnp.minimum(seg_s, R - 1)
    p_valid = (act_s & contrib_s & (seg_s < R) & bvalid[p_ray]
               & semantic.informative(lab_s))
    lab_shift = max(1, (L - 1).bit_length())
    lab_c = jnp.clip(lab_s, 0, (1 << lab_shift) - 1)
    pair_key = jnp.where(p_valid, (p_ray << lab_shift) | lab_c, TRASH_KEY)
    # 2R pair budget: bundles carry ~1-2 distinct labels each, and the
    # bundle list itself is capped at R. Drops count as dropped_rays (same
    # static-capacity input-truncation contract as the bundle cap).
    pk, (pcounts,), pair_drop = segment_compact_reduce(
        pair_key, (jnp.where(p_valid, 1.0, 0.0),), 2 * R, max_run=n_pts)
    grid = dataclasses.replace(grid,
                               dropped_rays=grid.dropped_rays + pair_drop)
    sp_valid = pk != TRASH_KEY
    sp_ray = jnp.where(sp_valid, pk >> lab_shift, 0)
    sp_lab = jnp.where(sp_valid, pk & ((1 << lab_shift) - 1), 0)
    sem_pts = (sp_ray, sp_lab, sp_valid, pcounts)
    zlab = jnp.zeros((R,), dtype=jnp.int32)
    full_state = (pts_G, origin, colors, labels, weights, valid, is_clearing,
                  bvalid, bpoint, bweight, bcolor, zlab)

    # Projective free-space carve (see models/fast.py
    # _maybe_projective_carve): bundles march only their band; free space
    # (clearing bins included) is carved densely. Anti-grazing masks
    # per-traversal destination voxels, which the dense carve cannot honor —
    # it keeps the decimated carve jobs (integrate_jobs ag filter).
    proj_carve = (cfg.tsdf.carve_mode == "projective"
                  and cfg.tsdf.voxel_carving_enabled and not ag)
    decimate = (cfg.tsdf.carve_mode in ("decimated", "projective")
                and cfg.tsdf.voxel_carving_enabled)
    if not decimate:
        return grid, None, sem_pts, origin, bdest, full_state

    from ..ops import carve as carve_ops
    origin_b = jnp.broadcast_to(origin[None, :], bpoint.shape)
    band = carve_ops.band_jobs(origin_b, bpoint, bweight, zlab, bcolor,
                               jnp.zeros((R,), dtype=bool), bvalid, cfg)
    s_band = cfg.pipeline.resolved_band_steps(cfg.grid, cfg.tsdf)
    if proj_carve:
        if apply_proj_carve:
            from .fast import _maybe_projective_carve
            grid = _maybe_projective_carve(grid, frame, cfg, intr)
        return grid, [(band, s_band)], sem_pts, origin, bdest, full_state
    # Octave-decimated form (ops/carve.py): bundles march only their
    # truncation band (carrying the histogram votes); free space —
    # including the clearing bins' whole extent (_merged.cpp:282-284) —
    # is carved at voxel-matched ray density straight from the image's
    # min-reach mip. One fused integrate_jobs call covers both passes.
    plan = carve_ops.plan_carve(cfg, intr)
    cjobs = carve_ops.carve_jobs(frame.depth, frame.labels, frame.T_G_C,
                                 intr, cfg, plan)
    cjobs, dropped = carve_ops.compact_jobs(cjobs, cfg.pipeline.carve_budget)
    grid = dataclasses.replace(grid,
                               dropped_rays=grid.dropped_rays + dropped)
    return (grid, [(band, s_band), (cjobs, cfg.pipeline.carve_steps)],
            sem_pts, origin, bdest, full_state)


@partial(jax.jit, static_argnames=("cfg", "intr"), donate_argnames=("grid",))
def integrate_frame(grid: VoxelGrid, frame: common.Frame,
                    cfg: FusionConfig, intr: PinholeIntrinsics) -> VoxelGrid:
    from ..ops.integrate import integrate_jobs
    ag = cfg.tsdf.enable_anti_grazing
    grid, batches, sem_pts, origin, bdest, full_state = _frame_parts(
        grid, frame, cfg, intr)
    (pts_G, origin, colors, labels, weights, valid, is_clearing,
     bvalid, bpoint, bweight, bcolor, zlab) = full_state
    R = cfg.pipeline.max_rays
    L = cfg.grid.num_labels
    inv = 1.0 / cfg.grid.voxel_size
    if batches is not None:
        return integrate_jobs(
            grid, cfg, batches, sem_points=sem_pts, cube_origin=origin,
            ag_dest_voxels=bdest if ag else None, ag_own_bundle=True)

    grid = integrate_ray_batch(
        grid, cfg, origin, bpoint, bweight, bcolor,
        zlab,
        jnp.zeros((R,), dtype=bool), bvalid,
        sem_points=sem_pts,
        ag_dest_voxels=bdest if ag else None, ag_own_bundle=True)

    # Pass 2: clearing rays (clear_map bins) — first point of each bin only
    # (_merged.cpp:282-284): exactly one label per merged ray, so this rides
    # the native one-label-per-ray path (no histogram needed).
    (cvalid, _, _, _, _, cfirst, _, _, cbin_drop) = _bundle(
        pts_G, weights, colors, labels, valid & is_clearing,
        voxel_size_inv=inv, num_labels=L, max_bundles=R)
    grid = dataclasses.replace(grid,
                               dropped_rays=grid.dropped_rays + cbin_drop)
    n = pts_G.shape[0]
    safe_first = jnp.minimum(cfirst, n - 1)
    cpts, cweights, ccolors, clabels = common.gather_packed(
        safe_first, pts_G, weights, colors, labels)
    cvalid = cvalid & (cfirst < n) & (cweights > _EPS_WEIGHT)
    grid = integrate_ray_batch(
        grid, cfg, origin, cpts, cweights, ccolors, clabels,
        jnp.ones((R,), dtype=bool), cvalid,
        ag_dest_voxels=bdest if ag else None, ag_own_bundle=False)
    return grid


class MergedSemanticTsdfIntegrator:
    def __init__(self, cfg: FusionConfig, intr: PinholeIntrinsics):
        self.cfg = cfg
        self.intr = intr

    def integrate(self, grid: VoxelGrid, frame: common.Frame) -> VoxelGrid:
        return integrate_frame(grid, frame, self.cfg, self.intr)


@partial(jax.jit, static_argnames=("cfg", "intr"), donate_argnames=("grid",))
def integrate_frames(grid: VoxelGrid, frames: common.Frame,
                     cfg: FusionConfig, intr: PinholeIntrinsics) -> VoxelGrid:
    """Batched multi-frame merged update (models/fast.py integrate_frames
    counterpart — VERDICT r1 item 1).

    B frames' band (+ carve) batches are concatenated per kind and reduced
    in ONE integrate_jobs call — one sort/scan/scatter pass instead of B.
    Each frame's sparse (bundle, label) vote stream rides batch 0 with its
    ray indices offset by the frame's position in the concatenation, so the
    per-frame histogram semantics (_merged.cpp:254-285) are preserved
    exactly. Bundling itself is per frame (bins never span frames).

    Requires a banded carve mode (decimated/projective) and no anti-grazing
    (whose dest sets are per-frame); callers fall back to sequential
    integrate_frame otherwise (models/factory.py does this).
    """
    from ..ops.integrate import integrate_jobs
    assert not cfg.tsdf.enable_anti_grazing, (
        "batched merged integration does not support anti-grazing")
    assert (cfg.tsdf.carve_mode in ("decimated", "projective")
            and cfg.tsdf.voxel_carving_enabled), (
        "batched merged integration needs a banded carve mode")
    B = frames.depth.shape[0]
    R = cfg.pipeline.max_rays
    if (cfg.tsdf.carve_mode == "projective"
            and cfg.tsdf.voxel_carving_enabled):
        # Sequential per-frame dense carves (batched union allocation was
        # measured slower, docs/DESIGN.md), ONE vmapped bundling/vote
        # prepare across the batch (see models/fast.py integrate_frames).
        from .fast import _projective_carve_batched
        grid = _projective_carve_batched(grid, frames, cfg, intr)
        bands, sems_v, drops, origins = jax.vmap(
            lambda f: _bundle_prepare(f, cfg, intr))(frames)
        band = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), bands)
        s_band = cfg.pipeline.resolved_band_steps(cfg.grid, cfg.tsdf)
        sr, sl, sv, sc = sems_v
        off = (jnp.arange(B, dtype=jnp.int32)[:, None]
               * jnp.int32(R))                      # frame ray offsets
        sem_cat = ((sr + off).reshape(-1), sl.reshape(-1), sv.reshape(-1),
                   sc.reshape(-1))
        grid = dataclasses.replace(
            grid, dropped_rays=grid.dropped_rays + jnp.sum(drops))
        return integrate_jobs(grid, cfg, [(band, s_band)],
                              sem_points=sem_cat, cube_origin=origins)

    per_kind = None
    sems = []
    origins = []
    for b in range(B):
        f = jax.tree.map(lambda x, _b=b: x[_b], frames)
        grid, batches, sem_pts, origin, _, _ = _frame_parts(grid, f, cfg,
                                                            intr)
        origins.append(origin)
        if per_kind is None:
            per_kind = [[bt] for bt in batches]
        else:
            for i, bt in enumerate(batches):
                per_kind[i].append(bt)
        sr, sl, sv, sc = sem_pts
        sems.append((sr + b * R, sl, sv, sc))

    def cat(entries):
        S = entries[0][1]
        jobs = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                            *[j for j, _ in entries])
        return jobs, S

    sem_cat = tuple(jnp.concatenate([s[i] for s in sems]) for i in range(4))
    # Per-frame cube LUTs for the concatenated band stream (see
    # models/fast.py integrate_frames).
    return integrate_jobs(grid, cfg, [cat(e) for e in per_kind],
                          sem_points=sem_cat,
                          cube_origin=jnp.stack(origins))
