"""The fused per-frame voxel update: raycast -> allocate -> scatter-add.

This is the TPU-native equivalent of the reference's hot loops
(semantic_tsdf_integrator_fast.cpp:66-142 per-point/per-voxel loops and
_merged.cpp:235-328 per-bundle loop). Where the reference walks rays serially
under striped mutexes, here every (step, ray) pair becomes one element of a
dense update stream that is scatter-added into the grid accumulators — all
updates are commutative, so no locks, no temp-block maps, no ordering.

TPU layout: the whole hot path is structure-of-arrays. Step-level arrays are
(S, R) with rays in vector lanes; coordinates are three separate component
planes; grid channels put component/label axes first (grid/blocks.py). No hot
array carries a minor dimension smaller than the 128-lane tile.

Pipeline (all inside one jit):
  1. DDA-expand R rays into (S, 3, R) voxel coordinates (ops/raycast.py).
  2. Allocation pre-pass: consecutive-dedup the block keys and batch-insert
     into the block hash table (grid/hash.py) — replaces the reference's
     allocate-on-demand + temp-map merge (semantic_integrator_base.cpp:205-265).
  3. Slot lookup + (slot, local) flat keys; invalid entries route to a trash row.
  4. TSDF terms (ops/tsdf.py) and semantic counts (ops/semantic.py).
  5. Scatter-add into wsum / wsdf / wcolor / sem_count / sem_delta, mark blocks
     updated for incremental meshing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..config import ColorMode, FusionConfig
from ..grid import blocks as gblocks
from ..grid import hash as bhash
from ..grid.blocks import VoxelGrid
from . import raycast, semantic, tsdf

# Test hook: route the pallas branch through interpret mode off-TPU.
FORCE_PALLAS_INTERPRET = False


def integrate_ray_batch(
    grid: VoxelGrid,
    cfg: FusionConfig,
    origin: jnp.ndarray,         # (3,) or (R, 3)
    points_G: jnp.ndarray,       # (R, 3)
    weights: jnp.ndarray,        # (R,) voxblox getVoxelWeight output
    colors: jnp.ndarray,         # (R, 3) float32 in [0, 255]
    labels: jnp.ndarray,         # (R,) int32 semantic label ids
    is_clearing: jnp.ndarray,    # (R,) bool
    ray_valid: jnp.ndarray,      # (R,) bool
    label_hist: Optional[jnp.ndarray] = None,  # (R, L) merged-integrator histograms
    shard_id: Optional[jnp.ndarray] = None,    # this shard's index (traced ok)
    num_shards: int = 1,
    ag_dest_voxels: Optional[jnp.ndarray] = None,  # (M, 3) anti-grazing dest set
    ag_own_bundle: bool = False,  # entries may update their own bundle's voxel
    sem_points: Optional[tuple] = None,  # (ray_idx (P,), labels (P,), valid (P,))
) -> VoxelGrid:
    """`shard_id`/`num_shards`: spatial sharding by block-hash ownership —
    entries whose block hashes to another shard are dropped here and applied by
    that shard (parallel/sharding.py ray-replication protocol, SURVEY 2c).

    `ag_dest_voxels`: the merged integrator's anti-grazing rule
    (_merged.cpp:306-313): traversed voxels that are *destination* voxels of
    other ray bundles are skipped; with `ag_own_bundle` a ray may still update
    its own destination voxel (normal pass; clearing rays never do).

    `sem_points`: weighted per-(ray, label) semantic votes riding this batch's
    ray geometry — the merged integrator's histogram-per-bundle semantics in
    sparse form (_merged.cpp:254-285 builds hist[r][l] = #bundle points with
    label l and votes the whole hist into every traversed voxel; equivalently
    each nonzero (r, l) entry votes `count` along ray r). Arrays
    (ray_idx, labels, valid, counts) of shape (P,) — callers pre-reduce raw
    points to unique (ray, label) pairs (models/merged.py) so P stays at the
    ray budget instead of the pixel count. In "segment" scatter mode this
    rides a dedicated (voxel,label) segment reduction sharing the main
    stream's DDA (the dense (R, L) histogram scatter alternative costs
    ~2.9 s/frame on v5e — measured); other modes fold it back into a
    histogram. When given, per-ray `labels` should be uninformative (zeros)
    and `label_hist` None."""
    g = cfg.grid
    t = cfg.tsdf
    vps, v3, cap, L = g.voxels_per_side, g.vps3, g.block_capacity, g.num_labels
    S = cfg.resolved_max_steps()

    import jax
    # "axon" is the TPU-tunnel platform name in some environments.
    use_pallas = (cfg.pipeline.use_pallas
                  and (jax.default_backend() in ("tpu", "axon")
                       or FORCE_PALLAS_INTERPRET))
    run_key = run_idx = None
    if use_pallas:
        # --- 1+4 fused: Pallas DDA/update-stream kernel -------------------
        from . import pallas_kernels
        origin3 = jnp.broadcast_to(origin, points_G.shape).T
        keys, local, w, w_sdf, wc_gate, step_valid, run_key, run_idx = (
            pallas_kernels.dda_update_stream(
                cfg, origin3, points_G.T, weights, is_clearing, ray_valid,
                interpret=FORCE_PALLAS_INTERPRET))
    else:
        # --- 1. DDA expansion (SoA, XLA scan) -----------------------------
        start_rs, end_rs = raycast.setup_rays(
            origin, points_G, is_clearing,
            voxel_size=g.voxel_size,
            truncation_distance=t.truncation_distance,
            max_ray_length_m=t.max_ray_length_m,
            voxel_carving_enabled=t.voxel_carving_enabled,
        )
        voxels, step_valid = raycast.traverse_soa(start_rs.T, end_rs.T, S)
        vx, vy, vz = voxels[:, 0], voxels[:, 1], voxels[:, 2]   # (S, R) each
        step_valid = step_valid & ray_valid[None, :]

        bx = jnp.floor_divide(vx, vps)
        by = jnp.floor_divide(vy, vps)
        bz = jnp.floor_divide(vz, vps)
        ext = g.world_extent_blocks
        keys = bhash.pack_block_coords_soa(bx, by, bz, ext)     # (S, R)
        step_valid = step_valid & bhash.in_bounds_soa(bx, by, bz, ext)
        local = ((vx - bx * vps) * vps + (vy - by * vps)) * vps + (vz - bz * vps)

        # --- 4. Update terms (SoA) ---------------------------------------
        sdf = tsdf.projective_sdf_soa(origin, points_G, vx, vy, vz,
                                      g.voxel_size)
        w, w_sdf, color_gate = tsdf.update_terms(sdf, weights[None, :], t,
                                                 g.voxel_size)
        w = jnp.where(step_valid, w, 0.0)
        w_sdf = jnp.where(step_valid, w_sdf, 0.0)
        wc_gate = jnp.where(step_valid & color_gate, w, 0.0)    # (S, R)

    ext = g.world_extent_blocks
    if num_shards > 1 and shard_id is not None:
        # Ownership filter at whichever granularity is available: run keys
        # (pallas) or step keys (XLA).
        salt = jnp.int32(0x2545F491)
        if run_key is not None:
            run_owner = bhash.mix(run_key ^ salt) % num_shards
            run_key = jnp.where(run_owner == shard_id, run_key, -1)
        owner = bhash.mix(keys ^ salt) % num_shards
        step_valid = step_valid & (owner == shard_id)
        w = jnp.where(step_valid, w, 0.0)
        w_sdf = jnp.where(step_valid, w_sdf, 0.0)
        wc_gate = jnp.where(step_valid, wc_gate, 0.0)

    # --- 2+3. Block allocation pre-pass + slot lookup ---------------------
    if run_key is not None:
        # Run-compacted hash ops: ~vps x fewer random accesses (SURVEY 7c;
        # measured 800 ms -> ~30 ms per frame on v5e).
        active = run_key >= 0                                  # (MAXR, R)
        tk, ts_, bc, nb, ov = bhash.insert_compacted(
            grid.table_keys, grid.table_slots, grid.block_coords,
            grid.n_blocks, run_key.reshape(-1), active.reshape(-1),
            g.table_size, cap, ext)
        grid = dataclasses.replace(
            grid, table_keys=tk, table_slots=ts_, block_coords=bc,
            n_blocks=nb, overflow=grid.overflow + ov)
        run_slots = bhash.lookup(grid.table_keys, grid.table_slots,
                                 run_key.reshape(-1), g.table_size
                                 ).reshape(run_key.shape)
        run_slots = jnp.where(active & (run_slots >= 0), run_slots, cap)
        # Broadcast run slots back to steps: select-sum over the MAXR planes
        # (vector ops only — no step-level gather).
        slots = jnp.zeros(keys.shape, dtype=jnp.int32)
        for p in range(run_key.shape[0]):
            slots = slots + jnp.where(run_idx == p, run_slots[p][None, :], 0)
        slots = jnp.where(step_valid, slots, cap)
        touched_slots = run_slots.reshape(-1)
    else:
        # Step-level path (XLA fallback): consecutive-dedup the insert stream.
        changed = jnp.ones(keys.shape, dtype=bool)
        changed = changed.at[1:].set(keys[1:] != keys[:-1])
        tk, ts_, bc, nb, ov = bhash.insert(
            grid.table_keys, grid.table_slots, grid.block_coords,
            grid.n_blocks, keys.reshape(-1),
            (step_valid & changed).reshape(-1), g.table_size, cap, ext)
        grid = dataclasses.replace(
            grid, table_keys=tk, table_slots=ts_, block_coords=bc,
            n_blocks=nb, overflow=grid.overflow + ov)
        slots = bhash.lookup(grid.table_keys, grid.table_slots,
                             keys.reshape(-1), g.table_size
                             ).reshape(keys.shape)
        slots = jnp.where(step_valid & (slots >= 0), slots, cap)  # (S, R)
        touched_slots = slots.reshape(-1)

    key = slots * v3 + local                                    # flat voxel key
    n_flat = (cap + 1) * v3   # key space: valid keys + the trash row
    row_flat = cfg.grid.padded_rows * v3  # physical rows (8-row trash tile)

    if ag_dest_voxels is not None:
        # Anti-grazing (_merged.cpp:306-313): dest voxels of this frame's
        # bundles, as flat keys (they were just allocated above).
        dblock, dlin = gblocks.voxel_to_block_local(ag_dest_voxels, vps)
        dslots = gblocks.lookup_slots(grid, dblock, g)
        dkey = jnp.where(dslots < cap, dslots * v3 + dlin, n_flat)
        dest_mask = jnp.zeros((n_flat + 1,), dtype=bool).at[dkey].set(
            True, mode="drop")
        hit = dest_mask[key]
        if ag_own_bundle:
            hit = hit & (key != dkey[None, :key.shape[1]])
        step_valid = step_valid & ~hit
        w = jnp.where(step_valid, w, 0.0)
        w_sdf = jnp.where(step_valid, w_sdf, 0.0)
        wc_gate = jnp.where(step_valid, wc_gate, 0.0)
        key = jnp.where(step_valid, key, cap * v3 + local)

    # --- 5. Scatter-add ---------------------------------------------------
    kf = key.reshape(-1)
    lk = make_likelihood_cached(cfg)

    use_segment = (cfg.pipeline.scatter_mode == "segment"
                   and label_hist is None)
    if use_segment:
        # (voxel, label) combined key must fit int32 (see config docstring).
        lab_shift = max(1, (L - 1).bit_length())
        if (n_flat << lab_shift) >= 2 ** 31:
            use_segment = False
    if use_segment:
        return _segment_scatter_apply(
            grid, cfg, key, slots, local, w, w_sdf, wc_gate, step_valid,
            labels, colors, ray_valid, touched_slots, lab_shift, lk,
            sem_points=sem_points)

    if sem_points is not None:
        # Non-segment fallback: fold the sparse votes back into per-ray
        # histograms (the hist path's semantics are identical, just slower).
        pr, pl, pv, pc = sem_points
        label_hist = jnp.zeros((key.shape[1], L), jnp.float32).at[
            pr, pl].add(jnp.where(pv, pc, 0.0), mode="drop")

    sorted_mode = cfg.pipeline.scatter_mode == "sorted"

    if sorted_mode:
        from .reduce import SortedUpdates
        su = SortedUpdates.build(kf, trash_key=-1)
        scat = lambda tgt, vals: su.apply(tgt, vals.reshape(-1))
    else:
        scat = lambda tgt, vals: tgt.at[kf].add(vals.reshape(-1))

    wsum = scat(grid.wsum.reshape(-1), w).reshape(grid.wsum.shape)
    wsdf = scat(grid.wsdf.reshape(-1), w_sdf).reshape(grid.wsdf.shape)
    wcolor = grid.wcolor
    if cfg.semantic.color_mode == ColorMode.COLOR:
        # Measured-color blending feeds the mesh only in ColorMode.COLOR
        # (semantic modes recolor from labels at mesh time) — 3 scatter
        # channels saved otherwise.
        for c in range(3):
            ch = scat(wcolor[c].reshape(-1),
                      wc_gate * colors[None, :, c]).reshape(grid.wsum.shape)
            wcolor = wcolor.at[c].set(ch)

    # Near-surface gate (opt-in, SemanticConfig.update_near_surface_only):
    # wc_gate > 0 is exactly "step in the truncation band with w > 0" in both
    # the XLA and Pallas stream layouts (w_sdf clamps to +-w*trunc outside).
    sem_step = (step_valid & (wc_gate > 0.0)
                if cfg.semantic.update_near_surface_only else step_valid)

    if label_hist is None:
        # Fast integrator: one label per ray -> scalar adds at (label, key)
        # (one-hot frequency, semantic_tsdf_integrator_fast.cpp:132-140).
        inform = semantic.informative(labels) & ray_valid
        cnt = jnp.where(sem_step & inform[None, :], 1.0, 0.0)
        sem_count = scat(grid.sem_count.reshape(-1), cnt).reshape(
            grid.sem_count.shape)
        # sem_delta layout (L, rows, V3): flat index label * row_flat + key.
        lab_b = jnp.broadcast_to(labels[None, :].astype(jnp.int32), key.shape)
        if sorted_mode:
            su2 = SortedUpdates.build(kf, trash_key=-1,
                                      secondary=lab_b.reshape(-1))
            seg_lab = su2.secondary_at_segments()
            out_idx = jnp.where(su2.out_keys >= 0,
                                seg_lab * row_flat + su2.out_keys, -1)
            sem_delta = su2.apply(grid.sem_delta.reshape(-1),
                                  cnt.reshape(-1) * lk.delta,
                                  out_index=out_idx).reshape(
                                      grid.sem_delta.shape)
        else:
            lkey = jnp.where(cnt > 0, lab_b * row_flat + key, L * row_flat)
            sem_delta = grid.sem_delta.reshape(-1).at[
                lkey.reshape(-1)].add(
                jnp.broadcast_to(jnp.float32(lk.delta), lkey.shape).reshape(-1),
                mode="drop").reshape(grid.sem_delta.shape)
    else:
        # Merged integrator: full per-ray histogram applied to every traversed
        # voxel (_merged.cpp:254-328). Unknown column contributes nothing.
        hist = label_hist.at[:, semantic.UNKNOWN_LABEL].set(0.0)
        total = jnp.sum(hist, axis=-1)                         # (R,)
        cnt = jnp.where(sem_step, total[None, :], 0.0)
        sem_count = scat(grid.sem_count.reshape(-1), cnt).reshape(
            grid.sem_count.shape)
        sem_delta = grid.sem_delta
        for lab in range(L):  # static L scatters of (S, R) scalars
            add = jnp.where(sem_step, hist[:, lab][None, :], 0.0) * lk.delta
            ch = scat(sem_delta[lab].reshape(-1), add).reshape(
                grid.wsum.shape)
            sem_delta = sem_delta.at[lab].set(ch)

    updated = grid.updated.at[touched_slots].set(True, mode="drop")

    return dataclasses.replace(
        grid, wsum=wsum, wsdf=wsdf, wcolor=wcolor,
        sem_count=sem_count, sem_delta=sem_delta, updated=updated)


def _segment_scatter_apply(grid, cfg, key, slots, local, w, w_sdf, wc_gate,
                           step_valid, labels, colors, ray_valid,
                           touched_slots, lab_shift, lk, sem_points=None):
    """"segment" scatter mode: reduce the (S, R) update stream to its unique
    (voxel, label) segments before touching the grid.

    Rationale (measured on v5e, scripts/profile_scatter_model.py): XLA TPU
    scatter costs ~11 ns per index, serially — 5.9M-entry streams cost ~65 ms
    PER CHANNEL, while the stream only contains ~10-100k unique voxels
    (100-300x duplication: many rays traverse the same near-camera voxels).
    Sort + exact segmented scan + compaction (ops/reduce.py) costs ~60 ms
    total and leaves scatters with only `segment_budget` indices.

    The signed w*sdf channel is offset to w*(sdf+trunc) >= 0 so every reduced
    channel is non-negative (keeps options open for monotone-scan variants)
    and recovered exactly afterwards: sum(w*sdf) = sum(w*(sdf+trunc))
    - trunc*sum(w).
    """
    import jax
    from .reduce import TRASH_KEY, segment_compact_reduce
    from . import semantic

    g, t = cfg.grid, cfg.tsdf
    v3, cap, L = g.vps3, g.block_capacity, g.num_labels
    n_flat = (cap + 1) * v3
    row_flat = g.padded_rows * v3
    B = cfg.pipeline.segment_budget
    trunc = t.truncation_distance

    valid_upd = step_valid & (slots < cap)
    inform = semantic.informative(labels) & ray_valid
    sem_upd = (valid_upd & (wc_gate > 0.0)
               if cfg.semantic.update_near_surface_only else valid_upd)
    cnt = jnp.where(sem_upd & inform[None, :], 1.0, 0.0)
    lab_b = jnp.broadcast_to(labels[None, :].astype(jnp.int32), key.shape)
    lab_b = jnp.clip(lab_b, 0, (1 << lab_shift) - 1)
    k2 = jnp.where(valid_upd, (key << lab_shift) | lab_b, TRASH_KEY)
    wv = jnp.where(valid_upd, w, 0.0)
    wsdf_s = jnp.where(valid_upd, w_sdf + trunc * w, 0.0)

    # max_run: a sorted stream holds at most one entry per ray per (voxel,
    # label) — DDA never revisits a voxel within a ray.
    n_rays = key.shape[1]
    frac = cfg.pipeline.stream_active_fraction
    ok, (tw, tsdf_s, tcnt), n_drop = segment_compact_reduce(
        k2.reshape(-1), (wv.reshape(-1), wsdf_s.reshape(-1),
                         cnt.reshape(-1)), B, max_run=n_rays,
        active_frac=frac)

    seg_valid = ok != TRASH_KEY
    vox = jnp.where(seg_valid, ok >> lab_shift, n_flat)    # drop at n_flat
    lab_seg = ok & ((1 << lab_shift) - 1)

    wsum = grid.wsum.reshape(-1).at[vox].add(
        tw, mode="drop", indices_are_sorted=True).reshape(grid.wsum.shape)
    wsdf = grid.wsdf.reshape(-1).at[vox].add(
        tsdf_s - trunc * tw, mode="drop",
        indices_are_sorted=True).reshape(grid.wsdf.shape)
    sem_count = grid.sem_count.reshape(-1).at[vox].add(
        tcnt, mode="drop",
        indices_are_sorted=True).reshape(grid.sem_count.shape)
    sem_key = jnp.where(seg_valid, lab_seg * row_flat + vox, L * row_flat)
    sem_delta = grid.sem_delta.reshape(-1).at[sem_key].add(
        tcnt * lk.delta, mode="drop",
        unique_indices=True).reshape(grid.sem_delta.shape)

    if sem_points is not None:
        # Per-point semantic votes riding this batch's ray geometry (merged
        # integrator, _merged.cpp:254-285 — see integrate_ray_batch doc).
        # Row-gather the (R, S)-transposed stream by each point's bundle ray
        # (row gathers carry their payload ~free; a lane-dim gather of the
        # (S, R) layout would serialize), then run the same (voxel, label)
        # segment reduction on the (P, S) point stream. With per-ray `labels`
        # uninformative the main-stream cnt above is all zeros, so sem_count/
        # sem_delta receive only the point votes.
        pr, pl, pv, pc = sem_points
        keyT = key.T                                         # (R, S) copy
        updT = sem_upd.T          # = valid_upd (& band gate if enabled)
        pkey = keyT[pr]                                      # (P, S)
        pupd = updT[pr] & (pv & semantic.informative(pl))[:, None]
        plab = jnp.clip(pl, 0, (1 << lab_shift) - 1)[:, None].astype(jnp.int32)
        k2p = jnp.where(pupd, (pkey << lab_shift) | plab, TRASH_KEY)
        pcnt = jnp.where(pupd, pc[:, None], 0.0)
        n_pts = pkey.shape[0]
        okp, (tpcnt,), n_drop_p = segment_compact_reduce(
            k2p.reshape(-1), (pcnt.reshape(-1),), B, max_run=n_pts,
            active_frac=frac)
        n_drop = n_drop + n_drop_p
        pvalid = okp != TRASH_KEY
        pvox = jnp.where(pvalid, okp >> lab_shift, n_flat)
        plab_seg = okp & ((1 << lab_shift) - 1)
        sem_count = sem_count.reshape(-1).at[pvox].add(
            tpcnt, mode="drop",
            indices_are_sorted=True).reshape(grid.sem_count.shape)
        psem_key = jnp.where(pvalid, plab_seg * row_flat + pvox, L * row_flat)
        sem_delta = sem_delta.reshape(-1).at[psem_key].add(
            tpcnt * lk.delta, mode="drop",
            unique_indices=True).reshape(grid.sem_delta.shape)

    wcolor = grid.wcolor
    if cfg.semantic.color_mode == ColorMode.COLOR:
        # Color channels keyed by voxel only (labels irrelevant): a second
        # sort pair carrying the three gated color sums.
        kv = jnp.where(valid_upd, key, TRASH_KEY)
        chans = tuple((wc_gate * colors[None, :, c]).reshape(-1)
                      for c in range(3))
        okc, tcol, n_drop_c = segment_compact_reduce(kv.reshape(-1), chans,
                                                     B, max_run=n_rays,
                                                     active_frac=frac)
        cvalid = okc != TRASH_KEY
        cvox = jnp.where(cvalid, okc, n_flat)
        for c in range(3):
            ch = wcolor[c].reshape(-1).at[cvox].add(
                tcol[c], mode="drop",
                indices_are_sorted=True).reshape(grid.wsum.shape)
            wcolor = wcolor.at[c].set(ch)
        n_drop = n_drop + n_drop_c

    updated = grid.updated.at[touched_slots].set(True, mode="drop")
    return dataclasses.replace(
        grid, wsum=wsum, wsdf=wsdf, wcolor=wcolor, sem_count=sem_count,
        sem_delta=sem_delta, updated=updated,
        overflow=grid.overflow + n_drop)


_LIKELIHOOD_CACHE = {}


def make_likelihood_cached(cfg: FusionConfig) -> semantic.Likelihood:
    key = cfg.semantic.semantic_measurement_probability
    if key not in _LIKELIHOOD_CACHE:
        _LIKELIHOOD_CACHE[key] = semantic.make_likelihood(cfg.semantic)
    return _LIKELIHOOD_CACHE[key]
