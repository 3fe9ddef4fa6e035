"""The fused per-frame voxel update: raycast -> allocate -> scatter-add.

This is the TPU-native equivalent of the reference's hot loops
(semantic_tsdf_integrator_fast.cpp:66-142 per-point/per-voxel loops and
_merged.cpp:235-328 per-bundle loop). Where the reference walks rays serially
under striped mutexes, here every (step, job) pair becomes one element of a
dense update stream that is scatter-added into the grid accumulators — all
updates are commutative, so no locks, no temp-block maps, no ordering.

TPU layout: the whole hot path is structure-of-arrays. Step-level arrays are
(S, R) with jobs in vector lanes; coordinates are three separate component
planes; grid channels put component/label axes first (grid/blocks.py). No hot
array carries a minor dimension smaller than the 128-lane tile.

Pipeline (all inside one jit):
  1. DDA-expand each JobBatch (ops/carve.py) into (S, R) update-stream planes
     (ops/pallas_kernels.py dda_job_stream on TPU; XLA scan fallback). A frame
     is a LIST of batches — e.g. full-res truncation-band jobs plus
     octave-decimated carve jobs (carve_mode == "decimated") — each with its
     own static step budget.
  2. Allocation pre-pass: compact the block keys of all batches and
     batch-insert into the block hash table (grid/hash.py) — replaces the
     reference's allocate-on-demand + temp-map merge
     (semantic_integrator_base.cpp:205-265).
  3. Slot lookup + (slot, local) flat keys; invalid entries route to a trash row.
  4. TSDF terms (ops/tsdf.py) and semantic counts (ops/semantic.py).
  5. One segment-compaction reduce over the concatenated streams, then
     scatter-add into wsum / wsdf / wcolor / sem_count / sem_delta, mark
     blocks updated for incremental meshing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import ColorMode, FusionConfig
from ..grid import blocks as gblocks
from ..grid import hash as bhash
from ..grid.blocks import VoxelGrid
from .carve import JobBatch
from . import raycast, semantic, tsdf

# Test hook: route the pallas branch through interpret mode off-TPU.
FORCE_PALLAS_INTERPRET = False


@dataclasses.dataclass
class _Stream:
    """Expanded (S, R) update-stream planes for one JobBatch."""
    keys: jnp.ndarray        # (S, R) int32 packed block keys (-1 invalid)
    local: jnp.ndarray       # (S, R) int32 in-block linear voxel index
    w: jnp.ndarray           # (S, R) f32 weight contribution
    w_sdf: jnp.ndarray       # (S, R) f32 weight * clamped sdf
    wc_gate: jnp.ndarray     # (S, R) f32 color-gated weight
    step_valid: jnp.ndarray  # (S, R) bool
    run_key: Optional[jnp.ndarray]  # (MAXR, R) int32 block-run stream (pallas)
    run_idx: Optional[jnp.ndarray]  # (S, R) int32 step -> run row (pallas)
    labels: jnp.ndarray      # (R,) int32 per-job labels
    colors: jnp.ndarray      # (R, 3) f32 per-job colors
    job_valid: jnp.ndarray   # (R,) bool
    slots: Optional[jnp.ndarray] = None  # (S, R) int32, filled by alloc pass
    key: Optional[jnp.ndarray] = None    # (S, R) int32 flat voxel key
    valid_upd: Optional[jnp.ndarray] = None  # (S, R) bool (segment mode)
    sem_upd: Optional[jnp.ndarray] = None    # (S, R) bool (segment mode)
    # Pre-fused segment-reduce inputs (cube-LUT kernel path):
    k2: Optional[jnp.ndarray] = None         # (S, R) combined (voxel, label)
    wv: Optional[jnp.ndarray] = None         # (S, R) masked w
    wsdfv: Optional[jnp.ndarray] = None      # (S, R) masked w*sdf + trunc*w
    cntv: Optional[jnp.ndarray] = None       # (S, R) semantic counts


def _use_pallas(cfg: FusionConfig) -> bool:
    import jax
    # "axon" is the TPU-tunnel platform name in some environments.
    return (cfg.pipeline.use_pallas
            and (jax.default_backend() in ("tpu", "axon")
                 or FORCE_PALLAS_INTERPRET))


def expand_jobs(cfg: FusionConfig, jobs: JobBatch, S: int) -> _Stream:
    """Stage 1: DDA-expand a JobBatch into its (S, R) update stream."""
    g, t = cfg.grid, cfg.tsdf
    vps = g.voxels_per_side
    if _use_pallas(cfg):
        from . import pallas_kernels
        keys, local, w, w_sdf, wc_gate, step_valid, run_key, run_idx = (
            pallas_kernels.dda_job_stream(
                cfg, S, jobs.origin.T, jobs.point.T, jobs.start.T,
                jobs.end.T, jobs.weight, jobs.valid,
                interpret=FORCE_PALLAS_INTERPRET))
        return _Stream(keys, local, w, w_sdf, wc_gate, step_valid,
                       run_key, run_idx, jobs.label, jobs.color, jobs.valid)

    # XLA fallback: lax.scan DDA + elementwise update terms (bit-parity with
    # the kernel — tests/test_pallas.py).
    inv = 1.0 / g.voxel_size
    voxels, step_valid = raycast.traverse_soa(jobs.start.T * inv,
                                              jobs.end.T * inv, S)
    vx, vy, vz = voxels[:, 0], voxels[:, 1], voxels[:, 2]     # (S, R) each
    step_valid = step_valid & jobs.valid[None, :]

    bx = jnp.floor_divide(vx, vps)
    by = jnp.floor_divide(vy, vps)
    bz = jnp.floor_divide(vz, vps)
    ext = g.world_extent_blocks
    keys = bhash.pack_block_coords_soa(bx, by, bz, ext)       # (S, R)
    step_valid = step_valid & bhash.in_bounds_soa(bx, by, bz, ext)
    local = ((vx - bx * vps) * vps + (vy - by * vps)) * vps + (vz - bz * vps)

    sdf = tsdf.projective_sdf_soa(jobs.origin, jobs.point, vx, vy, vz,
                                  g.voxel_size)
    w, w_sdf, color_gate = tsdf.update_terms(sdf, jobs.weight[None, :],
                                             t, g.voxel_size)
    w = jnp.where(step_valid, w, 0.0)
    w_sdf = jnp.where(step_valid, w_sdf, 0.0)
    wc_gate = jnp.where(step_valid & color_gate, w, 0.0)      # (S, R)
    return _Stream(keys, local, w, w_sdf, wc_gate, step_valid, None, None,
                   jobs.label, jobs.color, jobs.valid)


def integrate_jobs(
    grid: VoxelGrid,
    cfg: FusionConfig,
    batches: Sequence[Tuple[JobBatch, int]],   # (jobs, step budget) pairs
    shard_id: Optional[jnp.ndarray] = None,    # this shard's index (traced ok)
    num_shards: int = 1,
    ag_dest_voxels: Optional[jnp.ndarray] = None,  # (M, 3) anti-grazing dest
    ag_own_bundle: bool = False,  # batch-0 jobs may update their own dest
    ag_frames: int = 1,  # dest list/job axes split into this many frames
    sem_points: Optional[tuple] = None,  # votes riding batch 0 (see below)
    cube_origin: Optional[jnp.ndarray] = None,  # (3,) camera origin (cube LUT)
) -> VoxelGrid:
    """Apply a frame's job batches to the grid.

    `cube_origin`: camera origin(s) for the frame-cube LUT Pallas kernel
    (ops/pallas_kernels.py slot_resolve_stream) — slot resolution against a
    dense per-camera block cube instead of serial hash-lookup gathers
    (~15 ms -> ~1 ms per frame on v5e). (3,) = one shared origin; (B, 3) =
    batched frames, where every stream's ray axis must split into B equal
    per-frame chunks of whole ray tiles (each chunk resolves against its own
    frame's cube; violations fall back to the hash path). Sharded callers may
    also pass origins — ownership filtering rides the cube cells. Pass None
    to force the hash path.

    `shard_id`/`num_shards`: spatial sharding by block-hash ownership —
    entries whose block hashes to another shard are dropped here and applied
    by that shard (parallel/sharding.py ray-replication protocol, SURVEY 2c).

    `ag_dest_voxels`: the merged integrator's anti-grazing rule
    (_merged.cpp:306-313): traversed voxels that are *destination* voxels of
    other ray bundles are skipped; with `ag_own_bundle` a batch-0 job may
    still update its own destination voxel (normal pass; clearing rays and
    carve jobs never do). `ag_frames > 1` (sharded merged): the dest list
    and every stream's job axis are concatenations of ag_frames equal
    per-frame chunks; masking is per frame (frame b's steps are masked only
    by frame b's dests — the sequential reference semantics) via an int32
    per-voxel frame bitmask (ag_frames <= 32).

    `sem_points`: weighted per-(job, label) semantic votes riding batch 0's
    geometry — the merged integrator's histogram-per-bundle semantics in
    sparse form (_merged.cpp:254-285 builds hist[r][l] = #bundle points with
    label l and votes the whole hist into every traversed voxel; equivalently
    each nonzero (r, l) entry votes `count` along ray r). Arrays
    (ray_idx, labels, valid, counts) of shape (P,) — callers pre-reduce raw
    points to unique (ray, label) pairs (models/merged.py) so P stays at the
    ray budget instead of the pixel count. In "segment" scatter mode this
    rides a dedicated (voxel,label) segment reduction sharing batch 0's DDA
    (the dense (R, L) histogram scatter alternative costs ~2.9 s/frame on
    v5e — measured); other modes fold it back into a histogram. When given,
    batch 0's per-job `labels` should be uninformative (zeros).
    """
    g = cfg.grid
    vps, v3, cap, L = g.voxels_per_side, g.vps3, g.block_capacity, g.num_labels
    ext = g.world_extent_blocks

    # The staged RMW apply's row staging is sized per-frame (block_budget,
    # the flagship's frame-list contract); batched multi-frame dispatches
    # (cube_origin (B, 3)) scale the staging row budget by B (capped at
    # capacity) so they ride the Pallas RMW too instead of the plain
    # scatter tail (r5, VERDICT r4 item 3 — fast B=8 regressed vs B=1 on
    # slow-regime grid scatters; the B-scaled staging operand stays ~B x
    # block_budget x V3 bytes, still far below the 1.4 GB grid operand
    # whose bytes the slow-scatter regime charges). Sharded multi-frame
    # concatenations (ag_frames > 1) keep the plain tail.
    n_dispatch_frames = (cube_origin.shape[0]
                         if (cube_origin is not None
                             and cube_origin.ndim == 2) else 1)
    # Batched VOTE dispatches (merged B>1) stay on the plain tail: B
    # frames' votes concentrate more distinct labels per voxel than the
    # packed staging's sem_stage_ranks planes can hold (rank drops —
    # caught by tests/test_carve.py batched-vs-sequential), and the exact
    # dense alternative stages L x Kb x V3 ~ grid-sized bytes. The plain
    # tail's scatter cost amortizes over the B frames.
    staged_ok = (ag_frames == 1
                 and (n_dispatch_frames == 1 or sem_points is None))
    staged_rows = min(cap - (cap % 8),
                     cfg.pipeline.block_budget * n_dispatch_frames)

    streams = [expand_jobs(cfg, jobs, S) for jobs, S in batches]

    use_segment = cfg.pipeline.scatter_mode == "segment"
    lab_shift = max(1, (L - 1).bit_length())
    n_flat = (cap + 1) * v3   # key space: valid keys + the trash row
    if use_segment and (n_flat << lab_shift) >= 2 ** 31:
        # (voxel, label) combined key must fit int32 (see config docstring).
        use_segment = False
    have_runs = all(st.run_key is not None for st in streams)
    use_cube = False
    if (have_runs and cube_origin is not None and use_segment
            and ag_dest_voxels is None and _use_pallas(cfg)):
        from . import pallas_kernels
        use_cube = pallas_kernels.cube_lut_supported(cfg)
        # Batched streams (cube_origin (B, 3)): every stream's ray axis must
        # split into B equal per-frame chunks of whole ray tiles.
        n_cube_frames = cube_origin.shape[0] if cube_origin.ndim == 2 else 1
        if n_cube_frames > 1:
            for st in streams:
                R_s = st.local.shape[1]
                if (R_s % n_cube_frames
                        or (R_s // n_cube_frames) % pallas_kernels.TILE):
                    use_cube = False

    if num_shards > 1 and shard_id is not None:
        salt = jnp.int32(0x2545F491)
        for st in streams:
            if st.run_key is not None:
                run_owner = bhash.mix(st.run_key ^ salt) % num_shards
                st.run_key = jnp.where(run_owner == shard_id, st.run_key, -1)
            if use_cube:
                continue  # ownership filtering rides the cube LUT (-1 cells)
            owner = bhash.mix(st.keys ^ salt) % num_shards
            st.step_valid = st.step_valid & (owner == shard_id)
            st.w = jnp.where(st.step_valid, st.w, 0.0)
            st.w_sdf = jnp.where(st.step_valid, st.w_sdf, 0.0)
            st.wc_gate = jnp.where(st.step_valid, st.wc_gate, 0.0)

    # --- 2+3. Block allocation pre-pass + slot lookup ---------------------
    if have_runs:
        # Run-compacted hash ops: ~vps x fewer random accesses (SURVEY 7c;
        # measured 800 ms -> ~30 ms per frame on v5e).
        alloc_keys = jnp.concatenate(
            [st.run_key.reshape(-1) for st in streams])
        alloc_active = alloc_keys >= 0
    else:
        # Step-level path (XLA fallback): consecutive-dedup the insert stream.
        parts, acts = [], []
        for st in streams:
            changed = jnp.ones(st.keys.shape, dtype=bool)
            changed = changed.at[1:].set(st.keys[1:] != st.keys[:-1])
            parts.append(st.keys.reshape(-1))
            acts.append((st.step_valid & changed).reshape(-1))
        alloc_keys = jnp.concatenate(parts)
        alloc_active = jnp.concatenate(acts)

    tk, ts_, bc, nb, ov = bhash.insert_compacted(
        grid.table_keys, grid.table_slots, grid.block_coords,
        grid.n_blocks, alloc_keys, alloc_active, g.table_size, cap, ext)
    grid = dataclasses.replace(
        grid, table_keys=tk, table_slots=ts_, block_coords=bc,
        n_blocks=nb, overflow=grid.overflow + ov)

    touched = []
    if use_cube:
        from . import pallas_kernels
        cube_vals, cam_block = frame_cube(grid, cfg, cube_origin,
                                          shard_id, num_shards)
        gate_near = cfg.semantic.update_near_surface_only
        for st in streams:
            inform = semantic.informative(st.labels) & st.job_valid
            (k2, w_m, wsdf_off, cnt, key, vu, run_slots) = (
                pallas_kernels.slot_resolve_stream(
                    cfg, cube_vals, cam_block, st.run_key, st.run_idx,
                    st.local, st.w, st.w_sdf, st.wc_gate, st.step_valid,
                    st.labels, inform, lab_shift, gate_near,
                    interpret=FORCE_PALLAS_INTERPRET))
            st.k2, st.wv, st.wsdfv, st.cntv = k2, w_m, wsdf_off, cnt
            st.key, st.valid_upd = key, vu
            st.sem_upd = vu & (st.wc_gate > 0.0) if gate_near else vu
            touched.append(jnp.where(run_slots >= 0, run_slots,
                                     cap).reshape(-1))
        touched_slots = jnp.concatenate(touched)
        return _segment_scatter_apply(
            grid, cfg, streams, touched_slots, lab_shift,
            make_likelihood_cached(cfg), sem_points=sem_points,
            staged_ok=staged_ok, staged_rows=staged_rows)

    if have_runs:
        lut = bhash.lookup(grid.table_keys, grid.table_slots, alloc_keys,
                           g.table_size)
        off = 0
        for st in streams:
            n = st.run_key.size
            run_slots = lut[off:off + n].reshape(st.run_key.shape)
            off += n
            active = st.run_key >= 0
            run_slots = jnp.where(active & (run_slots >= 0), run_slots, cap)
            # Broadcast run slots back to steps: select-sum over the MAXR
            # planes (vector ops only — no step-level gather).
            slots = jnp.zeros(st.keys.shape, dtype=jnp.int32)
            for p in range(st.run_key.shape[0]):
                slots = slots + jnp.where(st.run_idx == p,
                                          run_slots[p][None, :], 0)
            st.slots = jnp.where(st.step_valid, slots, cap)
            touched.append(run_slots.reshape(-1))
    else:
        for st in streams:
            slots = bhash.lookup(grid.table_keys, grid.table_slots,
                                 st.keys.reshape(-1), g.table_size
                                 ).reshape(st.keys.shape)
            st.slots = jnp.where(st.step_valid & (slots >= 0), slots, cap)
            touched.append(st.slots.reshape(-1))
    touched_slots = jnp.concatenate(touched)

    for st in streams:
        st.key = st.slots * v3 + st.local                     # flat voxel key

    if ag_dest_voxels is not None:
        # Anti-grazing (_merged.cpp:306-313): dest voxels of this frame's
        # bundles, as flat keys (they were just allocated above).
        dblock, dlin = gblocks.voxel_to_block_local(ag_dest_voxels, vps)
        dslots = gblocks.lookup_slots(grid, dblock, g)
        dkey = jnp.where(dslots < cap, dslots * v3 + dlin, n_flat)
        if ag_frames > 1:
            # Multi-frame streams (sharded merged, parallel/sharding.py):
            # the reference's rule is PER FRAME — frame b's rays are masked
            # only by frame b's own bundle destinations (sequential
            # semantics). Every stream's job axis and the dest list split
            # into ag_frames equal chunks (the all_gather concatenation), so
            # a per-voxel frame *bitmask* applies each chunk's dests to
            # exactly its own chunk's traversal steps. Bundle dests are
            # unique voxels within a frame (bins ARE dest voxels), so the
            # scatter-add below is an exact bitwise OR.
            assert ag_frames <= 32, "anti-grazing frame bitmask is int32"
            M = dkey.shape[0]
            dframe = jnp.arange(M, dtype=jnp.int32) // (M // ag_frames)
            bits = jnp.zeros((n_flat + 1,), dtype=jnp.int32).at[dkey].add(
                jnp.left_shift(jnp.int32(1), dframe), mode="drop")
            for bi, st in enumerate(streams):
                R_s = st.key.shape[1]
                jframe = (jnp.arange(R_s, dtype=jnp.int32)
                          // (R_s // ag_frames))
                hit = jnp.not_equal(
                    jnp.right_shift(bits[st.key], jframe[None, :]) & 1, 0)
                if ag_own_bundle and bi == 0:
                    hit = hit & (st.key != dkey[None, :R_s])
                st.step_valid = st.step_valid & ~hit
                st.w = jnp.where(st.step_valid, st.w, 0.0)
                st.w_sdf = jnp.where(st.step_valid, st.w_sdf, 0.0)
                st.wc_gate = jnp.where(st.step_valid, st.wc_gate, 0.0)
                st.key = jnp.where(st.step_valid, st.key,
                                   cap * v3 + st.local)
        else:
            dest_mask = jnp.zeros((n_flat + 1,), dtype=bool).at[dkey].set(
                True, mode="drop")
            for bi, st in enumerate(streams):
                hit = dest_mask[st.key]
                if ag_own_bundle and bi == 0:
                    hit = hit & (st.key != dkey[None, :st.key.shape[1]])
                st.step_valid = st.step_valid & ~hit
                st.w = jnp.where(st.step_valid, st.w, 0.0)
                st.w_sdf = jnp.where(st.step_valid, st.w_sdf, 0.0)
                st.wc_gate = jnp.where(st.step_valid, st.wc_gate, 0.0)
                st.key = jnp.where(st.step_valid, st.key,
                                   cap * v3 + st.local)

    # --- 5. Scatter-add ---------------------------------------------------
    lk = make_likelihood_cached(cfg)
    if use_segment:
        return _segment_scatter_apply(
            grid, cfg, streams, touched_slots, lab_shift, lk,
            sem_points=sem_points, staged_ok=staged_ok,
            staged_rows=staged_rows)
    return _plain_scatter_apply(grid, cfg, streams, touched_slots, lk,
                                sem_points=sem_points)


def frame_cube(grid: VoxelGrid, cfg: FusionConfig, origin: jnp.ndarray,
               shard_id=None, num_shards: int = 1):
    """Build the frame's dense block->slot cube LUT around the camera block.

    ~side^3 (< 8k) hash probes once per frame replace per-entry lookups over
    the whole run stream (see slot_resolve_stream). Cells that are missing,
    out of world bounds, or owned by another shard hold -1.

    `origin` may be (3,) for one frame or (B, 3) for a batched stream (one
    cube per frame); returns (vals (B, pad) f32, cam_block (B, 3) int32).
    """
    from . import pallas_kernels
    g = cfg.grid
    E, side, pad = pallas_kernels.cube_geometry(cfg)
    if origin.ndim == 1:
        origin = origin[None, :]
    B = origin.shape[0]
    ob = jnp.floor(origin / g.block_size).astype(jnp.int32)      # (B, 3)
    r = jnp.arange(side, dtype=jnp.int32) - E
    ox, oy, oz = jnp.meshgrid(r, r, r, indexing="ij")
    rel = jnp.stack([ox, oy, oz], axis=-1).reshape(-1, 3)        # (side^3, 3)
    coords = rel[None, :, :] + ob[:, None, :]                    # (B, s^3, 3)
    inb = bhash.in_bounds(coords, g.world_extent_blocks)
    keys = bhash.pack_block_coords(
        jnp.clip(coords, -g.world_extent_blocks, g.world_extent_blocks - 1),
        g.world_extent_blocks)
    keys = jnp.where(inb, keys, -3)  # never matches a stored key
    slots = bhash.lookup(grid.table_keys, grid.table_slots, keys,
                         g.table_size)
    good = inb & (slots >= 0)
    if num_shards > 1 and shard_id is not None:
        owner = bhash.mix(keys ^ jnp.int32(0x2545F491)) % num_shards
        good = good & (owner == shard_id)
    vals = jnp.where(good, slots.astype(jnp.float32), -1.0)
    vals = jnp.pad(vals, ((0, 0), (0, pad - side ** 3)),
                   constant_values=-1.0)
    return vals, ob


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
    **kw,
) -> VoxelGrid:
    """Round-1 entry: one full-traversal ray batch with voxblox extents
    (raycast.py setup_rays semantics). Extra kwargs pass to integrate_jobs."""
    from .carve import full_jobs
    origin = jnp.broadcast_to(origin, points_G.shape)
    jobs = full_jobs(origin, points_G, weights, labels, colors, is_clearing,
                     ray_valid, cfg)
    return integrate_jobs(grid, cfg, [(jobs, cfg.resolved_max_steps())], **kw)


def _plain_scatter_apply(grid, cfg, streams, touched_slots, lk,
                         sem_points=None):
    """"direct"/"sorted" scatter modes (debug baselines; mathematically
    identical to "segment")."""
    g, L = cfg.grid, cfg.grid.num_labels
    v3, cap = g.vps3, g.block_capacity
    row_flat = g.padded_rows * v3

    kf = jnp.concatenate([st.key.reshape(-1) for st in streams])
    wf = jnp.concatenate([st.w.reshape(-1) for st in streams])
    wsdff = jnp.concatenate([st.w_sdf.reshape(-1) for st in streams])

    sorted_mode = cfg.pipeline.scatter_mode == "sorted"
    if sorted_mode:
        from .reduce import SortedUpdates
        su = SortedUpdates.build(kf, trash_key=-1)
        scat = lambda tgt, vals: su.apply(tgt, vals)
    else:
        scat = lambda tgt, vals: tgt.at[kf].add(vals)

    wsum = scat(grid.wsum.reshape(-1), wf).reshape(grid.wsum.shape)
    wsdf = scat(grid.wsdf.reshape(-1), wsdff).reshape(grid.wsdf.shape)
    wcolor = grid.wcolor
    if cfg.semantic.color_mode == ColorMode.COLOR:
        # Measured-color blending feeds the mesh only in ColorMode.COLOR
        # (semantic modes recolor from labels at mesh time) — 3 scatter
        # channels saved otherwise.
        for c in range(3):
            vals = jnp.concatenate(
                [(st.wc_gate * st.colors[None, :, c]).reshape(-1)
                 for st in streams])
            ch = scat(wcolor[c].reshape(-1), vals).reshape(grid.wsum.shape)
            wcolor = wcolor.at[c].set(ch)

    # Near-surface gate (opt-in, SemanticConfig.update_near_surface_only):
    # wc_gate > 0 is exactly "step in the truncation band with w > 0" in both
    # the XLA and Pallas stream layouts (w_sdf clamps to +-w*trunc outside).
    def sem_step(st):
        return (st.step_valid & (st.wc_gate > 0.0)
                if cfg.semantic.update_near_surface_only else st.step_valid)

    label_hist = None
    if sem_points is not None:
        # Fold the sparse votes back into per-ray histograms for batch 0
        # (the hist path's semantics are identical, just slower).
        pr, pl, pv, pc = sem_points
        label_hist = jnp.zeros((streams[0].key.shape[1], L), jnp.float32).at[
            pr, pl].add(jnp.where(pv, pc, 0.0), mode="drop")

    # Per-stream semantic accumulation (one label per job, or batch-0 hist).
    sem_count = grid.sem_count
    sem_delta = grid.sem_delta
    for bi, st in enumerate(streams):
        ss = sem_step(st)
        kfs = st.key.reshape(-1)
        if sorted_mode:
            from .reduce import SortedUpdates
            sus = SortedUpdates.build(kfs, trash_key=-1)
            scs = lambda tgt, vals: sus.apply(tgt, vals.reshape(-1))
        else:
            scs = lambda tgt, vals: tgt.at[kfs].add(vals.reshape(-1))
        if bi == 0 and label_hist is not None:
            # Merged integrator: full per-ray histogram applied to every
            # traversed voxel (_merged.cpp:254-328). Unknown contributes 0.
            hist = label_hist.at[:, semantic.UNKNOWN_LABEL].set(0.0)
            total = jnp.sum(hist, axis=-1)                    # (R,)
            cnt = jnp.where(ss, total[None, :], 0.0)
            sem_count = scs(sem_count.reshape(-1), cnt).reshape(
                grid.sem_count.shape)
            for lab in range(L):  # static L scatters of (S, R) scalars
                add = jnp.where(ss, hist[:, lab][None, :], 0.0) * lk.delta
                ch = scs(sem_delta[lab].reshape(-1), add).reshape(
                    grid.wsum.shape)
                sem_delta = sem_delta.at[lab].set(ch)
            continue
        # One label per job -> scalar adds at (label, key) (one-hot
        # frequency, semantic_tsdf_integrator_fast.cpp:132-140).
        inform = semantic.informative(st.labels) & st.job_valid
        cnt = jnp.where(ss & inform[None, :], 1.0, 0.0)
        sem_count = scs(sem_count.reshape(-1), cnt).reshape(
            grid.sem_count.shape)
        lab_b = jnp.broadcast_to(st.labels[None, :].astype(jnp.int32),
                                 st.key.shape)
        if sorted_mode:
            from .reduce import SortedUpdates
            su2 = SortedUpdates.build(kfs, trash_key=-1,
                                      secondary=lab_b.reshape(-1))
            seg_lab = su2.secondary_at_segments()
            out_idx = jnp.where(su2.out_keys >= 0,
                                seg_lab * row_flat + su2.out_keys, -1)
            sem_delta = su2.apply(sem_delta.reshape(-1),
                                  cnt.reshape(-1) * lk.delta,
                                  out_index=out_idx).reshape(
                                      grid.sem_delta.shape)
        else:
            lkey = jnp.where(cnt > 0, lab_b * row_flat + st.key, L * row_flat)
            sem_delta = sem_delta.reshape(-1).at[
                lkey.reshape(-1)].add(
                jnp.broadcast_to(jnp.float32(lk.delta), lkey.shape).reshape(-1),
                mode="drop").reshape(grid.sem_delta.shape)

    updated = grid.updated.at[touched_slots].set(True, mode="drop")
    return dataclasses.replace(
        grid, wsum=wsum, wsdf=wsdf, wcolor=wcolor,
        sem_count=sem_count, sem_delta=sem_delta, updated=updated)


def _segment_scatter_apply(grid, cfg, streams, touched_slots, lab_shift, lk,
                           sem_points=None, staged_ok=True,
                           staged_rows=None):
    """"segment" scatter mode: reduce the concatenated (S, R) update streams
    to their unique (voxel, label) segments before touching the grid.

    Rationale (measured on v5e, scripts/profile_scatter_model.py): XLA TPU
    scatter costs ~11 ns per index, serially — multi-million-entry streams
    cost ~65 ms PER CHANNEL, while a stream only contains ~10-100k unique
    voxels (many jobs traverse the same voxels). Sort + exact segmented scan
    + compaction (ops/reduce.py) costs vector passes + two duplicate-heavy
    sorts and leaves scatters with only `segment_budget` indices.

    The signed w*sdf channel is offset to w*(sdf+trunc) >= 0 so every reduced
    channel is non-negative (keeps options open for monotone-scan variants)
    and recovered exactly afterwards: sum(w*sdf) = sum(w*(sdf+trunc))
    - trunc*sum(w).
    """
    from .reduce import TRASH_KEY, segment_compact_reduce

    g, t = cfg.grid, cfg.tsdf
    v3, cap, L = g.vps3, g.block_capacity, g.num_labels
    n_flat = (cap + 1) * v3
    row_flat = g.padded_rows * v3
    B = cfg.pipeline.segment_budget
    trunc = t.truncation_distance
    frac = cfg.pipeline.stream_active_fraction

    k2s, wvs, wsdfs, cnts = [], [], [], []
    n_jobs_total = 0
    for st in streams:
        if st.k2 is not None:
            # Cube-LUT kernel path: reduce inputs pre-fused on device.
            k2s.append(st.k2.reshape(-1))
            wvs.append(st.wv.reshape(-1))
            wsdfs.append(st.wsdfv.reshape(-1))
            cnts.append(st.cntv.reshape(-1))
            n_jobs_total += st.key.shape[1]
            continue
        valid_upd = st.step_valid & (st.slots < cap)
        inform = semantic.informative(st.labels) & st.job_valid
        sem_upd = (valid_upd & (st.wc_gate > 0.0)
                   if cfg.semantic.update_near_surface_only else valid_upd)
        st.sem_upd = sem_upd
        st.valid_upd = valid_upd
        cnt = jnp.where(sem_upd & inform[None, :], 1.0, 0.0)
        lab_b = jnp.broadcast_to(st.labels[None, :].astype(jnp.int32),
                                 st.key.shape)
        lab_b = jnp.clip(lab_b, 0, (1 << lab_shift) - 1)
        k2s.append(jnp.where(valid_upd, (st.key << lab_shift) | lab_b,
                             TRASH_KEY).reshape(-1))
        wvs.append(jnp.where(valid_upd, st.w, 0.0).reshape(-1))
        wsdfs.append(jnp.where(valid_upd, st.w_sdf + trunc * st.w,
                               0.0).reshape(-1))
        cnts.append(cnt.reshape(-1))
        n_jobs_total += st.key.shape[1]

    # max_run: a sorted stream holds at most one entry per job per (voxel,
    # label) — DDA never revisits a voxel within a job.
    ok, (tw, tsdf_s, tcnt), n_drop = segment_compact_reduce(
        jnp.concatenate(k2s), (jnp.concatenate(wvs), jnp.concatenate(wsdfs),
                               jnp.concatenate(cnts)), B,
        max_run=n_jobs_total, active_frac=frac)

    # Merged-integrator per-point votes: reduce to (voxel, label) sums first
    # (shared by both apply forms below).
    pvotes = None
    if sem_points is not None:
        pr, pl_, pv, pc = sem_points
        st0 = streams[0]
        keyT = st0.key.T                                     # (R, S) copy
        updT = st0.sem_upd.T      # = valid_upd (& band gate if enabled)
        pkey = keyT[pr]                                      # (P, S)
        pupd = updT[pr] & (pv & semantic.informative(pl_))[:, None]
        plab = jnp.clip(pl_, 0, (1 << lab_shift) - 1)[:, None].astype(
            jnp.int32)
        k2p = jnp.where(pupd, (pkey << lab_shift) | plab, TRASH_KEY)
        pcnt = jnp.where(pupd, pc[:, None], 0.0)
        n_pts = pkey.shape[0]
        okp, (tpcnt,), n_drop_p = segment_compact_reduce(
            k2p.reshape(-1), (pcnt.reshape(-1),), B, max_run=n_pts,
            active_frac=frac)
        n_drop = n_drop + n_drop_p
        pvotes = (okp, tpcnt)

    with_color = cfg.semantic.color_mode == ColorMode.COLOR
    csegs = None
    if with_color:
        # Color channels keyed by voxel only (labels irrelevant): a second
        # sort pair carrying the three gated color sums.
        kv = jnp.concatenate(
            [jnp.where(st.valid_upd, st.key, TRASH_KEY).reshape(-1)
             for st in streams])
        chans = tuple(jnp.concatenate(
            [(st.wc_gate * st.colors[None, :, c]).reshape(-1)
             for st in streams]) for c in range(3))
        okc, tcol, n_drop_c = segment_compact_reduce(kv, chans, B,
                                                     max_run=n_jobs_total,
                                                     active_frac=frac)
        n_drop = n_drop + n_drop_c
        csegs = (okc, tcol)

    if staged_rows is None:
        staged_rows = cfg.pipeline.block_budget
    v3_tiled = (g.vps3 % 128 == 0
                and (g.vps3 <= 8192 or g.vps3 % 8192 == 0)
                and staged_rows % 8 == 0)
    if staged_ok and cfg.pipeline.staged_apply and v3_tiled \
            and _use_pallas(cfg):
        return _staged_segment_apply(
            grid, cfg, ok, (tw, tsdf_s, tcnt), touched_slots, lab_shift, lk,
            n_drop, pvotes=pvotes, csegs=csegs, Kb=staged_rows)

    seg_valid = ok != TRASH_KEY
    vox = jnp.where(seg_valid, ok >> lab_shift, n_flat)    # drop at n_flat
    lab_seg = ok & ((1 << lab_shift) - 1)

    # NB (r3, measured): do NOT fuse these three scatters into one
    # (3, flat) payload scatter + dense adds — the axis-1 window scatter
    # lowers WORSE on TPU (+11 ms/dispatch at budget 2^17) than three
    # budget walks plus nothing. Separate per-channel scatters with sorted
    # unique indices are the fast form.
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

    if pvotes is not None:
        # Per-point semantic votes riding batch 0's geometry (merged
        # integrator, _merged.cpp:254-285 — reduced to (voxel, label) sums
        # above). With per-job `labels` uninformative the batch-0 cnt above
        # is all zeros, so sem_count/sem_delta receive only the point votes.
        okp, tpcnt = pvotes
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
    if csegs is not None:
        okc, tcol = csegs
        cvalid = okc != TRASH_KEY
        cvox = jnp.where(cvalid, okc, n_flat)
        for c in range(3):
            ch = wcolor[c].reshape(-1).at[cvox].add(
                tcol[c], mode="drop",
                indices_are_sorted=True).reshape(grid.wsum.shape)
            wcolor = wcolor.at[c].set(ch)

    updated = grid.updated.at[touched_slots].set(True, mode="drop")
    return dataclasses.replace(
        grid, wsum=wsum, wsdf=wsdf, wcolor=wcolor, sem_count=sem_count,
        sem_delta=sem_delta, updated=updated,
        overflow=grid.overflow + n_drop)


def _staged_segment_apply(grid, cfg, ok, sums, touched_slots, lab_shift, lk,
                          n_drop, pvotes=None, csegs=None, Kb=None):
    """Apply compacted (voxel, label) segments via the aliased Pallas RMW
    kernel instead of XLA grid scatters.

    Motivation (r4, measured — scripts/profile_{scatter,semd}_r4.py): once
    any hash-probe while_loop program (grid/hash.py lookup/insert) has
    executed on this TPU runtime, every later XLA scatter in the process
    runs in a slow mode costing roughly operand-bytes / 100 GB/s — the
    (L, rows, V3) sem_delta scatter alone is ~17.8 ms/frame, making the
    reduce+scatter stage 22.5 of fast-B=1's 26.5 ms. The Pallas
    aliased-RMW path is immune (the flagship applies the full grid in
    ~1.3 ms), so the band apply stages compact deltas on the frame's
    touched-row domain (block_budget rows, group-aligned exactly like
    grid/hash.py insert_frame_list) and rides block_rmw_add:

      1. segments arrive sorted by (voxel << lab_shift | label), i.e. by
         slot: rank slot TILE GROUPS (slot // 8) in appearance order ->
         row pos = group_rank * 8 + slot % 8 (vector ops, no hash probes);
      2. scatters into the small staging buffers build dense deltas —
         w/wsdf/cnt as a packed (budget, 4) row scatter into
         (block_budget * V3, 4), semantic votes as ONE scatter into a dense
         (L * block_budget * V3) staging keyed by (label, row) — exact for
         any per-voxel label multiplicity (slow-mode scatter cost scales
         with THESE operands, not the 1.4 GB grid);
      3. ONE aliased block_rmw_add (sem_dense mode) applies everything.

    Blocks beyond the block_budget row list are dropped and counted in
    grid.overflow (the same fixed-capacity contract as the flagship's
    frame list).

    `pvotes`/`csegs`: the merged integrator's reduced (voxel, label) vote
    sums and the COLOR-mode per-voxel color sums — they join the same
    staging (their voxels ride batch-0 geometry, so their tile groups are
    already ranked).
    """
    from .pallas_kernels import block_rmw_add
    from .reduce import TRASH_KEY

    g, t = cfg.grid, cfg.tsdf
    v3, cap, L = g.vps3, g.block_capacity, g.num_labels
    n_flat = (cap + 1) * v3
    if Kb is None:
        Kb = cfg.pipeline.block_budget   # single-frame staging rows
    n_tiles = Kb // 8
    trash_group = cap // 8
    trunc = t.truncation_distance
    tw, tsdf_s, tcnt = sums

    seg_valid = ok != TRASH_KEY
    vox = jnp.where(seg_valid, ok >> lab_shift, n_flat)
    lab = ok & ((1 << lab_shift) - 1)
    slot = vox // v3
    local = vox % v3
    grp = slot // 8

    # 1. Tile-group ranking over the sorted segment list.
    newg = seg_valid & jnp.concatenate(
        [jnp.ones((1,), bool), grp[1:] != grp[:-1]])
    grank = jnp.cumsum(newg.astype(jnp.int32)) - 1
    pos = jnp.where(seg_valid, grank * 8 + slot % 8, Kb)
    group_overflow = jnp.sum(((pos >= Kb) & seg_valid).astype(jnp.int32))
    rvox = jnp.where(pos < Kb, pos * v3 + local, Kb * v3)  # OOB => dump row
    tile_idx = jnp.where(newg & (grank < n_tiles), grank, n_tiles)
    tile_groups = jnp.full((n_tiles,), trash_group, jnp.int32).at[
        tile_idx].set(grp, mode="drop")
    row = jnp.arange(Kb, dtype=jnp.int32) % 8
    fslots = jnp.repeat(tile_groups, 8) * 8 + row

    # Group -> rank LUT for the vote/color side lists (their voxels ride the
    # same streams, so their groups are present unless budget-dropped).
    glut = jnp.full((cap // 8 + 2,), n_tiles, jnp.int32).at[
        jnp.where(newg & (grank < n_tiles), grp, cap // 8 + 1)].set(
        grank, mode="drop")

    # 2. Staging scatters (fresh zero buffers, group-aligned row domain).
    wsdf_val = tsdf_s - trunc * tw
    pay0 = jnp.stack([tw, wsdf_val, tcnt, jnp.zeros_like(tw)], axis=1)
    st0 = jnp.zeros((Kb * v3 + 1, 4), jnp.float32).at[rvox].add(
        pay0, mode="drop", indices_are_sorted=True)

    # Packed rank planes encode (count * 32 + label); the kernel decode
    # (pallas_kernels.py _rmw_kernel) uses the fixed 32 stride, so labels
    # must fit below it — wider label sets (num_labels > 32 is runtime
    # configurable, config.py) force dense staging (ADVICE r4).
    packed = (cfg.pipeline.sem_stage_mode == "packed"
              and (1 << lab_shift) <= 32)
    P = cfg.pipeline.sem_stage_ranks if packed else L
    rank_drop = jnp.int32(0)
    # Packed exactness also needs count * 32 + label < 2^24 (both factors
    # integral in f32), i.e. count < 2^19. Counts that large are impossible
    # at current stream budgets (S*R << 2^19 per (voxel, label) per frame)
    # but nothing structural forbids them: clamp and count the loss.
    _CNT_MAX = float(2 ** 19 - 1)

    def clamp_cnt(c, drop):
        over = jnp.sum((c > _CNT_MAX).astype(jnp.int32))
        return jnp.minimum(c, _CNT_MAX), drop + over

    def label_ranks(vx, valid, cnt, lb):
        """Per-voxel rank among nonzero-cnt pairs of a (voxel,label)-sorted
        list (packed mode): rank = #preceding same-voxel nonzero pairs."""
        has = valid & (cnt > 0.0) & (lb < L)
        hi = has.astype(jnp.int32)
        c = jnp.cumsum(hi)
        newv = jnp.concatenate([jnp.ones((1,), bool), vx[1:] != vx[:-1]])
        base = jax.lax.cummax(jnp.where(newv, c - hi, jnp.int32(-1)))
        return jnp.where(has, c - hi - base, -1), has

    if packed:
        # P rank planes of (count * 32 + label) packed f32: each (rank,
        # voxel) slot has exactly ONE contributor, so the add-to-zero
        # scatter IS a set and the packing survives. Exact while
        # count < 2^19 (product < 2^24).
        rank, has = label_ranks(vox, seg_valid, tcnt, lab)
        rank_drop = jnp.sum((rank >= P).astype(jnp.int32))
        tcnt_p, rank_drop = clamp_cnt(tcnt, rank_drop)
        pidx = jnp.where(has & (rank >= 0) & (rank < P) & (pos < Kb),
                         rank * (Kb * v3) + rvox, P * (Kb * v3))
        st_sem = jnp.zeros((P * Kb * v3 + 1,), jnp.float32).at[pidx].add(
            tcnt_p * 32.0 + lab.astype(jnp.float32), mode="drop")
    else:
        sem_idx = jnp.where((pos < Kb) & seg_valid & (lab < L),
                            lab * (Kb * v3) + rvox, P * (Kb * v3))
        st_sem = jnp.zeros((P * Kb * v3 + 1,), jnp.float32).at[sem_idx].add(
            tcnt, mode="drop")

    vote_drop = jnp.int32(0)
    if pvotes is not None:
        okp, tpcnt = pvotes
        pvalid = okp != TRASH_KEY
        pvox = jnp.where(pvalid, okp >> lab_shift, n_flat)
        plab = okp & ((1 << lab_shift) - 1)
        pslot = pvox // v3
        pg = glut[jnp.minimum(pslot // 8, cap // 8 + 1)]
        ppos = jnp.where(pvalid & (pg < n_tiles), pg * 8 + pslot % 8, Kb)
        prvox = ppos * v3 + pvox % v3
        vote_drop = jnp.sum((pvalid & (tpcnt > 0)
                             & (ppos >= Kb)).astype(jnp.int32))
        if packed:
            # Vote ranks are independent of the main pairs: votes only
            # appear when per-job labels are uninformative (cnt == 0), so
            # the main list occupies no rank slots.
            prank, phas = label_ranks(pvox, pvalid, tpcnt, plab)
            rank_drop = rank_drop + jnp.sum((prank >= P).astype(jnp.int32))
            tpcnt_p, rank_drop = clamp_cnt(tpcnt, rank_drop)
            ppidx = jnp.where(phas & (prank >= 0) & (prank < P)
                              & (ppos < Kb),
                              prank * (Kb * v3) + prvox, P * (Kb * v3))
            st_sem = st_sem.at[ppidx].add(
                tpcnt_p * 32.0 + plab.astype(jnp.float32), mode="drop")
        else:
            psem_idx = jnp.where((ppos < Kb) & pvalid & (plab < L),
                                 plab * (Kb * v3) + prvox, P * (Kb * v3))
            st_sem = st_sem.at[psem_idx].add(tpcnt, mode="drop")
        # Vote counts also land in sem_count (via the kernel's d_cnt), same
        # as the unstaged tail: stage them into st0's cnt column.
        vpay = jnp.stack([jnp.zeros_like(tpcnt), jnp.zeros_like(tpcnt),
                          tpcnt, jnp.zeros_like(tpcnt)], axis=1)
        # indices_are_sorted holds by a cross-function invariant (ADVICE
        # r4): segment_compact_reduce emits ascending (voxel, label) keys
        # and truncates only the ascending TAIL past the budget, so
        # budget-dropped groups are always the highest slots; redirecting
        # them to the dump index Kb*v3 (the maximum) keeps the index list
        # monotone. Same reasoning at the color staging scatter below.
        st0 = st0.at[jnp.where(ppos < Kb, prvox, Kb * v3)].add(
            vpay, mode="drop", indices_are_sorted=True)

    d_w = st0[:Kb * v3, 0].reshape(Kb, v3)
    d_wsdf = st0[:Kb * v3, 1].reshape(Kb, v3)
    d_cnt = st0[:Kb * v3, 2].reshape(Kb, v3)
    d_sem = st_sem[:P * Kb * v3].reshape(P, Kb, v3)

    color_drop = jnp.int32(0)
    if csegs is not None:
        okc, tcol = csegs
        cvalid = okc != TRASH_KEY
        cvox = jnp.where(cvalid, okc, n_flat)
        cslot = cvox // v3
        cg = glut[jnp.minimum(cslot // 8, cap // 8 + 1)]
        cpos = jnp.where(cvalid & (cg < n_tiles), cg * 8 + cslot % 8, Kb)
        crvox = jnp.where(cpos < Kb, cpos * v3 + cvox % v3, Kb * v3)
        color_drop = jnp.sum((cvalid & (cpos >= Kb)).astype(jnp.int32))
        cpay = jnp.stack([tcol[0], tcol[1], tcol[2],
                          jnp.zeros_like(tcol[0])], axis=1)
        stc = jnp.zeros((Kb * v3 + 1, 4), jnp.float32).at[crvox].add(
            cpay, mode="drop", indices_are_sorted=True)
        d_wc = jnp.transpose(stc[:Kb * v3, :3].reshape(Kb, v3, 3), (0, 2, 1))
    else:
        d_wc = jnp.zeros((Kb, 3, v3), jnp.float32)

    wsum, wsdf, sem_count, sem_delta, wcolor = block_rmw_add(
        grid.wsum, grid.wsdf, grid.sem_count, grid.sem_delta, grid.wcolor,
        fslots, d_w, d_wsdf, d_cnt, None, d_wc, lk_delta=lk.delta,
        interpret=FORCE_PALLAS_INTERPRET, d_sem=d_sem,
        sem_packed_ranks=P if packed else 0)

    updated = grid.updated.at[touched_slots].set(True, mode="drop")
    return dataclasses.replace(
        grid, wsum=wsum, wsdf=wsdf, wcolor=wcolor, sem_count=sem_count,
        sem_delta=sem_delta, updated=updated,
        overflow=(grid.overflow + n_drop + group_overflow + rank_drop
                  + vote_drop + color_drop))


_LIKELIHOOD_CACHE = {}


def make_likelihood_cached(cfg: FusionConfig) -> semantic.Likelihood:
    key = cfg.semantic.semantic_measurement_probability
    if key not in _LIKELIHOOD_CACHE:
        _LIKELIHOOD_CACHE[key] = semantic.make_likelihood(cfg.semantic)
    return _LIKELIHOOD_CACHE[key]
