"""Spatial sharding of the voxel grid across a TPU device mesh.

The volumetric analogue of context parallelism (SURVEY 5.7 / 2c): the block
hash table is sharded by block-key hash across the `grid` mesh axis; every
device owns ~1/D of the blocks (hash ownership gives load balance for free —
no spatial hot spots). Incoming frames are data-parallel (one frame per device,
config 5 of BASELINE.json); each device backprojects its own frame, then the
prepared ray batches ride one `all_gather` over ICI so every shard can apply
the updates that land in blocks it owns. Updates themselves are the same
commutative scatter-adds as single-chip (ops/integrate.py shard filter) — no
halo state is ever exchanged, because *rays* are replicated to the shards they
touch instead of block contents (SURVEY 7 hard part e).

Replaces: the reference's ROS pub/sub fan-out + single-process thread pool
(kimera_semantics_ros; SURVEY 2c "Distributed communication backend").
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import FusionConfig
from ..core.camera import PinholeIntrinsics
from ..grid import blocks as gblocks
from ..grid.blocks import VoxelGrid
from ..models import common
from ..ops import dedup as dedup_ops
from ..ops.integrate import integrate_jobs

AXIS = "grid"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=(AXIS,))


def create_sharded(cfg: FusionConfig, mesh: Mesh):
    """A stack of per-device grid shards, leading axis sharded over the mesh."""
    d = mesh.devices.size

    @partial(jax.jit, out_shardings=jax.NamedSharding(mesh, P(AXIS)))
    def init():
        grid = gblocks.create(cfg)
        return jax.tree.map(lambda x: jnp.broadcast_to(x[None], (d,) + x.shape),
                            grid)

    return init()


@partial(jax.jit, static_argnames=("cfg", "intr", "mesh", "method"))
def integrate_frames_sharded(sgrid, frames: common.Frame, cfg: FusionConfig,
                             intr: PinholeIntrinsics, mesh: Mesh,
                             method: str = "fast"):
    """One data-parallel step: D frames (leading axis) into D grid shards.

    `method`: "fast" (default) or "merged". The merged integrator
    (VERDICT r3 missing #1) bundles each device's own frame
    (models/merged.py _frame_parts — bundling is grid-independent), then
    all-gathers the merged band jobs AND the sparse (bundle, label) vote
    stream (ray indices offset by the source shard so they address the
    concatenated band stream). Anti-grazing stays globally consistent by
    gathering every frame's bundle-destination voxels
    (_merged.cpp:306-313): each shard masks the gathered dest set against
    the traversal steps it owns — a dest voxel is masked exactly on the one
    shard where its updates would land. Requires a banded carve mode for
    merged (carve_mode full's two-pass ray batches are a single-device
    path)."""
    d = mesh.devices.size
    R = cfg.pipeline.max_rays
    ag = cfg.tsdf.enable_anti_grazing

    if method not in ("fast", "merged"):
        raise ValueError(f"integrate_frames_sharded: method={method!r}")
    if method == "merged" and not (
            cfg.tsdf.carve_mode in ("decimated", "projective")
            and cfg.tsdf.voxel_carving_enabled):
        raise ValueError("sharded merged integration needs a banded "
                         "carve mode (decimated/projective)")

    # The merged integrator disables the dense projective carve under
    # anti-grazing (dest masking cannot ride the dense kernel —
    # models/merged.py _frame_parts); it falls back to decimated carve jobs.
    proj_carve = (cfg.tsdf.carve_mode == "projective"
                  and cfg.tsdf.voxel_carving_enabled
                  and not (method == "merged" and ag))
    if proj_carve:
        from ..ops import mip as mip_ops
        plan = mip_ops.make_plan(intr.height, intr.width,
                                 cfg.pipeline.patch_rows,
                                 cfg.pipeline.patch_cols)
        key_budget = 4 * cfg.pipeline.block_budget

    def body(grid_stack, frame_stack):
        grid = jax.tree.map(lambda x: x[0], grid_stack)
        frame = jax.tree.map(lambda x: x[0], frame_stack)
        my = jax.lax.axis_index(AXIS)

        if proj_carve:
            # Dense ownership-filtered free-space carve for all D frames
            # (models/fast.py _maybe_projective_carve, sharded form).
            grid = _sharded_dense_apply(grid, frame, my, d, cfg, intr,
                                        plan, key_budget, region="carve")

        # Job replication across shards: one all_gather over ICI per batch
        # kind (~R x 32 B per device). Every shard then applies the update
        # entries whose blocks it owns (ownership filter in integrate_jobs).
        gather = lambda x: jax.lax.all_gather(x, AXIS).reshape(
            (-1,) + x.shape[1:])

        if method == "merged":
            from ..models.merged import _frame_parts
            grid, batches, sem_pts, _, bdest, _ = _frame_parts(
                grid, frame, cfg, intr, apply_proj_carve=False)
            sr, sl, sv, sc = sem_pts
            # Global ray indices into the concatenated band stream.
            sem_cat = (gather(sr + my * jnp.int32(R)), gather(sl),
                       gather(sv), gather(sc))
            batches_g = [(jax.tree.map(gather, jobs), S)
                         for jobs, S in batches]
            grid = integrate_jobs(
                grid, cfg, batches_g, shard_id=my, num_shards=d,
                sem_points=sem_cat,
                ag_dest_voxels=gather(bdest) if ag else None,
                ag_own_bundle=True, ag_frames=d if ag else 1)
            return jax.tree.map(lambda x: x[None], grid)

        # Same per-frame job construction as single-device fast
        # (models/fast.py): octave-decimated band+carve batches by default,
        # voxblox-extent full traversal under carve_mode == "full" (with the
        # per-shard start-voxel approx set threaded through grid state).
        from ..models.fast import _frame_batches
        grid, batches, _ = _frame_batches(grid, frame, cfg, intr)
        batches_g = [(jax.tree.map(gather, jobs), S) for jobs, S in batches]
        grid = integrate_jobs(grid, cfg, batches_g,
                              shard_id=my, num_shards=d)
        return jax.tree.map(lambda x: x[None], grid)

    return jax.shard_map(body, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
                         out_specs=P(AXIS), check_vma=False)(sgrid, frames)


def merge_shards(sgrid, cfg: FusionConfig) -> VoxelGrid:
    """Host-side merge of shard stack -> one VoxelGrid (for meshing/export).

    Because ownership is disjoint, merging is pure re-insertion of every
    shard's allocated blocks into a fresh table sized D*capacity."""
    d = int(np.asarray(sgrid.n_blocks).shape[0])
    merged_cfg = dataclasses.replace(
        cfg, grid=dataclasses.replace(cfg.grid,
                                      block_capacity=cfg.grid.block_capacity * d))
    out = gblocks.create(merged_cfg)
    cap_in = cfg.grid.block_capacity
    for s in range(d):
        nb = int(np.asarray(sgrid.n_blocks)[s])
        if nb == 0:
            continue
        coords = jnp.asarray(np.asarray(sgrid.block_coords)[s][:nb])
        out = gblocks.allocate_blocks(
            out, coords, jnp.ones(nb, dtype=bool), merged_cfg.grid)
        slots = gblocks.lookup_slots(out, coords, merged_cfg.grid)
        for field in ["wsum", "wsdf", "sem_count"]:      # (B+1, V3) channels
            src = jnp.asarray(np.asarray(getattr(sgrid, field))[s][:nb])
            dst = getattr(out, field).at[slots].add(src)
            out = dataclasses.replace(out, **{field: dst})
        for field in ["wcolor", "sem_delta"]:            # (C, B+1, V3) channels
            src = jnp.asarray(np.asarray(getattr(sgrid, field))[s][:, :nb])
            dst = getattr(out, field).at[:, slots].add(src)
            out = dataclasses.replace(out, **{field: dst})
        upd = out.updated.at[slots].set(True)
        out = dataclasses.replace(out, updated=upd)
    return out, merged_cfg


class ShardMirror:
    """Host-side incremental mirror of a sharded grid for meshing/export.

    The round-2 sharded mesh path merged the FULL grid state every mesh
    cycle (merge_shards — O(all blocks) device->host traffic). The mirror
    instead fetches only rows whose `updated` flag is set on their owning
    shard and REPLACES them in a merged-capacity host grid: hash ownership
    is disjoint, so a row's complete state lives on exactly one shard and
    replacement is exact. Per-cycle traffic scales with updated blocks, not
    grid size — the voxblox MeshLayer update contract at the transport
    level (VERDICT r2 item 5; reference live loop:
    kimera_semantics_ros/launch/kimera_semantics.launch:131).

    Fetches ride fixed-size row chunks so every device gather and host
    scatter reuses one compiled shape.
    """

    def __init__(self, cfg: FusionConfig, n_shards: int, chunk: int = 512):
        self.d = n_shards
        self.cfg = dataclasses.replace(
            cfg, grid=dataclasses.replace(
                cfg.grid, block_capacity=cfg.grid.block_capacity * n_shards))
        self.grid = gblocks.create(self.cfg)
        self.chunk = chunk

    def sync(self, sgrid, all_rows: bool = False):
        """Pull updated (or all allocated) rows from every shard into the
        mirror; returns `sgrid` with its updated flags cleared.

        Per-shard buffers come from `addressable_shards` (direct device
        buffers — NO cross-device collectives: eagerly slicing a sharded
        array per shard launches independent all-gather programs whose
        rendezvous order is unsynchronized across devices and deadlocks the
        in-process CPU communicator; observed). The row gather then runs as
        a single-device jit on the owning shard's device. Multi-host note:
        only locally-addressable shards are synced (each host mirrors its
        own shards; the mesh merge for cross-host export would concat the
        per-host meshes)."""
        cap = self.cfg.grid.block_capacity // self.d
        upd = np.asarray(sgrid.updated)[:, :cap]          # (D, cap) bool
        nbs = np.asarray(sgrid.n_blocks)                  # (D,)
        chans = (sgrid.block_coords, sgrid.wsum, sgrid.wsdf, sgrid.sem_count,
                 sgrid.wcolor, sgrid.sem_delta)
        # addressable_shards list order is NOT guaranteed to follow the
        # leading-axis shard index — key each buffer by its .index slice
        # (every channel is stacked (D, ...) and sharded on axis 0, so the
        # logical shard s owns rows slice(s, s+1)).
        by_idx = [
            {(sh.index[0].start or 0): sh.data for sh in c.addressable_shards}
            for c in chans]
        for s in range(self.d):
            alloc = np.arange(cap) < int(nbs[s])
            rows = np.where((alloc if all_rows else (upd[s] & alloc)))[0]
            if not len(rows):
                continue
            local = [m[s][0] for m in by_idx]
            for i in range(0, len(rows), self.chunk):
                part = rows[i:i + self.chunk]
                padded = np.full(self.chunk, cap, np.int32)
                padded[:len(part)] = part
                real = jnp.asarray(np.arange(self.chunk) < len(part))
                coords, w, wsdf, semc, wcol, semd = jax.device_get(
                    _gather_shard_rows(*local, jnp.asarray(padded)))
                self._apply(jnp.asarray(coords), real, jnp.asarray(w),
                            jnp.asarray(wsdf), jnp.asarray(semc),
                            jnp.asarray(wcol), jnp.asarray(semd))
        return dataclasses.replace(sgrid, updated=sgrid.updated & False)

    def _apply(self, coords, real, w, wsdf, semc, wcol, semd):
        g = self.grid
        mg = self.cfg.grid
        g = gblocks.allocate_blocks(g, coords, real, mg)
        slots = gblocks.lookup_slots(g, coords, mg)
        safe = jnp.where(real & (slots < mg.block_capacity), slots,
                         mg.block_capacity)
        g = dataclasses.replace(
            g,
            wsum=g.wsum.at[safe].set(w, mode="drop"),
            wsdf=g.wsdf.at[safe].set(wsdf, mode="drop"),
            sem_count=g.sem_count.at[safe].set(semc, mode="drop"),
            wcolor=g.wcolor.at[:, safe].set(wcol, mode="drop"),
            sem_delta=g.sem_delta.at[:, safe].set(semd, mode="drop"),
            updated=g.updated.at[safe].set(True, mode="drop"))
        self.grid = g

    def clear_updated(self):
        self.grid = dataclasses.replace(
            self.grid, updated=self.grid.updated & False)


@jax.jit
def _gather_shard_rows(coords, wsum, wsdf, semc, wcol, semd, rows):
    """One shard's grid channels row-gathered at `rows` (trash-padded).
    Inputs are single-device per-shard buffers — the program runs on the
    owning device with no collectives."""
    return (coords[jnp.minimum(rows, coords.shape[0] - 1)],
            wsum[rows], wsdf[rows], semc[rows],
            wcol[:, rows], semd[:, rows])


@partial(jax.jit, static_argnames=("cfg", "intr", "mesh"))
def integrate_frames_sharded_projective(sgrid, frames: common.Frame,
                                        cfg: FusionConfig,
                                        intr: PinholeIntrinsics, mesh: Mesh):
    """Data-parallel projective step: D frames into D hash-owned grid shards.

    Frame replication rides one all_gather of the mip atlases + poses
    (~10 MB/frame over ICI — the atlas carries everything the update needs:
    depth, labels, packed color). The allocation DDA runs ONCE per frame
    across the mesh: each shard traces only its OWN frame's subsampled rays,
    unique-compacts the candidate block keys (bhash.unique_keys), and
    all-gathers the compact lists — so per-device allocation work stays
    constant in D instead of every shard re-tracing all D frames (the
    round-1 weak-scaling bottleneck). Each shard then ownership-filters and
    inserts every frame's candidates and applies the dense per-block update
    for the rows it owns, so the per-shard apply work is D frames x
    (touched blocks / D) ~= one frame's work — linear scaling, and the same
    exactness argument as the ray path (ownership partitions the update
    stream; updates commute)."""
    from ..grid import hash as bhash
    from ..models import projective as proj_model
    from ..ops import mip as mip_ops

    d = mesh.devices.size
    plan = mip_ops.make_plan(intr.height, intr.width,
                             cfg.pipeline.patch_rows, cfg.pipeline.patch_cols)
    # Candidate budget: a frame cannot touch more distinct blocks than a few
    # x the per-frame row budget; 4x covers ownership imbalance slack.
    key_budget = 4 * cfg.pipeline.block_budget

    def body(grid_stack, frame_stack):
        grid = jax.tree.map(lambda x: x[0], grid_stack)
        frame = jax.tree.map(lambda x: x[0], frame_stack)
        my = jax.lax.axis_index(AXIS)
        grid = _sharded_dense_apply(grid, frame, my, d, cfg, intr, plan,
                                    key_budget, region="all")
        return jax.tree.map(lambda x: x[None], grid)

    return jax.shard_map(body, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
                         out_specs=P(AXIS), check_vma=False)(sgrid, frames)


def _sharded_dense_apply(grid, frame, my, d, cfg, intr, plan, key_budget,
                         region="all"):
    """Own-frame atlas + gathered compact candidates + ownership-filtered
    dense per-block apply (shared by the sharded projective step and the ray
    steps' projective free-space carve, region="carve")."""
    from ..grid import hash as bhash
    from ..models import projective as proj_model
    from ..ops import mip as mip_ops

    atlas = mip_ops.build_atlas(frame.depth, frame.labels, frame.colors,
                                plan)
    wire_u16 = cfg.pipeline.wire_atlas == "u16"
    if wire_u16:
        # r5 wire protocol (VERDICT r4 item 2): exchange the mip pyramid
        # as u16 depth + u8 label planes (+ u16 rg / u8 b only in COLOR
        # mode) — ~5-8x fewer all-gather bytes than the f32 atlas (86.6 ->
        # ~15 MB/step at D=8; SCALING_r05), with a pure-dequantize decode
        # (no per-remote-atlas pyramid rebuild, which would cost ~2.5
        # GFLOP of one-hot-MXU pooling each). The shard's OWN atlas also
        # goes through the codec, so every shard sees identical
        # (wire-roundtripped) atlas data and the step equals single-device
        # integration of the roundtripped atlases (depth quantized at
        # ~0.08 mm — ops/mip.py wire_encode).
        wire = mip_ops.wire_encode(atlas, cfg)
        atlas = mip_ops.atlas_from_wire(wire, cfg)
    ckeys, cdrop = bhash.unique_keys(
        *proj_model.candidates_from_atlas(atlas, frame.T_G_C, cfg, intr,
                                          plan), key_budget)
    if wire_u16:
        wire_all = tuple(jax.lax.all_gather(p, AXIS) for p in wire)
        atlases = jnp.stack([
            mip_ops.atlas_from_wire(tuple(p[i] for p in wire_all), cfg)
            for i in range(d)])
    else:
        atlases = jax.lax.all_gather(atlas, AXIS)        # (D, 4, AH, AW)
    poses = jax.lax.all_gather(frame.T_G_C, AXIS)        # (D, 4, 4)
    ckeys_all = jax.lax.all_gather(ckeys, AXIS)          # (D, K)
    grid = dataclasses.replace(grid, overflow=grid.overflow + cdrop)

    trash = np.int32(0x7FFFFFFF)
    use_pallas = proj_model._use_pallas(cfg)
    rows_f, rows_c, rows_s, rows_r = [], [], [], []
    for f in range(d):
        at, T = atlases[f], poses[f]
        grid, fcoords, fslots, freal = proj_model.insert_candidates(
            grid, ckeys_all[f], ckeys_all[f] != trash, cfg,
            shard=(my, d))
        if use_pallas:
            # Per-frame fused kernel: its padding tiles are skipped at
            # runtime, so the per-frame budget costs no real TPU work.
            grid = proj_model.apply_frame(grid, at, T, fcoords, fslots,
                                          freal, cfg, intr, plan,
                                          region=region)
        else:
            rows_f.append(jnp.full(freal.shape, f, jnp.int32))
            rows_c.append(fcoords)
            rows_s.append(fslots)
            rows_r.append(freal)
    if not use_pallas:
        # Combined row budget: the XLA scatter path pays for every
        # padded row, so compact all D frames' owned rows into ONE
        # budget (+sqrt slack) — per-device apply work stays ~constant
        # in D instead of D x per-frame padding.
        bb = cfg.pipeline.block_budget
        M = bb + max(8, 4 * int(np.sqrt(bb)) // 8 * 8)
        fidx = jnp.concatenate(rows_f)
        coords = jnp.concatenate(rows_c)
        slots = jnp.concatenate(rows_s)
        real = jnp.concatenate(rows_r)
        order = jnp.argsort(~real, stable=True)[:M]
        n_real = jnp.sum(real.astype(jnp.int32))
        grid = dataclasses.replace(
            grid, overflow=grid.overflow + jnp.maximum(0, n_real - M))
        grid = proj_model.apply_rows_multi(
            grid, atlases, poses, fidx[order], coords[order],
            slots[order], real[order], cfg, intr, plan, region=region)
    return grid
