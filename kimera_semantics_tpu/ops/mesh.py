"""Batched per-block marching cubes -> semantically colored triangle mesh.

TPU-native equivalent of voxblox's `MeshIntegrator`/`MeshLayer` (inherited
surface, SURVEY 2b), which the reference reuses unchanged by overwriting TSDF
voxel colors with semantic colors (semantic_integrator_base.cpp:174-191 and
README.md:10). Here the color channel is *computed* at mesh time from the grid's
accumulators according to ColorMode — same output, no in-integration overwrite.

Design: updated blocks are meshed in fixed-size batches. Each block gathers its
7 (+x/+y/+z combination) neighbor blocks via the hash table to build a padded
(V+1)^3 corner lattice, evaluates the 256-case tables over all V^3 cubes at
once, and emits a dense (cube, 5-triangle, 3-vertex) buffer with validity masks;
the host compacts valid triangles into a soup (matching voxblox's per-block
non-deduplicated mesh output).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ColorMode, FusionConfig
from ..core.color import LabelColorMap, rainbow_colormap
from ..grid import blocks as gblocks
from ..grid.blocks import VoxelGrid
from ..ops import semantic as sem_ops
from . import mc_tables

MIN_WEIGHT = 1e-4  # voxblox MeshIntegratorConfig::min_weight


@dataclasses.dataclass
class Mesh:
    """Triangle soup with per-vertex colors (host-side numpy)."""

    vertices: np.ndarray   # (N, 3) float32 world coords
    colors: np.ndarray     # (N, 3) uint8
    triangles: np.ndarray  # (N/3, 3) int32 indices (soup)
    normals: Optional[np.ndarray] = None  # (N, 3) float32 unit outward
                                          # (voxblox Mesh::normals)

    @property
    def num_triangles(self) -> int:
        return self.triangles.shape[0]


def connect_mesh(mesh: Mesh, voxel_size: float) -> Mesh:
    """Triangle soup -> connected (vertex-deduplicated) indexed mesh.

    Voxblox's MeshLayer offers connected meshes via an exact vertex-position
    map (voxblox mesh_layer.h getConnectedMesh); marching-cubes vertices on
    a shared cell edge are interpolated from the same corner pair, so
    quantizing at a tiny fraction of the voxel size (2^-12) merges exactly
    the duplicated corners without welding distinct features. First
    occurrence keeps its color/normal (voxblox behavior). Shrinks PLYs ~6x
    (each interior vertex is shared by ~6 triangles).
    """
    if len(mesh.vertices) == 0:
        return mesh
    q = np.round(mesh.vertices / (voxel_size / 4096.0)).astype(np.int64)
    # Unique by quantized position; inverse maps soup verts -> unique ids.
    _, first, inv = np.unique(q, axis=0, return_index=True,
                              return_inverse=True)
    order = np.argsort(first)               # keep first-occurrence order
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    keep = np.sort(first)
    return Mesh(vertices=mesh.vertices[keep],
                colors=mesh.colors[keep],
                triangles=rank[inv].astype(np.int32)[
                    mesh.triangles.reshape(-1)].reshape(-1, 3),
                normals=(mesh.normals[keep]
                         if mesh.normals is not None else None))


def render_colors(grid: VoxelGrid, cfg: FusionConfig,
                  label_map: Optional[LabelColorMap]) -> jnp.ndarray:
    """Per-voxel mesh color (3, B+1, V3) float per the ColorMode semantics of
    updateSemanticVoxel (semantic_integrator_base.cpp:174-191)."""
    mode = cfg.semantic.color_mode
    if mode == ColorMode.COLOR:
        return gblocks.voxel_color(grid).astype(jnp.float32)
    if mode == ColorMode.SEMANTIC:
        if label_map is None:
            raise ValueError("SEMANTIC color mode needs a LabelColorMap")
        labels = gblocks.mle_labels(grid)
        rgb = label_map.colors_from_labels(labels).astype(jnp.float32)
        return jnp.moveaxis(rgb, -1, 0)
    if mode == ColorMode.SEMANTIC_PROBABILITY:
        lk = sem_ops.make_likelihood(cfg.semantic)
        lo = gblocks.label_logodds(grid, lk.log_match, lk.log_nonmatch)
        max_lo = jnp.max(lo, axis=0)
        # Reference: rainbowColorMap(exp(max log-odds)) — unnormalized, as-is.
        rgb = rainbow_colormap(jnp.exp(max_lo)).astype(jnp.float32)
        return jnp.moveaxis(rgb, -1, 0)
    raise ValueError(f"unknown color mode {mode}")


def _padded_channel(chan_flat: jnp.ndarray, self_slots: jnp.ndarray,
                    nbr_slots: jnp.ndarray, vps: int):
    """Assemble (K, V+1, V+1, V+1, C?) corner lattices from per-block channels.

    chan_flat: (B+1, V3[, C]) channel array; nbr_slots: (K, 7) slots for
    neighbor offsets [(1,0,0),(0,1,0),(0,0,1),(1,1,0),(1,0,1),(0,1,1),(1,1,1)].
    """
    V = vps
    tail = chan_flat.shape[2:]
    as_block = lambda s: chan_flat[s].reshape(s.shape + (V, V, V) + tail)
    blk = as_block(self_slots)                       # (K,V,V,V,...)
    nx, ny, nz, nxy, nxz, nyz, nxyz = (as_block(nbr_slots[:, i]) for i in range(7))
    px = jnp.concatenate([blk, nx[:, :1]], axis=1)   # (K,V+1,V,V)
    ystrip = jnp.concatenate([ny[:, :, :1], nxy[:, :1, :1]], axis=1)
    pxy = jnp.concatenate([px, ystrip], axis=2)      # (K,V+1,V+1,V)
    zcore = jnp.concatenate([nz[:, :, :, :1], nxz[:, :1, :, :1]], axis=1)
    zedge = jnp.concatenate([nyz[:, :, :1, :1], nxyz[:, :1, :1, :1]], axis=1)
    zstrip = jnp.concatenate([zcore, zedge], axis=2)
    return jnp.concatenate([pxy, zstrip], axis=3)    # (K,V+1,V+1,V+1,...)


_NBR_OFFSETS = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0],
                         [1, 0, 1], [0, 1, 1], [1, 1, 1]], dtype=np.int32)


@partial(jax.jit, static_argnames=("cfg", "with_normals"))
def _mesh_block_batch(grid: VoxelGrid, render_color: jnp.ndarray,
                      slots: jnp.ndarray, cfg: FusionConfig,
                      with_normals: bool = False):
    """Jitted wrapper of the MC batch body (standalone/legacy dispatch)."""
    return _mesh_block_batch_core(grid, render_color, slots, cfg,
                                  with_normals)


def _mesh_block_batch_core(grid: VoxelGrid, render_color: jnp.ndarray,
                           slots: jnp.ndarray, cfg: FusionConfig,
                           with_normals: bool = False):
    """Marching cubes over a batch of K blocks.

    Returns (tri_verts (K, V3, 5, 3, 3), tri_cols (K, V3, 5, 3, 3),
    tri_valid (K, V3, 5)[, tri_nrms (K, V3, 5, 3, 3)])."""
    g = cfg.grid
    V, V3, cap = g.voxels_per_side, g.vps3, g.block_capacity
    K = slots.shape[0]

    coords = grid.block_coords[jnp.minimum(slots, cap - 1)]
    nbr = coords[:, None, :] + jnp.asarray(_NBR_OFFSETS)[None, :, :]
    nbr_slots = gblocks.lookup_slots(grid, nbr, g)
    self_ok = slots < cap
    nbr_slots = jnp.where(self_ok[:, None], nbr_slots, cap)
    safe_slots = jnp.where(self_ok, slots, cap)

    dist = gblocks.tsdf_distance(grid, cfg.tsdf.truncation_distance)
    sdf = _padded_channel(dist, safe_slots, nbr_slots, V)          # (K,V+1)^3
    # Missing neighbors resolve to the trash tile, whose rows hold GARBAGE
    # by contract on the Pallas RMW path (uninitialized output buffers —
    # zero on a fresh process, recycled HBM otherwise; observed r3 as 13k
    # phantom triangles at block borders). Gate the weight lattice so trash
    # rows always read as unobserved — the `observed` corner gate then
    # suppresses every face that would touch them.
    row_ok = (jnp.arange(grid.wsum.shape[0]) < cap)[:, None]
    wgt = _padded_channel(jnp.where(row_ok, grid.wsum, 0.0),
                          safe_slots, nbr_slots, V)
    cols = [_padded_channel(render_color[c], safe_slots, nbr_slots, V)
            for c in range(3)]

    # Corner gathers for every cube: (K, V, V, V, 8).
    offs = jnp.asarray(mc_tables.CORNER_OFFSETS)  # (8, 3)
    ii = jnp.arange(V)
    cx = ii[:, None, None, None] + offs[None, None, None, :, 0]
    cy = ii[None, :, None, None] + offs[None, None, None, :, 1]
    cz = ii[None, None, :, None] + offs[None, None, None, :, 2]
    csdf = sdf[:, cx, cy, cz]                    # (K,V,V,V,8)
    cwgt = wgt[:, cx, cy, cz]
    ccol = jnp.stack([c[:, cx, cy, cz] for c in cols], axis=-1)  # (K,V,V,V,8,3)

    observed = jnp.all(cwgt > MIN_WEIGHT, axis=-1)
    case = jnp.sum((csdf < 0.0).astype(jnp.int32) *
                   (1 << jnp.arange(8, dtype=jnp.int32)), axis=-1)
    case = jnp.where(observed, case, 0)

    # Edge interpolation: (K,V,V,V,12,...).
    ec = jnp.asarray(mc_tables.EDGE_CORNERS)     # (12, 2)
    s0, s1 = csdf[..., ec[:, 0]], csdf[..., ec[:, 1]]
    denom = s0 - s1
    t = jnp.clip(jnp.where(jnp.abs(denom) > 1e-12, s0 / denom, 0.5), 0.0, 1.0)
    corner_pos = (offs.astype(jnp.float32) + 0.5)  # voxel centers, local units
    p0, p1 = corner_pos[ec[:, 0]], corner_pos[ec[:, 1]]
    base = jnp.stack(jnp.meshgrid(ii, ii, ii, indexing="ij"), axis=-1)  # (V,V,V,3)
    epos = p0[None, None, None, None] + t[..., None] * (p1 - p0)[None, None, None, None]
    epos = epos + base[None, :, :, :, None, :].astype(jnp.float32)
    world0 = (coords * V).astype(jnp.float32)     # block origin in voxel units
    epos = (epos + world0[:, None, None, None, None, :]) * g.voxel_size
    # Vertex color: nearest corner (voxblox colors vertices from the closest
    # voxel), choose corner0 when t < 0.5.
    c0 = ccol[..., ec[:, 0], :]
    c1 = ccol[..., ec[:, 1], :]
    ecol = jnp.where((t < 0.5)[..., None], c0, c1)

    enrm = None
    if with_normals:
        # Vertex normal = normalized trilinear TSDF gradient at the edge
        # vertex (voxblox Mesh normals convention: grad points inside->out
        # since TSDF is positive outside). Local cube coords in [0,1]^3:
        # corner c sits at offs_c, vertex at p0 + t (p1 - p0) - 0.5.
        local = (p0 - 0.5)[None, None, None, None] \
            + t[..., None] * (p1 - p0)[None, None, None, None]  # (K,V,V,V,12,3)
        o = offs.astype(jnp.float32)                             # (8, 3)
        # per-corner axis factors: f_axis = o ? u : 1-u, df_axis = o ? 1 : -1
        u = local[..., None, :]                                  # (...,12,1,3)
        f = jnp.where(o[None] > 0.5, u, 1.0 - u)                 # (...,12,8,3)
        df = jnp.where(o > 0.5, 1.0, -1.0)                       # (8, 3)
        sb = csdf[..., None, :]                                  # (...,1,8)
        gx = jnp.sum(sb * df[:, 0] * f[..., 1] * f[..., 2], axis=-1)
        gy = jnp.sum(sb * df[:, 1] * f[..., 0] * f[..., 2], axis=-1)
        gz = jnp.sum(sb * df[:, 2] * f[..., 0] * f[..., 1], axis=-1)
        grad = jnp.stack([gx, gy, gz], axis=-1)                  # (...,12,3)
        enrm = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1,
                                                  keepdims=True), 1e-12)

    # Triangles: (K,V,V,V,5,3) edge ids.
    tt = jnp.asarray(mc_tables.TRI_TABLE[:, :15]).reshape(256, 5, 3)
    tri_edges = tt[case]
    tri_valid = tri_edges[..., 0] >= 0
    safe_edges = jnp.maximum(tri_edges, 0)
    flat = lambda a: a.reshape((K, V3) + a.shape[4:])
    if with_normals:
        gather = jax.vmap(jax.vmap(jax.vmap(jax.vmap(
            lambda ep, ecol_, en, te: (ep[te], ecol_[te], en[te])))))
        tv, tc, tn = gather(epos, ecol, enrm, safe_edges)  # (K,V,V,V,5,3,3)
        return flat(tv), flat(tc), flat(tri_valid), flat(tn)
    gather = jax.vmap(  # over K
        jax.vmap(jax.vmap(jax.vmap(                     # over V,V,V
            lambda ep, ecol_, te: (ep[te], ecol_[te]))))
    )
    tv, tc = gather(epos, ecol, safe_edges)             # (K,V,V,V,5,3,3)
    return flat(tv), flat(tc), flat(tri_valid)


@partial(jax.jit, static_argnames=("budget", "with_normals"))
def _compact_tris(tv, tc, tm, budget, with_normals=False, tn=None):
    """Device-side triangle compaction for the host fetch (r4).

    A 32-block MC batch materializes ~48 MB of (K, V3, 5, 3, 3) triangle
    buffers, ~99% of them invalid; fetching them through the axon tunnel
    dominated the serving mesh cycle (~1.5 s/batch measured). Pack the
    valid triangles to a static budget with a stable binary-key sort
    (identical triangle order to the host mask select) and fetch
    (budget, 19/28) instead: verts 9, colors 9 [, normals 9], and the flat
    triangle index bitcast into the last lane (grid-row recovery host-side).
    Returns (packed, n_valid); n_valid > budget means the caller must fall
    back to the full fetch (counted nowhere — the mesh must be complete).
    """
    m = tm.reshape(-1)
    n = m.shape[0]
    assert n < (1 << 30)
    iota = jnp.arange(n, dtype=jnp.int32)
    # 2-operand sort on a BINARY key, not the packed 1-operand form: at
    # this stream size (batch x V3 x 5 ~ 655k) an all-unique packed key
    # hits lax.sort's mostly-unique cliff (~200x — measured as 296 s for a
    # 15-batch full extract); the two-valued key stays duplicate-heavy.
    flag = (~m).astype(jnp.int32)
    sflag, order = jax.lax.sort((flag, iota), num_keys=1)
    idx = order[:budget]
    valid = sflag[:budget] == 0
    cols = [tv.reshape(n, 9)[idx], tc.reshape(n, 9)[idx]]
    if with_normals:
        cols.append(tn.reshape(n, 9)[idx])
    cols.append(jax.lax.bitcast_convert_type(
        jnp.where(valid, idx, -1), jnp.float32)[:, None])
    return jnp.concatenate(cols, axis=1), jnp.sum(m.astype(jnp.int32))


def _compact_tris_core(tv, tc, tm, tri_rows, budget, with_normals=False,
                       tn=None):
    """_compact_tris body for in-program use (the cycle scan): packs the
    per-triangle GRID ROW (not the chunk-local flat index) into the last
    column so chunk outputs concatenate without index translation."""
    m = tm.reshape(-1)
    n = m.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    flag = (~m).astype(jnp.int32)
    sflag, order = jax.lax.sort((flag, iota), num_keys=1)
    idx = order[:budget]
    valid = sflag[:budget] == 0
    cols = [tv.reshape(n, 9)[idx], tc.reshape(n, 9)[idx]]
    if with_normals:
        cols.append(tn.reshape(n, 9)[idx])
    cols.append(jax.lax.bitcast_convert_type(
        jnp.where(valid, tri_rows[idx], -1), jnp.float32)[:, None])
    return jnp.concatenate(cols, axis=1), jnp.sum(m.astype(jnp.int32))


@partial(jax.jit, static_argnames=("cfg", "only_updated", "with_normals",
                                   "chunk", "n_chunks", "per_budget"))
def _mesh_cycle(grid: VoxelGrid, render_color: jnp.ndarray,
                start_rank: jnp.ndarray, cfg: FusionConfig,
                only_updated: bool, with_normals: bool,
                chunk: int, n_chunks: int, per_budget: int):
    """One-dispatch incremental-mesh cycle (r5, VERDICT item 1).

    The r4 serving cycle ran ~7 separate 32-block `_mesh_block_batch`
    dispatches, each followed by a synchronous count fetch (>=21 ms tunnel
    RTT) and a fixed 2.5 MB packed-buffer fetch — 1.34-1.59 s warm for ~200
    blocks against 14-78 ms of integration. This program does the whole
    cycle in ONE device dispatch:

      1. block selection on device — flag-sort the (updated & allocated)
         mask so the page's kmax slots come out ascending (same order the
         host `np.where` produced);
      2. a lax.scan over n_chunks MC chunks (compiles the MC body ONCE —
         also collapsing the old per-shape cold compiles), each chunk
         compacting its triangles to `per_budget` rows;
      3. each chunk's packed rows appended at a dynamic offset into one
         (n_chunks * per_budget, C) output buffer — the valid prefix of
         chunk i+1 overwrites chunk i's padding tail, so rows [0, total)
         are exactly the cycle's triangles in the legacy order
         (ascending block slot, voxel, triangle).

    The host then pays ONE count sync and ONE bucketed prefix fetch.
    Returns (buf, total, n_sel, per-chunk counts); a chunk count above
    per_budget means the caller must redo via the legacy complete path.
    """
    g = cfg.grid
    cap = g.block_capacity
    kmax = chunk * n_chunks
    tri_per_blk = g.vps3 * 5

    iota = jnp.arange(cap, dtype=jnp.int32)
    sel = iota < grid.n_blocks
    if only_updated:
        sel = sel & grid.updated[:cap]
    n_sel = jnp.sum(sel.astype(jnp.int32))
    flag = (~sel).astype(jnp.int32)
    sflag, order = jax.lax.sort((flag, iota), num_keys=1)
    # Pad so paging never clamps into the previous page (duplicate blocks).
    sflag = jnp.pad(sflag, (0, kmax), constant_values=1)
    order = jnp.pad(order, (0, kmax), constant_values=cap)
    page_flag = jax.lax.dynamic_slice(sflag, (start_rank,), (kmax,))
    page_slot = jax.lax.dynamic_slice(order, (start_rank,), (kmax,))
    slots = jnp.where(page_flag == 0, page_slot, cap).reshape(n_chunks, chunk)

    C = 28 if with_normals else 19
    buf0 = jnp.zeros((n_chunks * per_budget, C), jnp.float32)

    def body(carry, slots_c):
        off, buf = carry
        out = _mesh_block_batch_core(grid, render_color, slots_c, cfg,
                                     with_normals=with_normals)
        rows = jnp.repeat(slots_c, tri_per_blk)
        packed, cnt = _compact_tris_core(
            out[0], out[1], out[2], rows, budget=per_budget,
            with_normals=with_normals, tn=out[3] if with_normals else None)
        buf = jax.lax.dynamic_update_slice(buf, packed, (off, 0))
        return (off + jnp.minimum(cnt, per_budget), buf), cnt

    (total, buf), cnts = jax.lax.scan(body, (jnp.int32(0), buf0), slots)
    return buf, total, n_sel, cnts, slots.reshape(-1)


def _cycle_geometry(cfg: FusionConfig):
    """(chunk, n_chunks, per_budget) for the cycle program: chunk x vps3
    constant (peak-memory bound, as the legacy batch), kmax >= 256 blocks
    per page."""
    chunk = max(1, (32 * 4096) // cfg.grid.vps3)
    n_chunks = max(1, -(-256 // chunk))
    per_budget = int(os.environ.get("KSD_CHUNK_TRI_BUDGET", "16384"))
    return chunk, n_chunks, per_budget


_FETCH_BUCKETS = (2048, 8192, 32768)


def _fetch_prefix(buf, total: int):
    """Fetch rows [0, total) of the device buffer through the smallest
    power-of-two-ish bucket (compiles <= len(_FETCH_BUCKETS)+1 trivial slice
    programs; avoids pulling the full buffer through the ~100 MB/s tunnel)."""
    n = buf.shape[0]
    for b in _FETCH_BUCKETS:
        if total <= b <= n:
            return np.asarray(buf[:b])[:total]
    return np.asarray(buf)[:total]


def extract_mesh_cycle(grid: VoxelGrid, cfg: FusionConfig,
                       label_map: Optional[LabelColorMap] = None,
                       only_updated: bool = False,
                       with_normals: bool = False,
                       return_blocks: bool = False):
    """extract_mesh via the one-dispatch cycle program, with paging and a
    legacy-path fallback on per-chunk budget overflow. Output is
    row-for-row identical to the legacy extract_mesh."""
    render = render_colors(grid, cfg, label_map)
    chunk, n_chunks, per_budget = _cycle_geometry(cfg)
    kmax = chunk * n_chunks

    parts, sel_parts = [], []
    start = 0
    n_sel = None
    while n_sel is None or start < n_sel:
        buf, total_d, n_sel_d, cnts_d, slots_d = _mesh_cycle(
            grid, render, jnp.int32(start), cfg, only_updated, with_normals,
            chunk, n_chunks, per_budget)
        # ONE host sync for the page's scalars (+ the small slot list).
        total, n_sel, cnts, slots_h = jax.device_get(
            (total_d, n_sel_d, cnts_d, slots_d))
        if int(np.max(cnts)) > per_budget:
            # A chunk overflowed its triangle budget: the buffer is
            # incomplete. The mesh must be complete — redo via the legacy
            # per-batch path (complete by construction).
            return extract_mesh(grid, cfg, label_map,
                                only_updated=only_updated,
                                with_normals=with_normals,
                                return_blocks=return_blocks,
                                _force_legacy=True)
        parts.append(_fetch_prefix(buf, int(total)))
        sel_parts.append(slots_h[slots_h < cfg.grid.block_capacity])
        start += kmax

    packed = (np.concatenate(parts) if parts
              else np.zeros((0, 28 if with_normals else 19), np.float32))
    v = packed[:, 0:9].reshape(-1, 3).astype(np.float32)
    c = np.clip(packed[:, 9:18].reshape(-1, 3), 0, 255).astype(np.uint8)
    off = 18
    nr = None
    if with_normals:
        nr = packed[:, 18:27].reshape(-1, 3).astype(np.float32)
        off = 27
    tris = np.arange(len(v), dtype=np.int32).reshape(-1, 3)
    mesh = Mesh(vertices=v, colors=c, triangles=tris, normals=nr)
    if return_blocks:
        tri_rows = np.ascontiguousarray(packed[:, off]).view(np.int32)
        sel = (np.concatenate(sel_parts) if sel_parts
               else np.zeros(0, np.int32))
        return mesh, sel.astype(np.int32), tri_rows
    return mesh


def extract_mesh(grid: VoxelGrid, cfg: FusionConfig,
                 label_map: Optional[LabelColorMap] = None,
                 only_updated: bool = False, batch: Optional[int] = None,
                 with_normals: bool = False, return_blocks: bool = False,
                 _force_legacy: bool = False):
    """Extract the mesh for allocated (or updated) blocks; host-side compaction.

    Equivalent of TsdfServer::generateMesh / the periodic mesh update
    (kimera_semantics_rosbag.cpp:148; launch `update_mesh_every_n_sec`).

    With `return_blocks=True` returns `(Mesh, meshed_rows, tri_rows)`:
    the grid rows that were meshed this call (even if they produced zero
    triangles — the caller's MeshLayer cache must clear those) and the grid
    row of every output triangle. This is the voxblox MeshLayer update
    contract: replace exactly the re-meshed blocks, keep the rest.

    Default route is the one-dispatch cycle program (extract_mesh_cycle,
    r5); the legacy per-batch path remains as the completeness fallback
    (per-chunk budget overflow) and for explicit `batch` callers.
    KSD_MESH_LEGACY=1 forces it globally.
    """
    if (not _force_legacy and batch is None
            and not os.environ.get("KSD_MESH_LEGACY")):
        return extract_mesh_cycle(grid, cfg, label_map,
                                  only_updated=only_updated,
                                  with_normals=with_normals,
                                  return_blocks=return_blocks)
    # The MC temporaries scale with batch x V^3 (edge/triangle buffers are
    # ~40 floats per voxel). Default: keep batch x vps3 constant so peak
    # memory stays flat (32 blocks at vps=16 = 4 blocks at vps=32); an
    # explicit batch is respected as given.
    if batch is None:
        batch = max(1, (32 * 4096) // cfg.grid.vps3)
    cap = cfg.grid.block_capacity
    updated = np.asarray(grid.updated[:cap])
    allocated = np.arange(cap) < int(grid.n_blocks)
    sel = np.where(updated & allocated)[0] if only_updated else np.where(allocated)[0]
    render = render_colors(grid, cfg, label_map)

    import jax as _jax
    fetch_compact = _jax.default_backend() in ("tpu", "axon")
    tri_budget = int(os.environ.get("KSD_TRI_BUDGET", "32768"))

    verts, cols, nrms, rows = [], [], [], []
    for i in range(0, len(sel), batch):
        chunk = sel[i:i + batch]
        slots = np.full(batch, cap, dtype=np.int32)
        slots[:len(chunk)] = chunk
        out = _mesh_block_batch(grid, render, jnp.asarray(slots), cfg,
                                with_normals=with_normals)
        tri_per_blk = cfg.grid.vps3 * 5
        if fetch_compact:
            packed_d, cnt_d = _compact_tris(
                out[0], out[1], out[2], budget=tri_budget,
                with_normals=with_normals,
                tn=out[3] if with_normals else None)
            cnt = int(cnt_d)
            if cnt <= tri_budget:
                packed = np.asarray(packed_d)[:cnt]
                verts.append(packed[:, 0:9].reshape(-1, 3, 3))
                cols.append(packed[:, 9:18].reshape(-1, 3, 3))
                off = 18
                if with_normals:
                    nrms.append(packed[:, 18:27].reshape(-1, 3, 3))
                    off = 27
                if return_blocks:
                    idx_h = np.ascontiguousarray(
                        packed[:, off]).view(np.int32)
                    rows.append(slots[idx_h // tri_per_blk])
                continue
            # budget overflow: fall through to the complete (slow) fetch
        tv, tc, tm = (np.asarray(x) for x in out[:3])
        m = tm.reshape(-1)
        verts.append(tv.reshape(-1, 3, 3)[m])
        cols.append(tc.reshape(-1, 3, 3)[m])
        if with_normals:
            nrms.append(np.asarray(out[3]).reshape(-1, 3, 3)[m])
        if return_blocks:
            rows.append(np.repeat(slots, tri_per_blk)[m])
    if verts:
        v = np.concatenate(verts).reshape(-1, 3).astype(np.float32)
        c = np.clip(np.concatenate(cols).reshape(-1, 3), 0, 255).astype(np.uint8)
        nr = (np.concatenate(nrms).reshape(-1, 3).astype(np.float32)
              if with_normals else None)
    else:
        v = np.zeros((0, 3), np.float32)
        c = np.zeros((0, 3), np.uint8)
        nr = np.zeros((0, 3), np.float32) if with_normals else None
    tris = np.arange(len(v), dtype=np.int32).reshape(-1, 3)
    mesh = Mesh(vertices=v, colors=c, triangles=tris, normals=nr)
    if return_blocks:
        tri_rows = (np.concatenate(rows).astype(np.int32) if rows
                    else np.zeros(0, np.int32))
        return mesh, sel.astype(np.int32), tri_rows
    return mesh
