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
    quantizing at a tiny fraction of the voxel size (2^-10) merges exactly
    the duplicated corners without welding distinct features. First
    occurrence keeps its color/normal (voxblox behavior). Shrinks PLYs ~6x
    (each interior vertex is shared by ~6 triangles).

    Weld grid = voxel/1024: the TPU u16 fetch wire quantizes vertices at
    voxel/4096 steps, and a shared-edge vertex can land one wire code
    apart in adjacent blocks (world-space float round-trip before the
    per-block quantization) — the weld cell must span several wire steps
    or block borders crack (review r5).
    """
    if len(mesh.vertices) == 0:
        return mesh
    q = np.round(mesh.vertices / (voxel_size / 1024.0)).astype(np.int64)
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
    from .reduce import stable_compact_order
    m = tm.reshape(-1)
    n = m.shape[0]
    valid, idx = stable_compact_order(m, budget)
    cols = [tv.reshape(n, 9)[idx], tc.reshape(n, 9)[idx]]
    if with_normals:
        cols.append(tn.reshape(n, 9)[idx])
    # Index as a plain f32 VALUE (exact below 2^24), not a bitcast: small
    # ints bitcast to f32 denormals, which the TPU pipeline flushes to
    # zero (observed r5 — tri_rows scrambled on TPU only).
    assert n < (1 << 24)
    cols.append(jnp.where(valid, idx, -1).astype(jnp.float32)[:, None])
    return jnp.concatenate(cols, axis=1), jnp.sum(m.astype(jnp.int32))


_TRI_SEL_NP = None


def _tri_sel_table() -> np.ndarray:
    """(256, 15, 12) one-hot triangle-edge selector from TRI_TABLE.

    Row (case, t) is the one-hot of the edge id of triangle-vertex t; the
    -1 padding entries become all-zero rows (their outputs are masked by
    tri_valid). Lets the per-triangle vertex gather ride a small einsum
    instead of a per-cube fancy gather."""
    global _TRI_SEL_NP
    if _TRI_SEL_NP is None:
        tt = mc_tables.TRI_TABLE[:, :15]                      # (256, 15)
        _TRI_SEL_NP = (tt[..., None] ==
                       np.arange(12)[None, None]).astype(np.float32)
    return _TRI_SEL_NP


def _render_rows(grid: VoxelGrid, cfg: FusionConfig,
                 label_table: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """render_colors restricted to a gathered row subset -> (3, R2, V3).

    Value-identical to render_colors(...)[:, rows] (same op chain on the
    gathered rows); avoids the full-grid argmax/LUT pass, which measured
    62 ms/cycle at capacity 4096 (scripts/profile_mesh_r5.py).

    SEMANTIC mode is handled by _render_labels_rows instead (the cycle
    carries one label plane and LUTs only the compacted cube corners —
    the 3-channel color-lattice build measured 17 ms/cycle,
    scripts/profile_mesh_r5b.py)."""
    mode = cfg.semantic.color_mode
    if mode == ColorMode.COLOR:
        w = jnp.maximum(grid.wsum[rows], 1e-12)[None]
        return jnp.clip(grid.wcolor[:, rows] / w, 0.0,
                        255.0).astype(jnp.uint8).astype(jnp.float32)
    if mode == ColorMode.SEMANTIC:
        labels = jnp.argmax(grid.sem_delta[:, rows], axis=0)
        rgb = label_table[labels].astype(jnp.float32)         # (R2, V3, 3)
        return jnp.moveaxis(rgb, -1, 0)
    if mode == ColorMode.SEMANTIC_PROBABILITY:
        lk = sem_ops.make_likelihood(cfg.semantic)
        lo = (gblocks.DEFAULT_UNIFORM_LOG_PRIOR
              + grid.sem_count[rows][None] * lk.log_nonmatch
              + grid.sem_delta[:, rows])
        max_lo = jnp.max(lo, axis=0)
        rgb = rainbow_colormap(jnp.exp(max_lo)).astype(jnp.float32)
        return jnp.moveaxis(rgb, -1, 0)
    raise ValueError(f"unknown color mode {mode}")


def _mc_chunk_compact(grid: VoxelGrid, render_pad: jnp.ndarray,
                      rank: jnp.ndarray, slots_c: jnp.ndarray,
                      cfg: FusionConfig, with_normals: bool,
                      cube_budget: int, per_budget: int,
                      wire: bool = False, label_table=None):
    """Compacted-cube marching cubes over one chunk of K blocks (r5).

    The legacy MC body ran every per-cube stage (corner gathers, edge
    interpolation, triangle gathers) over all K x V^3 cubes — measured
    108 ms device time per 32-block chunk on v5e, all in XLA per-index
    gathers (scripts/profile_mesh_r5.py). Here the only full-density work
    is corner extraction by 8 STATIC SLICES of the (V+1)^3 lattices (pure
    data movement) and the case computation; active cubes (case 1..254,
    all corners observed — typically ~5% of cubes) are compacted with a
    binary-flag sort, and the expensive per-cube math runs on the
    `cube_budget` compacted set only. Triangle vertex selection rides a
    one-hot einsum over the 12 edges instead of a per-cube gather.

    Returns (packed (per_budget, C), n_tris, n_active). n_active >
    cube_budget or n_tris > per_budget means incomplete output — the
    caller falls back to the legacy complete path. Output triangle order
    matches the legacy flat (block, voxel, tri) order exactly (stable
    sorts over ascending flat indices)."""
    g = cfg.grid
    V, V3, cap = g.voxels_per_side, g.vps3, g.block_capacity
    K = slots_c.shape[0]
    N = K * V3

    coords = grid.block_coords[jnp.minimum(slots_c, cap - 1)]
    nbr = coords[:, None, :] + jnp.asarray(_NBR_OFFSETS)[None, :, :]
    nbr_slots = gblocks.lookup_slots(grid, nbr, g)
    self_ok = slots_c < cap
    nbr_slots = jnp.where(self_ok[:, None], nbr_slots, cap)
    safe_slots = jnp.where(self_ok, slots_c, cap)

    dist = gblocks.tsdf_distance(grid, cfg.tsdf.truncation_distance)
    sdf = _padded_channel(dist, safe_slots, nbr_slots, V)      # (K, V+1)^3
    row_ok = (jnp.arange(grid.wsum.shape[0]) < cap)[:, None]
    wgt = _padded_channel(jnp.where(row_ok, grid.wsum, 0.0),
                          safe_slots, nbr_slots, V)
    rsel = rank[jnp.minimum(safe_slots, cap)]
    rnbr = rank[jnp.minimum(nbr_slots, cap)]

    offs = mc_tables.CORNER_OFFSETS                            # np (8, 3)

    def corner_stack(lat):
        return jnp.stack(
            [lat[:, int(o[0]):int(o[0]) + V, int(o[1]):int(o[1]) + V,
                 int(o[2]):int(o[2]) + V] for o in offs], axis=-1)

    csdf = corner_stack(sdf).reshape(N, 8)
    cwgt = corner_stack(wgt).reshape(N, 8)
    observed = jnp.all(cwgt > MIN_WEIGHT, axis=-1)
    case = jnp.sum((csdf < 0.0).astype(jnp.int32) *
                   (1 << jnp.arange(8, dtype=jnp.int32))[None], axis=-1)
    case = jnp.where(observed, case, 0)
    active = (case > 0) & (case < 255)
    n_active = jnp.sum(active.astype(jnp.int32))

    iota = jnp.arange(N, dtype=jnp.int32)
    sfl, order = jax.lax.sort(((~active).astype(jnp.int32), iota),
                              num_keys=1)
    cidx = order[:cube_budget]
    cvalid = sfl[:cube_budget] == 0

    csdf_c = csdf[cidx]                                        # (CB, 8)
    case_c = jnp.where(cvalid, case[cidx], 0)
    if label_table is not None:
        # SEMANTIC mode (r5b): colors are label-derived, so carry ONE
        # label lattice and LUT only the compacted cube corners — the
        # 3-channel color-lattice build measured 17 ms/cycle
        # (scripts/profile_mesh_r5b.py). Labels ride the lattice as exact
        # small-int f32; the LUT matches colors_from_labels bit-for-bit.
        lab_lat = _padded_channel(render_pad[0], rsel, rnbr, V)
        clab = corner_stack(lab_lat).reshape(N, 8)
        clab_c = clab[cidx].astype(jnp.int32)                  # (CB, 8)
        ccol_c = label_table[clab_c].astype(jnp.float32)       # (CB, 8, 3)
    else:
        cols = [_padded_channel(render_pad[c], rsel, rnbr, V)
                for c in range(3)]
        ccol_full = jnp.stack([corner_stack(c) for c in cols],
                              axis=-1).reshape(N, 8, 3)
        ccol_c = ccol_full[cidx]                               # (CB, 8, 3)

    ec = mc_tables.EDGE_CORNERS                                # np (12, 2)
    pick = lambda a, side: jnp.stack(
        [a[:, int(e)] for e in ec[:, side]], axis=1)           # (CB, 12, ...)
    s0, s1 = pick(csdf_c, 0), pick(csdf_c, 1)
    denom = s0 - s1
    t = jnp.clip(jnp.where(jnp.abs(denom) > 1e-12, s0 / denom, 0.5),
                 0.0, 1.0)
    corner_pos = offs.astype(np.float32) + 0.5
    p0 = jnp.asarray(corner_pos[ec[:, 0]])                     # (12, 3)
    p1 = jnp.asarray(corner_pos[ec[:, 1]])

    k = cidx // V3
    lin = cidx % V3
    base = jnp.stack([lin // (V * V), (lin // V) % V, lin % V],
                     axis=-1).astype(jnp.float32)              # (CB, 3)
    world0 = (coords[k] * V).astype(jnp.float32)               # (CB, 3)
    # Same float association as the legacy body (bit-identical vertices):
    # (local + base) + world0, then scale.
    epos = p0[None] + t[..., None] * (p1 - p0)[None]
    epos = epos + base[:, None]
    epos = (epos + world0[:, None]) * g.voxel_size             # (CB, 12, 3)
    c0, c1 = pick(ccol_c, 0), pick(ccol_c, 1)
    ecol = jnp.where((t < 0.5)[..., None], c0, c1)

    enrm = None
    if with_normals:
        local = (p0 - 0.5)[None] + t[..., None] * (p1 - p0)[None]
        o = jnp.asarray(offs.astype(np.float32))               # (8, 3)
        u = local[:, :, None, :]                               # (CB,12,1,3)
        f = jnp.where(o[None, None] > 0.5, u, 1.0 - u)         # (CB,12,8,3)
        df = jnp.where(o > 0.5, 1.0, -1.0)                     # (8, 3)
        sb = csdf_c[:, None, :]                                # (CB, 1, 8)
        gx = jnp.sum(sb * df[:, 0] * f[..., 1] * f[..., 2], axis=-1)
        gy = jnp.sum(sb * df[:, 1] * f[..., 0] * f[..., 2], axis=-1)
        gz = jnp.sum(sb * df[:, 2] * f[..., 0] * f[..., 1], axis=-1)
        grad = jnp.stack([gx, gy, gz], axis=-1)                # (CB, 12, 3)
        enrm = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1,
                                                  keepdims=True), 1e-12)

    tsel = jnp.asarray(_tri_sel_table())[case_c]               # (CB, 15, 12)
    tv = jnp.einsum("cte,cev->ctv", tsel, epos)                # (CB, 15, 3)
    tc = jnp.einsum("cte,cev->ctv", tsel, ecol)
    # A triangle exists iff its first vertex's selector row is nonzero
    # (TRI_TABLE -1 padding -> all-zero one-hot row).
    tvalid = ((jnp.sum(tsel, axis=-1) > 0.5).reshape(cube_budget, 5, 3)
              [:, :, 0] & cvalid[:, None])                     # (CB, 5)

    nt = cube_budget * 5
    rows_tri = jnp.repeat(jnp.where(cvalid, slots_c[k], -1), 5)
    mv = tvalid.reshape(nt)
    n_tris = jnp.sum(mv.astype(jnp.int32))
    iota2 = jnp.arange(nt, dtype=jnp.int32)
    sfl2, order2 = jax.lax.sort(((~mv).astype(jnp.int32), iota2),
                                num_keys=1)
    idx = order2[:per_budget]
    valid = sfl2[:per_budget] == 0

    if wire:
        # Compact u16 fetch wire (TPU path): the axon tunnel moves
        # ~54 MB/s with ~35 ms fixed overhead (profile_mesh_r5), so the
        # f32 packed rows (76 B/tri) cost ~20 ms/MB. Encode verts as u16
        # block-local voxel coords (range [0, V] -> step V/65535, ~12 um
        # at the 5 cm canonical voxel — 3 orders below the mesh error;
        # identical u16 codes on shared edges keep connect_mesh welding
        # exact), colors as u8 pairs, normals (if any) as biased u16, and
        # carry the block coords (world-extent offset) so the host needs
        # no separate block_coords fetch. 36 B/tri (54 with normals).
        ext = g.world_extent_blocks
        # Block-local voxel coords span [0.5, V + 0.5] (corner positions
        # sit at voxel centers) — bias by 0.5 so the u16 range covers it.
        tvl = tv.reshape(cube_budget, 15, 3) / g.voxel_size \
            - world0[:, None, :] - 0.5
        q = jnp.clip(jnp.round(tvl * (65535.0 / V)), 0, 65535)
        qv = q.reshape(nt, 9)[idx].astype(jnp.uint16)          # 9 u16
        c8 = jnp.clip(jnp.round(tc.reshape(nt, 9)[idx]), 0,
                      255).astype(jnp.int32)
        cpk = (c8[:, 0::2] | jnp.pad(c8[:, 1::2], ((0, 0), (0, 1)))
               << 8).astype(jnp.uint16)                        # 5 u16
        bc3 = (coords[k] + ext).astype(jnp.int32)              # (CB, 3)
        bc_t = jnp.repeat(bc3, 5, axis=0)[idx].astype(jnp.uint16)
        row16 = jnp.where(valid, rows_tri[idx],
                          cap).astype(jnp.uint16)[:, None]
        cols16 = [qv, cpk, bc_t, row16]                        # 18 u16
        if with_normals:
            tn = jnp.einsum("cte,cev->ctv", tsel, enrm)
            qn = jnp.clip(jnp.round((tn.reshape(nt, 9)[idx] * 0.5 + 0.5)
                                    * 65535.0), 0, 65535).astype(jnp.uint16)
            cols16.append(qn)                                  # 27 u16
        return jnp.concatenate(cols16, axis=1), n_tris, n_active

    parts = [tv.reshape(nt, 9)[idx], tc.reshape(nt, 9)[idx]]
    if with_normals:
        tn = jnp.einsum("cte,cev->ctv", tsel, enrm)
        parts.append(tn.reshape(nt, 9)[idx])
    # Row as a plain f32 value (exact below 2^24): bitcast small-int
    # payloads land in the f32 denormal range and TPU flushes them to zero
    # (observed r5).
    parts.append(jnp.where(valid, rows_tri[idx],
                           -1).astype(jnp.float32)[:, None])
    return jnp.concatenate(parts, axis=1), n_tris, n_active


@partial(jax.jit, static_argnames=("cfg", "only_updated", "with_normals",
                                   "chunk", "n_chunks", "per_budget",
                                   "cube_budget", "wire"))
def _mesh_cycle(grid: VoxelGrid, label_table: jnp.ndarray,
                start_rank: jnp.ndarray, cfg: FusionConfig,
                only_updated: bool, with_normals: bool,
                chunk: int, n_chunks: int, per_budget: int,
                cube_budget: int, wire: bool = False):
    """One-dispatch incremental-mesh cycle (r5, VERDICT item 1).

    The r4 serving cycle ran ~7 separate 32-block `_mesh_block_batch`
    dispatches, each followed by a synchronous count fetch (>=21 ms tunnel
    RTT) and a fixed 2.5 MB packed-buffer fetch — 1.34-1.59 s warm for ~200
    blocks against 14-78 ms of integration. This program does the whole
    cycle in ONE device dispatch:

      1. block selection on device — flag-sort the (updated & allocated)
         mask so the page's kmax slots come out ascending (same order the
         host `np.where` produced);
      2. row-subset color rendering over the page's blocks + neighbors
         only (_render_rows; the full-grid pass cost 62 ms at cap 4096);
      3. a lax.scan over n_chunks compacted-cube MC chunks
         (_mc_chunk_compact — compiles ONCE, collapsing the old per-shape
         cold compiles), each chunk packing its triangles to `per_budget`
         rows;
      4. each chunk's packed rows appended at a dynamic offset into one
         (n_chunks * per_budget, C) output buffer — the valid prefix of
         chunk i+1 overwrites chunk i's padding tail, so rows [0, total)
         are exactly the cycle's triangles in the legacy order
         (ascending block slot, voxel, triangle).

    The host then pays ONE count sync and ONE bucketed prefix fetch.
    Returns (buf, total, n_sel, per-chunk tri counts, active-cube counts,
    page slots); counts above per_budget/cube_budget mean the caller must
    redo via the legacy complete path.
    """
    g = cfg.grid
    cap = g.block_capacity
    kmax = chunk * n_chunks

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
    slots_flat = jnp.where(page_flag == 0, page_slot, cap)

    # Row subset for color rendering: page blocks + their 7 (+x/+y/+z)
    # neighbors; rank LUT maps grid row -> render row (R2 = trash).
    coords_p = grid.block_coords[jnp.minimum(slots_flat, cap - 1)]
    nsl = gblocks.lookup_slots(
        grid, coords_p[:, None, :] + jnp.asarray(_NBR_OFFSETS)[None], g)
    ok = slots_flat < cap
    nsl = jnp.where(ok[:, None], nsl, cap)
    allrows = jnp.concatenate(
        [jnp.where(ok, slots_flat, cap)[:, None], nsl], axis=1).reshape(-1)
    present = jnp.zeros((cap + 1,), bool).at[allrows].set(True)
    present = present.at[cap].set(False)
    # Render-row budget: a page's unique (block + neighbor) rows are ~2x
    # its block count for contiguous scenes (~450 at 256 blocks); the
    # worst case (256 disjoint blocks) is kmax*8. The subset gather +
    # argmax scale with R2, so budget it and report overflow (caller
    # falls back/retries like the cube budget).
    R2 = min(int(os.environ.get("KSD_RENDER_ROWS", "1024")),
             kmax * 8, cap + 1)
    n_rows = jnp.sum(present.astype(jnp.int32))
    rows_over = jnp.maximum(0, n_rows - R2)
    iota_r = jnp.arange(cap + 1, dtype=jnp.int32)
    rs, rorder = jax.lax.sort(((~present).astype(jnp.int32), iota_r),
                              num_keys=1)
    rows_list = jnp.where(rs[:R2] == 0, rorder[:R2], cap)
    rank = jnp.full((cap + 1,), R2, jnp.int32).at[rows_list].set(
        jnp.arange(R2, dtype=jnp.int32), mode="drop")
    rank = rank.at[cap].set(R2)
    sem_mode = cfg.semantic.color_mode == ColorMode.SEMANTIC
    if sem_mode:
        # One LABEL plane instead of three color channels; corners LUT to
        # colors only after cube compaction (_mc_chunk_compact, r5b —
        # saves the ~15 ms subset LUT/moveaxis + ~17 ms color lattices).
        labels_sel = jnp.argmax(grid.sem_delta[:, rows_list],
                                axis=0).astype(jnp.float32)
        render_sel = labels_sel[None]                 # (1, R2, V3)
    else:
        render_sel = _render_rows(grid, cfg, label_table, rows_list)
    # Trash render row (R2): zeros — only ever read for lattice corners
    # whose weight gate already suppresses the cube (label 0 in SEMANTIC
    # mode, equally gated).
    render_pad = jnp.pad(render_sel, ((0, 0), (0, 1), (0, 0)))

    slots = slots_flat.reshape(n_chunks, chunk)
    if wire:
        C, dt = (27 if with_normals else 18), jnp.uint16
    else:
        C, dt = (28 if with_normals else 19), jnp.float32
    buf0 = jnp.zeros((n_chunks * per_budget, C), dt)

    def body(carry, slots_c):
        off, buf = carry
        packed, cnt, nact = _mc_chunk_compact(
            grid, render_pad, rank, slots_c, cfg, with_normals,
            cube_budget, per_budget, wire=wire,
            label_table=label_table if sem_mode else None)
        buf = jax.lax.dynamic_update_slice(buf, packed, (off, 0))
        return (off + jnp.minimum(cnt, per_budget), buf), (cnt, nact)

    if n_chunks == 1:
        (total, buf), (cnts, nacts) = body((jnp.int32(0), buf0), slots[0])
        cnts, nacts = cnts[None], nacts[None]
    else:
        (total, buf), (cnts, nacts) = jax.lax.scan(
            body, (jnp.int32(0), buf0), slots)
    # Fold the render-row overflow into the cube-overflow channel (same
    # caller contract: any value over budget => incomplete page).
    nacts = nacts + jnp.where(rows_over > 0, cube_budget + 1, 0)
    return buf, total, n_sel, cnts, nacts, slots_flat


def _cycle_geometry(cfg: FusionConfig, page_blocks: int = 256):
    """(chunk, n_chunks, per_budget, cube_budget) for the cycle program:
    chunk x vps3 bounded (the corner-color stack is the peak temporary at
    ~100 MB per 2^20 cubes), kmax >= page_blocks per page (callers size
    this to the expected updated-block count — a cycle larger than the
    page either pages again (hold_grid=True) or retries (streaming))."""
    chunk = max(1, (1 << 20) // cfg.grid.vps3)
    chunk = min(chunk, 256)
    n_chunks = max(1, -(-int(page_blocks) // chunk))
    # Budgets trade per-cycle device time (the compaction sort payload,
    # stage-3 einsums and final gathers all scale with them) against
    # fallback frequency: a bench-scene incremental cycle carries ~20k
    # triangles / ~22k active cubes, a dense GT-world 256-block page ~45k
    # tris. Overflow is safe (legacy fallback, or retry under
    # hold_grid=False) but slow — keep ~2x headroom over the steady state.
    per_budget = int(os.environ.get("KSD_CHUNK_TRI_BUDGET", "49152"))
    cube_budget = int(os.environ.get("KSD_CUBE_BUDGET", "32768"))
    return chunk, n_chunks, per_budget, cube_budget


def extract_mesh_cycle_async(grid: VoxelGrid, cfg: FusionConfig,
                             label_map: Optional[LabelColorMap] = None,
                             only_updated: bool = False,
                             with_normals: bool = False,
                             return_blocks: bool = False,
                             hint_rows: int = 4096,
                             hold_grid: bool = True,
                             page_blocks: int = 256):
    """Dispatch the cycle program NOW (async), return a collect() closure.

    The device program is enqueued against the current grid arrays — an
    immutable snapshot — so the caller may clear `updated` and keep
    integrating immediately; `collect()` (typically run on a worker
    thread) blocks on the fetch and returns the same values as
    extract_mesh_cycle. This is the pipelined serving-mesh transport: the
    >=23 ms tunnel sync + ~20 ms/MB fetch overlap with the next frames'
    integration instead of stalling the stream.

    `hint_rows`: expected triangle count (e.g. the previous cycle's —
    cycle sizes are temporally stable). The scalars and the first
    `~hint_rows` buffer rows ride ONE pipelined device_get; only a larger
    actual count pays a second transfer. Removes the separate count-sync
    round trip (~23 ms) from the steady-state cycle. After collect()
    returns, `collect.total_rows` holds the cycle's triangle count for
    the caller's next hint.

    `hold_grid=False` (streaming callers): the closure keeps NO reference
    to the grid arrays — python refs on them would defeat the
    integrators' buffer donation and force full-grid copies on every
    frame integrated while the cycle is in flight (measured r5:
    ~420 ms/cycle of stalls in the pipelined bench loop). The price: the
    rare legacy fallback (budget overflow) and extra pages (n_sel > kmax)
    cannot run — collect() returns None and the caller must re-mark the
    cycle's blocks updated and retry next cycle."""
    if label_map is not None:
        label_table = jnp.asarray(label_map.label_colors)
    else:
        if cfg.semantic.color_mode == ColorMode.SEMANTIC:
            # Same contract as render_colors — a zero table would
            # silently produce an all-black mesh (review r5).
            raise ValueError("SEMANTIC color mode needs a LabelColorMap")
        label_table = jnp.zeros((256, 3), jnp.uint8)
    chunk, n_chunks, per_budget, cube_budget = _cycle_geometry(cfg,
                                                               page_blocks)
    kmax = chunk * n_chunks
    # The compact u16 fetch wire pays off where transfers are expensive
    # (the TPU tunnel); on CPU the f32 path keeps bit-exact legacy parity
    # (tests). KSD_MESH_WIRE={0,1} overrides.
    wire_env = os.environ.get("KSD_MESH_WIRE")
    wire = (jax.default_backend() in ("tpu", "axon") if wire_env is None
            else wire_env == "1")
    first = _mesh_cycle(grid, label_table, jnp.int32(0), cfg, only_updated,
                        with_normals, chunk, n_chunks, per_budget,
                        cube_budget, wire=wire)
    grid_ref = grid if hold_grid else None
    del grid

    def collect():
        parts, sel_parts = [], []
        start, n_sel, page = 0, None, first
        while n_sel is None or start < n_sel:
            if page is None:     # further pages (rare): dispatch on demand
                if grid_ref is None:
                    return None  # hold_grid=False: caller retries
                page = _mesh_cycle(grid_ref, label_table, jnp.int32(start),
                                   cfg, only_updated, with_normals, chunk,
                                   n_chunks, per_budget, cube_budget,
                                   wire=wire)
            buf, total_d, n_sel_d, cnts_d, nacts_d, slots_d = page
            page = None
            # Optimistic single-round-trip fetch: scalars + the hinted
            # buffer prefix ride one pipelined device_get; only a count
            # above the hint pays a second transfer. Buckets are COARSE
            # (16384 rows) so steady-state cycles reuse one compiled
            # slice program — on the tunnel every fresh trivial compile
            # stalls the stream for hundreds of ms (measured r5).
            n = buf.shape[0]
            b0 = min(n, max(16384,
                            -(-int(hint_rows * 1.3) // 16384) * 16384))
            part0, total, n_sel, cnts, nacts, slots_h = jax.device_get(
                (buf[:b0], total_d, n_sel_d, cnts_d, nacts_d, slots_d))
            if (int(np.max(cnts)) > per_budget
                    or int(np.max(nacts)) > cube_budget):
                # A chunk overflowed its triangle or active-cube budget:
                # the buffer is incomplete. The mesh must be complete —
                # redo via the legacy per-batch path (complete by
                # construction).
                if grid_ref is None:
                    return None  # hold_grid=False: caller retries
                return extract_mesh(grid_ref, cfg, label_map,
                                    only_updated=only_updated,
                                    with_normals=with_normals,
                                    return_blocks=return_blocks,
                                    _force_legacy=True)
            total = int(total)
            if total > b0:
                b1 = min(n, -(-total // 16384) * 16384)
                rest = np.asarray(buf[b0:b1])
                parts.append(np.concatenate([part0, rest])[:total])
            else:
                parts.append(part0[:total])
            # Max across pages: a multi-page cycle's hint must cover its
            # largest page, not whichever page ran last (review r5).
            collect.total_rows = max(getattr(collect, "total_rows", 0),
                                     total)
            sel_parts.append(slots_h[slots_h < cfg.grid.block_capacity])
            start += kmax

        W = ((27 if with_normals else 18) if wire
             else (28 if with_normals else 19))
        dt = np.uint16 if wire else np.float32
        packed = (np.concatenate(parts) if parts
                  else np.zeros((0, W), dt))
        if wire:
            V = cfg.grid.voxels_per_side
            ext = cfg.grid.world_extent_blocks
            lv = packed[:, 0:9].astype(np.float32) * (V / 65535.0) + 0.5
            bc = packed[:, 14:17].astype(np.float32) - ext      # blocks
            v = ((lv.reshape(-1, 3, 3) + (bc * V)[:, None, :])
                 * cfg.grid.voxel_size).reshape(-1, 3).astype(np.float32)
            cw = packed[:, 9:14].astype(np.uint16)
            c9 = np.empty((len(packed), 10), np.uint8)
            c9[:, 0::2] = (cw & 0xFF).astype(np.uint8)
            c9[:, 1::2] = (cw >> 8).astype(np.uint8)
            c = c9[:, :9].reshape(-1, 3)
            nr = None
            if with_normals:
                nr = (packed[:, 18:27].astype(np.float32) / 65535.0 * 2.0
                      - 1.0).reshape(-1, 3).astype(np.float32)
            tri_rows = packed[:, 17].astype(np.int32)
        else:
            v = packed[:, 0:9].reshape(-1, 3).astype(np.float32)
            c = np.clip(packed[:, 9:18].reshape(-1, 3), 0,
                        255).astype(np.uint8)
            off = 18
            nr = None
            if with_normals:
                nr = packed[:, 18:27].reshape(-1, 3).astype(np.float32)
                off = 27
            tri_rows = np.rint(packed[:, off]).astype(np.int32)
        tris = np.arange(len(v), dtype=np.int32).reshape(-1, 3)
        mesh = Mesh(vertices=v, colors=c, triangles=tris, normals=nr)
        if return_blocks:
            sel = (np.concatenate(sel_parts) if sel_parts
                   else np.zeros(0, np.int32))
            return mesh, sel.astype(np.int32), tri_rows
        return mesh

    return collect


def extract_mesh_cycle(grid: VoxelGrid, cfg: FusionConfig,
                       label_map: Optional[LabelColorMap] = None,
                       only_updated: bool = False,
                       with_normals: bool = False,
                       return_blocks: bool = False):
    """extract_mesh via the one-dispatch cycle program, with paging and a
    legacy-path fallback on per-chunk budget overflow. Output is
    row-for-row identical to the legacy extract_mesh."""
    return extract_mesh_cycle_async(grid, cfg, label_map,
                                    only_updated=only_updated,
                                    with_normals=with_normals,
                                    return_blocks=return_blocks)()


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
                    idx_h = np.rint(packed[:, off]).astype(np.int32)
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
