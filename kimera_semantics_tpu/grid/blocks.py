"""VoxelGrid: the block-hashed TSDF + semantic voxel state as one pytree.

TPU-native replacement for the pair of voxblox layers
(`Layer<TsdfVoxel>` + `Layer<SemanticVoxel>`, allocated with identical geometry in
semantic_tsdf_server.cpp:68-69). All channels live in dense fixed-capacity arrays
indexed by (slot, linear voxel); slot `capacity` is a trash row so masked scatters
need no branches.

Storage design (SURVEY 7): instead of the reference's per-voxel mutable state
with clamped in-place updates (voxblox updateTsdfVoxel; semantic log-odds updated
under 4096 hash-striped mutexes, semantic_integrator_base.h:64-66), we store pure
*commutative accumulators* so the per-frame update is a conflict-free scatter-add:

  wsum      = sum of measurement weights              (voxblox voxel.weight)
  wsdf      = sum of weight * truncated-sdf
  wcolor    = sum of weight * RGB                     (color blending)
  sem_count = count of informative label measurements
  sem_delta = (log p - log(1-p)) * per-label counts

The derived quantities reproduce the reference's voxel state:
  distance   = clamp(wsdf / wsum, +-truncation)
  weight     = min(wsum, max_weight)
  color      = wcolor / wsum
  label      = argmax(sem_delta)   [uniform log-odds terms never move the argmax]
  log-odds_l = uniform_prior + sem_count * log(1-p) + sem_delta_l
               (exactly `priors += L @ freq` of semantic_integrator_base.cpp:306
               with the likelihood matrix of :93-128, unknown column zeroed)
Known deviation (documented contract, tolerance-based matching): the reference
clamps the running TSDF mean after *every* measurement and caps weight at
max_weight during accumulation; we clamp each measurement's sdf to the truncation
band before accumulation and cap at read time. Both stay within one truncation
distance of each other; see tests/test_integrate_fast.py oracle comparisons.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import DEFAULT_UNIFORM_LOG_PRIOR, FusionConfig, GridConfig
from . import hash as bhash


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "table_keys", "table_slots", "block_coords", "n_blocks", "overflow",
        "dropped_rays",
        "wsum", "wsdf", "wcolor", "sem_count", "sem_delta", "updated",
        "start_set", "observed_set", "frame_counter",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class VoxelGrid:
    # Block hash table (grid/hash.py).
    table_keys: jnp.ndarray    # (H,) int32
    table_slots: jnp.ndarray   # (H,) int32
    block_coords: jnp.ndarray  # (B, 3) int32
    n_blocks: jnp.ndarray      # () int32
    overflow: jnp.ndarray      # () int32 — STATE-completeness violations:
                               # hash capacity/probe exhaustion, segment- and
                               # block-budget spills. overflow == 0 means every
                               # update the integration policy produced was
                               # applied (the fixed-capacity contract).
    dropped_rays: jnp.ndarray  # () int32 — POLICY-budget input truncation:
                               # band/bundle keeps or carve jobs beyond the
                               # static ray budgets (pipeline.max_rays,
                               # carve_budget, bundle caps). The grid state is
                               # complete for the rays that were taken; this
                               # counts input subsampling beyond the documented
                               # dedup/decimation policy. (ADVICE r2: keep it
                               # separate so overflow==0 keeps meaning "grid
                               # state complete".)
    # Voxel channels; trash row at slot index B. TPU layout note: component/
    # label axes lead (SoA) so the voxel axis stays in vector lanes — a
    # minor dim of 3 or L would be padded to 128 lanes by TPU tiling.
    wsum: jnp.ndarray          # (B+1, V3) f32
    wsdf: jnp.ndarray          # (B+1, V3) f32
    wcolor: jnp.ndarray        # (3, B+1, V3) f32
    sem_count: jnp.ndarray     # (B+1, V3) f32
    sem_delta: jnp.ndarray     # (L, B+1, V3) f32
    updated: jnp.ndarray       # (B+1,) bool — blocks touched since last mesh
    # Approx-set state for ray dedup (fast integrator, _fast.h:98-130).
    start_set: jnp.ndarray     # (D,) int32 hashes
    observed_set: jnp.ndarray  # (D,) int32 hashes
    frame_counter: jnp.ndarray # () int32 — for clear_checks_every_n_frames


def create(cfg: FusionConfig) -> VoxelGrid:
    g = cfg.grid
    B, V3, L, H, D = (g.block_capacity, g.vps3, g.num_labels, g.table_size,
                      cfg.pipeline.dedup_table_size)
    R = g.padded_rows  # B + 8: slots B..B+7 are the trash tile (see config)
    return VoxelGrid(
        table_keys=jnp.full((H,), bhash.EMPTY_KEY, dtype=jnp.int32),
        table_slots=jnp.full((H,), -1, dtype=jnp.int32),
        block_coords=jnp.zeros((B, 3), dtype=jnp.int32),
        n_blocks=jnp.int32(0),
        overflow=jnp.int32(0),
        dropped_rays=jnp.int32(0),
        wsum=jnp.zeros((R, V3), dtype=jnp.float32),
        wsdf=jnp.zeros((R, V3), dtype=jnp.float32),
        wcolor=jnp.zeros((3, R, V3), dtype=jnp.float32),
        sem_count=jnp.zeros((R, V3), dtype=jnp.float32),
        sem_delta=jnp.zeros((L, R, V3), dtype=jnp.float32),
        updated=jnp.zeros((R,), dtype=bool),
        start_set=jnp.full((D,), -1, dtype=jnp.int32),
        observed_set=jnp.full((D,), -1, dtype=jnp.int32),
        frame_counter=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Index math: global voxel coord <-> (block, local)
# Replicates getBlockIndexFromGlobalVoxelIndex / getLocalFromGlobalVoxelIndex
# (used at semantic_integrator_base.cpp:212-251) with floor-division semantics.
# ---------------------------------------------------------------------------

def voxel_to_block_local(voxel_coords: jnp.ndarray, vps: int):
    """(..., 3) int32 global voxel coords -> (block (...,3), local_linear (...,))."""
    block = jnp.floor_divide(voxel_coords, vps)
    local = voxel_coords - block * vps
    lin = (local[..., 0] * vps + local[..., 1]) * vps + local[..., 2]
    return block, lin


def point_to_voxel(points: jnp.ndarray, voxel_size_inv: float) -> jnp.ndarray:
    """World point -> global voxel coord (voxblox getGridIndexFromPoint:
    floor(p * voxel_size_inv + eps))."""
    return jnp.floor(points * voxel_size_inv + 1e-6).astype(jnp.int32)


def voxel_center(voxel_coords: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """Global voxel coord -> world-space voxel center (voxblox
    getCenterPointFromGridIndex)."""
    return (voxel_coords.astype(jnp.float32) + 0.5) * voxel_size


def lookup_slots(grid: VoxelGrid, block_coords: jnp.ndarray,
                 cfg: GridConfig) -> jnp.ndarray:
    """Block coords (..., 3) -> slot ids; unknown/out-of-range -> capacity (trash)."""
    ok = bhash.in_bounds(block_coords, cfg.world_extent_blocks)
    keys = bhash.pack_block_coords(block_coords, cfg.world_extent_blocks)
    slots = bhash.lookup(grid.table_keys, grid.table_slots,
                         keys.reshape(-1), cfg.table_size).reshape(keys.shape)
    return jnp.where(ok & (slots >= 0), slots, cfg.block_capacity)


def allocate_blocks(grid: VoxelGrid, block_coords: jnp.ndarray,
                    active: jnp.ndarray, cfg: GridConfig) -> VoxelGrid:
    """Vectorized allocation pre-pass (replaces the reference's temp-block maps +
    post-integration merge, semantic_integrator_base.cpp:205-265)."""
    ok = bhash.in_bounds(block_coords, cfg.world_extent_blocks)
    keys = bhash.pack_block_coords(block_coords, cfg.world_extent_blocks)
    tk, ts, bc, nb, ov = bhash.insert(
        grid.table_keys, grid.table_slots, grid.block_coords, grid.n_blocks,
        keys.reshape(-1), (active & ok).reshape(-1),
        cfg.table_size, cfg.block_capacity, cfg.world_extent_blocks)
    return dataclasses.replace(
        grid, table_keys=tk, table_slots=ts, block_coords=bc, n_blocks=nb,
        overflow=grid.overflow + ov)


# ---------------------------------------------------------------------------
# Derived voxel state (read-side of the accumulator design).
# ---------------------------------------------------------------------------

def tsdf_distance(grid: VoxelGrid, truncation: float) -> jnp.ndarray:
    w = jnp.maximum(grid.wsum, 1e-12)
    return jnp.clip(grid.wsdf / w, -truncation, truncation)


def tsdf_weight(grid: VoxelGrid, max_weight: float) -> jnp.ndarray:
    return jnp.minimum(grid.wsum, max_weight)


def voxel_color(grid: VoxelGrid) -> jnp.ndarray:
    """Blended measured color, (3, B+1, V3) uint8 (voxblox blendTwoColors
    chain)."""
    w = jnp.maximum(grid.wsum, 1e-12)[None]
    return jnp.clip(grid.wcolor / w, 0.0, 255.0).astype(jnp.uint8)


def mle_labels(grid: VoxelGrid) -> jnp.ndarray:
    """Per-voxel MLE label (B+1, V3) = argmax over log-odds
    (calculateMaximumLikelihoodLabel, semantic_integrator_base.cpp:352-367).
    Uniform terms (prior + count * log(1-p)) cancel; ties -> lowest index,
    matching Eigen maxCoeff, so untouched voxels report label 0 (unknown)."""
    return jnp.argmax(grid.sem_delta, axis=0).astype(jnp.int32)


def label_logodds(grid: VoxelGrid, log_match: float, log_nonmatch: float) -> jnp.ndarray:
    """Full unnormalized log-odds (L, B+1, V3) — the reference's
    `semantic_priors` (semantic_voxel.h:19-23 init; updated at
    semantic_integrator_base.cpp:283-314)."""
    return (DEFAULT_UNIFORM_LOG_PRIOR
            + grid.sem_count[None] * log_nonmatch
            + grid.sem_delta)
