"""Batch Euclidean SDF generation from the TSDF grid.

Equivalent of the reference's batch ESDF pass (`EsdfServer.updateEsdfBatch`
with full_euclidean=true, kimera_semantics_rosbag.cpp:153-167). Voxblox
propagates distances with a CPU brushfire; the TPU-native re-derivation is a
jump-flooding pass (log2(N) sweeps of 6/26-neighbor gathers — massively
parallel, no priority queues): near-surface TSDF voxels seed their own centers,
every voxel then converges to its nearest seed, and the Euclidean distance is
signed by the local TSDF sign.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..grid import blocks as gblocks
from ..grid.blocks import VoxelGrid

_NEIGHBORS = np.array([d for d in np.ndindex(3, 3, 3)], dtype=np.int32) - 1  # 27


@dataclasses.dataclass
class EsdfResult:
    """Dense ESDF over the allocated AABB (host-friendly)."""

    origin_voxel: np.ndarray  # (3,) int32 — voxel coord of grid[0,0,0]
    distance: np.ndarray      # (X, Y, Z) float32 signed Euclidean distance
    observed: np.ndarray      # (X, Y, Z) bool — seeded from observed TSDF

    def sample(self, voxel_coords: np.ndarray) -> np.ndarray:
        idx = np.asarray(voxel_coords) - self.origin_voxel
        return self.distance[idx[..., 0], idx[..., 1], idx[..., 2]]


@partial(jax.jit, static_argnames=("shape", "max_dist"))
def _jump_flood(seed_pos: jnp.ndarray, seed_mask: jnp.ndarray,
                seed_val: jnp.ndarray, centers: jnp.ndarray, shape,
                max_dist: float):
    """JFA over seed voxel centers. Each seed carries its own |tsdf| residual
    (`seed_val`) — the distance estimate at a voxel is
    |center - seed_center| + seed_residual, matching the true Euclidean
    distance to the zero crossing to first order."""
    X, Y, Z = shape
    big = jnp.float32(max_dist * 4.0)
    best_pos = jnp.where(seed_mask[..., None], seed_pos, big)
    best_val = jnp.where(seed_mask, seed_val, 0.0)
    best_d = jnp.where(seed_mask,
                       jnp.linalg.norm(seed_pos - centers, axis=-1) + best_val,
                       big)

    steps = []
    s = 1 << int(np.ceil(np.log2(max(X, Y, Z))))
    while s >= 1:
        steps.append(s)
        s //= 2

    nbr = jnp.asarray(_NEIGHBORS)

    ii = jnp.arange(X)[:, None, None]
    jj = jnp.arange(Y)[None, :, None]
    kk = jnp.arange(Z)[None, None, :]

    def one_step(carry, step):
        best_pos, best_val, best_d = carry

        def try_neighbor(i, carry):
            best_pos, best_val, best_d = carry
            off = nbr[i] * step
            shift = (-off[0], -off[1], -off[2])
            cand_pos = jnp.roll(best_pos, shift=shift, axis=(0, 1, 2))
            cand_val = jnp.roll(best_val, shift=shift, axis=(0, 1, 2))
            # jnp.roll wraps — mask lanes whose source index left the volume,
            # else far-boundary seeds leak across as fake neighbors.
            src_ok = ((ii + off[0] >= 0) & (ii + off[0] < X)
                      & (jj + off[1] >= 0) & (jj + off[1] < Y)
                      & (kk + off[2] >= 0) & (kk + off[2] < Z))
            d = jnp.linalg.norm(cand_pos - centers, axis=-1) + cand_val
            better = src_ok & (d < best_d)
            best_pos = jnp.where(better[..., None], cand_pos, best_pos)
            best_val = jnp.where(better, cand_val, best_val)
            best_d = jnp.where(better, d, best_d)
            return best_pos, best_val, best_d

        carry = jax.lax.fori_loop(0, 27, try_neighbor,
                                  (best_pos, best_val, best_d))
        return carry, None

    (best_pos, best_val, best_d), _ = jax.lax.scan(
        one_step, (best_pos, best_val, best_d), jnp.asarray(steps))
    return best_d


def compute_esdf(grid: VoxelGrid, cfg: FusionConfig,
                 max_dist: float = 4.0) -> EsdfResult:
    """Batch ESDF over the axis-aligned bounds of allocated blocks."""
    g = cfg.grid
    vps = g.voxels_per_side
    nb = int(grid.n_blocks)
    if nb == 0:
        return EsdfResult(np.zeros(3, np.int32), np.zeros((0, 0, 0), np.float32),
                          np.zeros((0, 0, 0), bool))
    coords = np.asarray(grid.block_coords[:nb])
    lo = coords.min(axis=0)
    hi = coords.max(axis=0) + 1
    dims = tuple(int(d) * vps for d in (hi - lo))

    # Densify tsdf/weight over the AABB (missing blocks -> unobserved).
    bx, by, bz = (np.arange(lo[d], hi[d]) for d in range(3))
    all_blocks = np.stack(np.meshgrid(bx, by, bz, indexing="ij"),
                          axis=-1).reshape(-1, 3)
    slots = gblocks.lookup_slots(grid, jnp.asarray(all_blocks, dtype=jnp.int32),
                                 g)
    tsdf = gblocks.tsdf_distance(grid, cfg.tsdf.truncation_distance)

    @partial(jax.jit, static_argnames=("dims",))
    def densify(tsdf, wsum, slots, dims):
        nbx, nby, nbz = dims[0] // vps, dims[1] // vps, dims[2] // vps
        d = tsdf[slots].reshape(nbx, nby, nbz, vps, vps, vps)
        w = wsum[slots].reshape(nbx, nby, nbz, vps, vps, vps)
        to_dense = lambda a: a.transpose(0, 3, 1, 4, 2, 5).reshape(dims)
        return to_dense(d), to_dense(w)

    dense_d, dense_w = densify(tsdf, grid.wsum, slots, dims)

    ii = [jnp.arange(dims[d], dtype=jnp.float32) + lo[d] * vps + 0.5
          for d in range(3)]
    centers = jnp.stack(jnp.meshgrid(*ii, indexing="ij"), axis=-1) * g.voxel_size

    # Seeds: observed voxels inside the truncation band; the surface point is
    # the voxel center pushed to the zero crossing is approximated by the voxel
    # center itself offset along the TSDF gradient; first-order: centers are
    # used with the residual tsdf added to the final distance.
    observed = dense_w > 1e-6
    near = observed & (jnp.abs(dense_d) < cfg.tsdf.truncation_distance * 0.99)
    dist = _jump_flood(centers, near, jnp.abs(dense_d), centers, dims, max_dist)

    # Signed: negative inside surfaces (tsdf < 0 at observed voxels).
    signed = jnp.where(observed & (dense_d < 0), -dist, dist)
    signed = jnp.clip(signed, -max_dist, max_dist)
    # Near-surface voxels keep their (more accurate) TSDF value.
    signed = jnp.where(near, dense_d, signed)

    return EsdfResult(origin_voxel=(lo * vps).astype(np.int32),
                      distance=np.asarray(signed),
                      observed=np.asarray(observed))
