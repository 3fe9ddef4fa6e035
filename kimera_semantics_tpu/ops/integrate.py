"""The fused per-frame voxel update: raycast -> allocate -> scatter-add.

This is the TPU-native equivalent of the reference's hot loops
(semantic_tsdf_integrator_fast.cpp:66-142 per-point/per-voxel loops and
_merged.cpp:235-328 per-bundle loop). Where the reference walks rays serially
under striped mutexes, here every (ray, step) pair becomes one element of a
dense update stream that is scatter-added into the grid accumulators — all
updates are commutative, so no locks, no temp-block maps, no ordering.

Pipeline (all inside one jit):
  1. DDA-expand R rays into (R, S) voxel coordinates (ops/raycast.py).
  2. Allocation pre-pass: consecutive-dedup the (R, S) block keys and batch-insert
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

from ..config import FusionConfig
from ..grid import blocks as gblocks
from ..grid.blocks import VoxelGrid
from . import raycast, semantic, tsdf


def integrate_ray_batch(
    grid: VoxelGrid,
    cfg: FusionConfig,
    origin: jnp.ndarray,         # (3,)
    points_G: jnp.ndarray,       # (R, 3)
    weights: jnp.ndarray,        # (R,) voxblox getVoxelWeight output
    colors: jnp.ndarray,         # (R, 3) float32 in [0, 255]
    labels: jnp.ndarray,         # (R,) int32 semantic label ids
    is_clearing: jnp.ndarray,    # (R,) bool
    ray_valid: jnp.ndarray,      # (R,) bool
    label_hist: Optional[jnp.ndarray] = None,  # (R, L) merged-integrator histograms
) -> VoxelGrid:
    g = cfg.grid
    t = cfg.tsdf
    vps, v3, cap, L = g.voxels_per_side, g.vps3, g.block_capacity, g.num_labels
    S = cfg.resolved_max_steps()

    # --- 1. DDA expansion -------------------------------------------------
    start_s, end_s = raycast.setup_rays(
        origin, points_G, is_clearing,
        voxel_size=g.voxel_size,
        truncation_distance=t.truncation_distance,
        max_ray_length_m=t.max_ray_length_m,
        voxel_carving_enabled=t.voxel_carving_enabled,
    )
    voxels, step_valid = raycast.traverse(start_s, end_s, S)
    step_valid = step_valid & ray_valid[:, None]

    # --- 2. Block allocation pre-pass ------------------------------------
    block, local = gblocks.voxel_to_block_local(voxels, vps)
    # A ray stays in one block for ~vps consecutive steps; inserting only
    # block-transition entries shrinks the insert stream by that factor.
    changed = jnp.ones(block.shape[:-1], dtype=bool)
    changed = changed.at[:, 1:].set(jnp.any(block[:, 1:] != block[:, :-1], axis=-1))
    grid = gblocks.allocate_blocks(
        grid, block.reshape(-1, 3), (step_valid & changed).reshape(-1), g)

    # --- 3. Slot lookup ---------------------------------------------------
    slots = gblocks.lookup_slots(grid, block, g)       # (R, S), trash = cap
    slots = jnp.where(step_valid, slots, cap)
    key = slots * v3 + local                            # flat into (cap+1)*v3

    # --- 4. Update terms --------------------------------------------------
    sdf = tsdf.projective_sdf(origin, points_G, voxels, g.voxel_size)
    w, w_sdf, color_gate = tsdf.update_terms(sdf, weights[:, None], t, g.voxel_size)
    w = jnp.where(step_valid, w, 0.0)
    w_sdf = jnp.where(step_valid, w_sdf, 0.0)
    wc = jnp.where((step_valid & color_gate)[..., None],
                   w[..., None] * colors[:, None, :], 0.0)

    # --- 5. Scatter-add ---------------------------------------------------
    flat = lambda a: a.reshape((cap + 1) * v3, *a.shape[2:])
    wsum = flat(grid.wsum).at[key].add(w).reshape(grid.wsum.shape)
    wsdf = flat(grid.wsdf).at[key].add(w_sdf).reshape(grid.wsdf.shape)
    wcolor = flat(grid.wcolor).at[key].add(wc).reshape(grid.wcolor.shape)

    if label_hist is None:
        # Fast integrator: one label per ray -> scalar adds at (key, label)
        # (one-hot frequency, semantic_tsdf_integrator_fast.cpp:132-140).
        inform = semantic.informative(labels) & ray_valid
        cnt = jnp.where(step_valid & inform[:, None], 1.0, 0.0)
        sem_count = flat(grid.sem_count).at[key].add(cnt).reshape(
            grid.sem_count.shape)
        lk = make_likelihood_cached(cfg)
        lbl = jnp.broadcast_to(labels[:, None], key.shape)
        sem_delta = flat(grid.sem_delta).at[key, lbl].add(cnt * lk.delta).reshape(
            grid.sem_delta.shape)
    else:
        # Merged integrator: full per-ray histogram applied to every traversed
        # voxel (_merged.cpp:254-328). Unknown column contributes nothing.
        lk = make_likelihood_cached(cfg)
        hist = label_hist.at[:, semantic.UNKNOWN_LABEL].set(0.0)
        total = jnp.sum(hist, axis=-1)                           # (R,)
        cnt = jnp.where(step_valid, total[:, None], 0.0)
        sem_count = flat(grid.sem_count).at[key].add(cnt).reshape(
            grid.sem_count.shape)
        sem_delta_flat = flat(grid.sem_delta)
        for lab in range(L):  # static L scatters of (R, S) scalars
            add = jnp.where(step_valid, hist[:, lab][:, None], 0.0) * lk.delta
            sem_delta_flat = sem_delta_flat.at[key, lab].add(add)
        sem_delta = sem_delta_flat.reshape(grid.sem_delta.shape)

    updated = grid.updated.at[slots.reshape(-1)].set(True, mode="drop")

    return dataclasses.replace(
        grid, wsum=wsum, wsdf=wsdf, wcolor=wcolor,
        sem_count=sem_count, sem_delta=sem_delta, updated=updated)


_LIKELIHOOD_CACHE = {}


def make_likelihood_cached(cfg: FusionConfig) -> semantic.Likelihood:
    key = cfg.semantic.semantic_measurement_probability
    if key not in _LIKELIHOOD_CACHE:
        _LIKELIHOOD_CACHE[key] = semantic.make_likelihood(cfg.semantic)
    return _LIKELIHOOD_CACHE[key]
