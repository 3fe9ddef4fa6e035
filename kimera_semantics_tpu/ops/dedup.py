"""Approximate start-voxel dedup — the fast integrator's ray subsampler.

Replicates the *intent and statistics* of voxblox `ApproxHashSet.replaceHash`
as used at semantic_tsdf_integrator_fast.cpp:87-91: rays whose start points fall
into the same (subsampling_factor x finer) voxel are integrated only once; hash
collisions may over-suppress (the reference tolerates false positives/negatives
by design, _fast.h:90-96). The serial thread race is replaced by a deterministic
first-wins scatter (SURVEY 2c).

Set state lives in VoxelGrid.start_set and persists across frames until the
periodic reset (`clear_checks_every_n_frames`, _fast.cpp:165-170; voxblox
default resets every frame).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..grid.hash import mix


def _mix3(coords: jnp.ndarray, salt: int) -> jnp.ndarray:
    x = coords[..., 0] * jnp.int32(73856093)
    y = coords[..., 1] * jnp.int32(19349669)
    z = coords[..., 2] * jnp.int32(83492791)
    return mix(x ^ y ^ z ^ jnp.int32(salt))


def start_voxel_dedup(
    start_set: jnp.ndarray,       # (D,) int32 stored tags
    points_G: jnp.ndarray,        # (N, 3)
    active: jnp.ndarray,          # (N,) bool
    *,
    voxel_size_inv: float,
    subsampling_factor: float,
):
    """Returns (keep (N,) bool, new start_set)."""
    d = start_set.shape[0]
    coords = jnp.floor(points_G * (subsampling_factor * voxel_size_inv)).astype(
        jnp.int32)
    bucket = _mix3(coords, 0x1E3779B9) & (d - 1)
    tag = _mix3(coords, 0x5BD1E995)

    fresh = start_set[bucket] != tag                     # not already in the set
    # First-wins arbitration among this batch: scatter own index, read back.
    n = points_G.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    contend = active & fresh
    winner_tbl = jnp.full((d,), -1, dtype=jnp.int32)
    winner_tbl = winner_tbl.at[jnp.where(contend, bucket, d)].set(idx, mode="drop")
    keep = contend & (winner_tbl[bucket] == idx)

    start_set = start_set.at[jnp.where(keep, bucket, d)].set(tag, mode="drop")
    return keep, start_set
