"""Projective TSDF update math (voxblox-inherited surface, SURVEY 2b).

Re-derivation of voxblox `TsdfIntegratorBase::{computeDistance, getVoxelWeight,
updateTsdfVoxel}` as pure, batched functions feeding the accumulator design in
grid/blocks.py. Used at semantic_tsdf_integrator_fast.cpp:124-128 and
_merged.cpp:315-319 in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import TsdfConfig
from ..grid.blocks import voxel_center


def point_validity(points_C: jnp.ndarray, cfg: TsdfConfig):
    """voxblox `isPointValid`: returns (valid, is_clearing).

    - |p| < min_ray_length  -> invalid
    - |p| > max_ray_length  -> clearing ray if allow_clear, else invalid
    - non-finite            -> invalid
    """
    norm = jnp.linalg.norm(points_C, axis=-1)
    finite = jnp.all(jnp.isfinite(points_C), axis=-1)
    too_close = norm < cfg.min_ray_length_m
    beyond = norm > cfg.max_ray_length_m
    is_clearing = beyond & cfg.allow_clear
    valid = finite & ~too_close & (~beyond | cfg.allow_clear)
    return valid, is_clearing


def voxel_weight(points_C: jnp.ndarray, cfg: TsdfConfig) -> jnp.ndarray:
    """voxblox `getVoxelWeight`: 1 if const-weight else 1/z^2 (camera-frame z)."""
    if cfg.use_const_weight:
        return jnp.ones(points_C.shape[:-1], dtype=jnp.float32)
    z = jnp.abs(points_C[..., 2])
    return jnp.where(z > 1e-6, 1.0 / jnp.maximum(z * z, 1e-12), 0.0)


def projective_sdf(origin: jnp.ndarray, points_G: jnp.ndarray,
                   voxel_coords: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """voxblox `computeDistance`: signed distance of the voxel center to the
    surface point, measured along the ray.

      sdf = |p - o| - (c - o) . (p - o) / |p - o|

    origin (3,) or (R, 3); points_G (R, 3); voxel_coords (R, S, 3).
    """
    center = voxel_center(voxel_coords, voxel_size)
    origin = jnp.broadcast_to(origin, points_G.shape)
    v_point = points_G - origin
    dist_g = jnp.linalg.norm(v_point, axis=-1, keepdims=True)  # (R, 1)
    v_voxel = center - origin[:, None, :]
    dist_gv = jnp.sum(v_voxel * v_point[:, None, :], axis=-1) / jnp.maximum(
        dist_g, 1e-12)
    return dist_g - dist_gv


def projective_sdf_soa(origin: jnp.ndarray, points_G: jnp.ndarray,
                       vx: jnp.ndarray, vy: jnp.ndarray, vz: jnp.ndarray,
                       voxel_size: float) -> jnp.ndarray:
    """Structure-of-arrays variant of projective_sdf for the (S, R) hot path:
    voxel coords as three (S, R) planes; origin (3,) or (R, 3)."""
    origin = jnp.broadcast_to(origin, points_G.shape)           # (R, 3)
    v_point = points_G - origin                                 # (R, 3)
    dist_g = jnp.sqrt(jnp.sum(v_point * v_point, axis=-1))      # (R,)
    half = jnp.float32(0.5)
    num = jnp.zeros(vx.shape, dtype=jnp.float32)
    for comp, o_c, p_c in ((vx, origin[:, 0], v_point[:, 0]),
                           (vy, origin[:, 1], v_point[:, 1]),
                           (vz, origin[:, 2], v_point[:, 2])):
        center = (comp.astype(jnp.float32) + half) * voxel_size
        num = num + (center - o_c[None, :]) * p_c[None, :]
    dist_gv = num / jnp.maximum(dist_g, 1e-12)[None, :]
    return dist_g[None, :] - dist_gv


def update_terms(sdf: jnp.ndarray, weight: jnp.ndarray, cfg: TsdfConfig,
                 voxel_size: float):
    """Per-measurement accumulator contributions.

    Replicates voxblox updateTsdfVoxel's weight drop-off (behind-surface
    measurements fade linearly to zero over [-dropoff_eps, -truncation],
    dropoff_eps = voxel_size) and color-blend gating (|sdf| < truncation).
    The measurement sdf is clamped to the truncation band before accumulation
    (see grid/blocks.py docstring for the deviation contract).

    Returns (w, w_sdf, color_gate) with shapes of `sdf`.
    """
    trunc = cfg.truncation_distance
    if cfg.use_weight_dropoff:
        dropoff_eps = voxel_size
        scale = (trunc + sdf) / jnp.maximum(trunc - dropoff_eps, 1e-12)
        w = jnp.where(sdf < -dropoff_eps,
                      jnp.maximum(weight * scale, 0.0), weight)
    else:
        w = weight
    clamped = jnp.clip(sdf, -trunc, trunc)
    color_gate = jnp.abs(sdf) < trunc
    return w, w * clamped, color_gate
