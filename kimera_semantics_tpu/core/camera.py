"""Pinhole camera back-projection: depth (+label/color) images -> ray batches.

TPU-native equivalent of `PointCloudFromDepth::convert<T>`
(kimera_semantics_ros/include/kimera_semantics_ros/depth_map_to_pointcloud.h:213-275):
x = (u - cx) * z / fx, y = (v - cy) * z / fy, invalid depth -> masked out
(the reference emits NaN points; we carry an explicit validity mask instead, which
is the XLA-friendly formulation). Depth is metric float32; `depth_from_millimeters`
covers the reference's 16UC1 (mm) encoding (depth_map_to_pointcloud.h:183-204).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PinholeIntrinsics:
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    def scaled(self, width: int, height: int) -> "PinholeIntrinsics":
        """Rescale intrinsics when image resolution differs from calibration
        (reference rescales rgb + intrinsics, depth_map_to_pointcloud.h:91-137)."""
        sx = width / self.width
        sy = height / self.height
        return PinholeIntrinsics(
            fx=self.fx * sx, fy=self.fy * sy, cx=self.cx * sx, cy=self.cy * sy,
            width=width, height=height,
        )


def depth_from_millimeters(depth_u16: jnp.ndarray) -> jnp.ndarray:
    """16UC1 depth (mm) -> float32 meters; 0 means invalid (stays 0)."""
    return depth_u16.astype(jnp.float32) * 1e-3


def backproject(
    depth_m: jnp.ndarray, intr: PinholeIntrinsics
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Back-project a (H, W) metric depth image into camera-frame points.

    Returns (points_C (H*W, 3) float32, valid (H*W,) bool). Invalid = nonpositive
    or non-finite depth (reference: depth_map_to_pointcloud.h:245-274).
    """
    h, w = depth_m.shape
    z = depth_m.astype(jnp.float32)
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = (u - intr.cx) * z / intr.fx
    y = (v - intr.cy) * z / intr.fy
    pts = jnp.stack([x, y, jnp.broadcast_to(z, (h, w))], axis=-1).reshape(-1, 3)
    valid = (jnp.isfinite(z) & (z > 0.0)).reshape(-1)
    pts = jnp.where(valid[:, None], pts, 0.0)
    return pts, valid
