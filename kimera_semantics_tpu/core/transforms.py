"""SE(3) transforms as plain jnp arrays (minkindr-equivalent, SURVEY 2b).

The reference represents poses as minkindr `Transformation` (quaternion + translation)
and composes T_G_C = T_G_B * T_B_C (kimera_semantics_ros/src/kimera_semantics_rosbag.cpp:124-133).
Here a transform is a pytree-friendly (4, 4) float32 row-major matrix; helpers build it
from quaternion+translation so dataset poses load directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def from_quat_trans(qxyzw: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build a 4x4 transform from quaternion (x, y, z, w) and translation (3,)."""
    q = qxyzw / jnp.linalg.norm(qxyzw)
    x, y, z, w = q[0], q[1], q[2], q[3]
    rot = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)]),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)]),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]),
        ]
    )
    top = jnp.concatenate([rot, t.reshape(3, 1)], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)
    return jnp.concatenate([top, bottom], axis=0).astype(jnp.float32)


def identity() -> jnp.ndarray:
    return jnp.eye(4, dtype=jnp.float32)


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """T_a_c = T_a_b @ T_b_c (explicit f32 precision — bf16 matmul defaults
    on TPU backends would cost centimeters at range)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def inverse(t: jnp.ndarray) -> jnp.ndarray:
    r = t[:3, :3]
    p = t[:3, 3]
    rt = r.T
    top = jnp.concatenate([rt, (-rt @ p).reshape(3, 1)], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=t.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def apply(t: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply T (4,4) to points (..., 3)."""
    return jnp.matmul(points, t[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST) + t[:3, 3]


def translation(t: jnp.ndarray) -> jnp.ndarray:
    return t[:3, 3]
