"""Synthetic camera rendering from the analytic world via sphere tracing.

Equivalent of the reference SimulationServer's viewpoint rendering (CS3:
`run()` renders a synthetic pointcloud per viewpoint from the GT world). We
render (depth, label) images with a pinhole model so the full image pipeline
(backprojection included) is exercised end-to-end — this is the test fixture
and the bench.py data source (SURVEY section 4 "implication").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.camera import PinholeIntrinsics
from . import world as sim_world

MAX_MARCH_STEPS = 96
HIT_EPS = 1e-3


@partial(jax.jit, static_argnames=("intr", "max_depth"))
def render_depth_labels(world: sim_world.World, T_G_C: jnp.ndarray,
                        intr: PinholeIntrinsics, max_depth: float = 20.0):
    """Sphere-trace a (H, W) depth image + label image from camera pose T_G_C.

    Camera convention matches the backprojection model (core/camera.py):
    +z forward, x right, y down. Returns (depth (H,W) f32 — 0 where no hit,
    labels (H,W) int32)."""
    h, w = intr.height, intr.width
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    dirs_c = jnp.stack([
        jnp.broadcast_to((u - intr.cx) / intr.fx, (h, w)),
        jnp.broadcast_to((v - intr.cy) / intr.fy, (h, w)),
        jnp.ones((h, w), dtype=jnp.float32),
    ], axis=-1)
    # Depth along +z equals t in p = o + d * t with d_z = 1 (unnormalized dirs);
    # march in arclength: step = sdf / |d|.
    dirs_g = dirs_c @ T_G_C[:3, :3].T
    origin = T_G_C[:3, 3]
    norm = jnp.linalg.norm(dirs_g, axis=-1)

    def body(state):
        t, hit, it = state
        p = origin + dirs_g * t[..., None]
        sdf, _ = sim_world.world_sdf(world, p)
        hit = hit | (sdf < HIT_EPS)
        t = jnp.where(hit, t, t + sdf / norm)
        return t, hit, it + 1

    def cond(state):
        t, hit, it = state
        return (it < MAX_MARCH_STEPS) & jnp.any(~hit & (t < max_depth))

    t0 = jnp.full((h, w), 1e-3, dtype=jnp.float32)
    t, hit, _ = jax.lax.while_loop(
        cond, body, (t0, jnp.zeros((h, w), dtype=bool), jnp.int32(0)))

    p = origin + dirs_g * t[..., None]
    _, labels = sim_world.world_sdf(world, p)
    depth = jnp.where(hit & (t < max_depth), t, 0.0)
    labels = jnp.where(hit & (t < max_depth), labels, 0)
    return depth, labels


def orbit_pose(angle: float, radius: float = 3.2, height: float = 2.2,
               target=(0.0, 0.0, 1.5)) -> jnp.ndarray:
    # NB: the eval world's sphere has radius 2 at (0,0,2)
    # (semantic_simulation_eval.cpp:16-34) — the default orbit stays outside
    # it with >1 m clearance so depths exceed min_ray_length.
    """Camera on a circle looking at `target` — the eval harness's viewpoint
    sweep (launch/kimera_semantics_eval.launch: 50 generated viewpoints)."""
    import numpy as np
    eye = np.array([radius * np.cos(angle), radius * np.sin(angle), height])
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    world_up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, world_up)
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    T = np.eye(4, dtype=np.float32)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, fwd, eye
    return jnp.asarray(T)
