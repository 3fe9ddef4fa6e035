"""Fast semantic TSDF integrator — TPU-native.

Capability equivalent of `kimera::FastSemanticTsdfIntegrator`
(kimera_semantics/src/semantic_tsdf_integrator_fast.cpp): speed-first policy
with start-voxel subsampling. The reference's thread pool + work-stealing index
(_fast.cpp:172-191) becomes pure data parallelism over a fixed ray budget; its
approximate concurrent sets become deterministic first-wins scatters
(ops/dedup.py); its per-voxel early ray termination is subsumed by the
commutative scatter-add design (redundant updates are merged, not skipped —
tolerance-based parity, see grid/blocks.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..core.camera import PinholeIntrinsics
from ..grid.blocks import VoxelGrid
from ..ops import dedup as dedup_ops
from ..ops.integrate import integrate_ray_batch
from . import common


@partial(jax.jit, static_argnames=("cfg", "intr"), donate_argnames=("grid",))
def integrate_frame(grid: VoxelGrid, frame: common.Frame,
                    cfg: FusionConfig, intr: PinholeIntrinsics) -> VoxelGrid:
    """One full frame update, jit-compiled end to end."""
    (_, pts_G, origin, colors, labels, weights, valid,
     is_clearing) = common.prepare_points(frame, intr, cfg)

    # Periodic approx-set reset (reference _fast.cpp:165-170; voxblox default
    # clears every frame).
    counter = grid.frame_counter + 1
    do_reset = counter >= cfg.tsdf.clear_checks_every_n_frames
    start_set = jnp.where(do_reset, jnp.full_like(grid.start_set, -1),
                          grid.start_set)
    counter = jnp.where(do_reset, 0, counter)

    # Start-voxel subsampling (reference _fast.cpp:87-91).
    keep, start_set = dedup_ops.start_voxel_dedup(
        start_set, pts_G, valid,
        voxel_size_inv=1.0 / cfg.grid.voxel_size,
        subsampling_factor=cfg.tsdf.start_voxel_subsampling_factor,
    )

    # Compact surviving rays into the static ray budget.
    kept, pts_G, colors, labels, weights, is_clearing = common.compact(
        keep, cfg.pipeline.max_rays, pts_G, colors, labels, weights, is_clearing)

    grid = dataclasses.replace(grid, start_set=start_set, frame_counter=counter)
    return integrate_ray_batch(
        grid, cfg, origin, pts_G, weights, colors, labels, is_clearing, kept)


class FastSemanticTsdfIntegrator:
    """Object-style API mirroring the reference class (factory-compatible)."""

    def __init__(self, cfg: FusionConfig, intr: PinholeIntrinsics):
        self.cfg = cfg
        self.intr = intr

    def integrate(self, grid: VoxelGrid, frame: common.Frame) -> VoxelGrid:
        return integrate_frame(grid, frame, self.cfg, self.intr)


@partial(jax.jit, static_argnames=("cfg", "intr"), donate_argnames=("grid",))
def integrate_frames(grid: VoxelGrid, frames: common.Frame,
                     cfg: FusionConfig, intr: PinholeIntrinsics) -> VoxelGrid:
    """Batched multi-frame update: B frames in one fused stream.

    frames: a Frame whose arrays carry a leading batch axis (B, ...). The B
    frames' compacted rays (each with its own per-ray origin) are concatenated
    into one (B*max_rays,) ray batch and integrated in a single
    integrate_ray_batch call — one sort/scan/scatter pass instead of B,
    amortizing the fixed per-op costs of the segment scatter path.

    Start-voxel dedup runs per frame in order, threading the approx set
    exactly as B sequential integrate_frame calls would (reference resets the
    set every scan at the default clear_checks_every_n_frames=1, so batched
    and sequential integration see the same dedup decisions; with
    clear_every > 1 the set drift matches sequential semantics too).
    """
    B = frames.depth.shape[0]
    R = cfg.pipeline.max_rays
    parts = {k: [] for k in ("origin", "pts", "colors", "labels", "weights",
                             "clearing", "kept")}
    for b in range(B):
        f = jax.tree.map(lambda x: x[b], frames)
        (_, pts_G, origin, colors, labels, weights, valid,
         is_clearing) = common.prepare_points(f, intr, cfg)

        counter = grid.frame_counter + 1
        do_reset = counter >= cfg.tsdf.clear_checks_every_n_frames
        start_set = jnp.where(do_reset, jnp.full_like(grid.start_set, -1),
                              grid.start_set)
        counter = jnp.where(do_reset, 0, counter)
        keep, start_set = dedup_ops.start_voxel_dedup(
            start_set, pts_G, valid,
            voxel_size_inv=1.0 / cfg.grid.voxel_size,
            subsampling_factor=cfg.tsdf.start_voxel_subsampling_factor)
        grid = dataclasses.replace(grid, start_set=start_set,
                                   frame_counter=counter)

        kept, pts_G, colors, labels, weights, is_clearing = common.compact(
            keep, R, pts_G, colors, labels, weights, is_clearing)
        parts["origin"].append(jnp.broadcast_to(origin[None, :],
                                                pts_G.shape))
        parts["pts"].append(pts_G)
        parts["colors"].append(colors)
        parts["labels"].append(labels)
        parts["weights"].append(weights)
        parts["clearing"].append(is_clearing)
        parts["kept"].append(kept)

    cat = {k: jnp.concatenate(v, axis=0) for k, v in parts.items()}
    return integrate_ray_batch(
        grid, cfg, cat["origin"], cat["pts"], cat["weights"], cat["colors"],
        cat["labels"], cat["clearing"], cat["kept"])
