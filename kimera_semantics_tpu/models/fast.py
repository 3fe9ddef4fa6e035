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


@partial(jax.jit, static_argnames=("cfg", "intr"))
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
