"""Multi-host bring-up and streaming (config 5 of BASELINE.json).

Replaces the reference's ROS1 TCPROS pub/sub + TF tree transport (SURVEY 2c,
5.8) with single-controller JAX: `jax.distributed` + a global mesh whose `grid`
axis spans every device on every host. Each host ingests its own frame stream
(data-parallel); the per-step ray all_gather of parallel/sharding.py rides ICI
within a slice and DCN across slices — no other cross-host communication is
needed because block ownership is hash-partitioned.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..core.camera import PinholeIntrinsics
from ..models.common import Frame
from . import sharding


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up (no-op for single-process runs)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_batch_to_global(frames: Frame, mesh) -> Frame:
    """Place this host's per-local-device frame batch into the global array.

    frames: leading axis == number of *local* devices. Uses
    make_array_from_process_local_data so each host contributes its slice of
    the globally sharded frame batch."""
    spec = jax.sharding.PartitionSpec(sharding.AXIS)
    ns = jax.NamedSharding(mesh, spec)

    def place(x):
        x = np.asarray(x)
        global_shape = (mesh.devices.size,) + x.shape[1:]
        return jax.make_array_from_process_local_data(ns, x, global_shape)

    return jax.tree.map(place, frames)


class MultiHostPipeline:
    """Continuous multi-host ingestion: every step consumes one frame per
    device globally, integrates into the sharded grid, optionally meshes."""

    def __init__(self, cfg: FusionConfig, intr: PinholeIntrinsics,
                 mesh=None, method: str = "fast", label_map=None):
        if method not in ("fast", "merged", "projective"):
            raise ValueError(f"unknown sharded method {method!r}")
        self.cfg = cfg
        self.intr = intr
        self.label_map = label_map
        self.mesh = mesh if mesh is not None else sharding.make_mesh()
        self.sgrid = sharding.create_sharded(cfg, self.mesh)
        self.steps = 0
        if method == "projective":
            self._step_fn = sharding.integrate_frames_sharded_projective
        else:
            from functools import partial as _partial
            self._step_fn = _partial(sharding.integrate_frames_sharded,
                                     method=method)
        self.mirror = None      # lazy (ShardMirror + MeshLayerCache)
        self.mesh_cache = None

    @property
    def frames_per_step(self) -> int:
        """Frames this process contributes per step = this process's device
        count *within the mesh* (a sub-mesh may use fewer than
        jax.local_devices())."""
        me = jax.process_index()
        return sum(1 for d in self.mesh.devices.flat if d.process_index == me)

    def step(self, local_frames: Frame):
        """local_frames: leading axis = local device count."""
        frames = local_batch_to_global(local_frames, self.mesh)
        self.sgrid = self._step_fn(
            self.sgrid, frames, self.cfg, self.intr, self.mesh)
        self.steps += 1
        return self.sgrid

    def run(self, frame_iter: Iterable[Frame], max_steps: Optional[int] = None):
        batch = []
        n = self.frames_per_step
        for f in frame_iter:
            batch.append(f)
            if len(batch) == n:
                self.step(Frame(
                    depth=jnp.stack([b.depth for b in batch]),
                    labels=jnp.stack([b.labels for b in batch]),
                    colors=jnp.stack([b.colors for b in batch]),
                    T_G_C=jnp.stack([b.T_G_C for b in batch])))
                batch = []
                if max_steps is not None and self.steps >= max_steps:
                    break
        return self.sgrid

    def merged_grid(self):
        """Full host-side shard merge (one-shot export; the live mesh loop
        uses the incremental mirror below instead)."""
        return sharding.merge_shards(self.sgrid, self.cfg)

    # -- incremental meshing (VERDICT r2 item 5) ---------------------------

    def _ensure_mirror(self):
        if self.mirror is None:
            from ..server import viz
            self.mirror = sharding.ShardMirror(self.cfg,
                                               self.mesh.devices.size)
            self.mesh_cache = viz.MeshLayerCache()

    def update_mesh(self):
        """Incremental mesh cycle: sync only shard rows updated since the
        last call into the host mirror, re-mesh exactly those blocks, and
        replace them in the MeshLayerCache (voxblox MeshLayer semantics —
        per-cycle work and device->host traffic scale with updated blocks).
        Returns the full growing Mesh."""
        from ..ops import mesh as mesh_ops
        self._ensure_mirror()
        self.sgrid = self.mirror.sync(self.sgrid)
        out = mesh_ops.extract_mesh(self.mirror.grid, self.mirror.cfg,
                                    self.label_map, only_updated=True,
                                    return_blocks=True)
        m, meshed_rows, tri_rows = out
        self.mesh_cache.update(m, meshed_rows, tri_rows)
        self.mirror.clear_updated()
        return self.mesh_cache.full_mesh()

    def full_grid(self):
        """Complete (all allocated rows) sync of the mirror — final export /
        save path. Returns (VoxelGrid, merged FusionConfig)."""
        self._ensure_mirror()
        self.sgrid = self.mirror.sync(self.sgrid, all_rows=True)
        return self.mirror.grid, self.mirror.cfg
