"""Analytic SDF simulation world — the framework's synthetic GT generator.

Capability equivalent of `kimera::SemanticSimulationWorld` +
`vxb::SimulationWorld` (kimera_semantics/simulation/semantic_simulation_world.cpp):
primitive objects with exact signed-distance functions, each carrying the
reference's primitive->label convention {Sphere->1, Cube->2, Plane->3,
Cylinder->4} (:5-33). `generate_semantic_sdf` fills a VoxelGrid with
nearest-object distance + label (:35-97, GT label prior p=1 via a large
log-odds delta, :99-109); sim/render.py ray-marches synthetic depth/label
frames from camera poses (the SimulationServer viewpoint loop, CS3).

Pure-JAX: objects are a struct-of-arrays pytree so SDF evaluation over millions
of query points is one vectorized min-reduction.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..grid import blocks as gblocks
from ..grid.blocks import VoxelGrid

# Reference label convention (semantic_simulation_world.cpp:5-33).
SPHERE, CUBE, PLANE, CYLINDER = 0, 1, 2, 3
PRIMITIVE_LABELS = {SPHERE: 1, CUBE: 2, PLANE: 3, CYLINDER: 4}


@partial(jax.tree_util.register_dataclass,
         data_fields=["kind", "center", "params", "label"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class World:
    kind: jnp.ndarray    # (O,) int32 primitive type
    center: jnp.ndarray  # (O, 3) float32
    params: jnp.ndarray  # (O, 3) float32: sphere (r,-,-), cube half-extents,
                         #   plane unit normal, cylinder (r, h/2, -)
    label: jnp.ndarray   # (O,) int32 semantic label

    @property
    def num_objects(self) -> int:
        return self.kind.shape[0]


class WorldBuilder:
    """Host-side accumulation mirroring SimulationWorld::addObject."""

    def __init__(self):
        self._objs = []

    def add_sphere(self, center, radius, label=None):
        self._objs.append((SPHERE, center, (radius, 0, 0),
                           PRIMITIVE_LABELS[SPHERE] if label is None else label))
        return self

    def add_cube(self, center, size, label=None):
        half = tuple(s / 2 for s in size)
        self._objs.append((CUBE, center, half,
                           PRIMITIVE_LABELS[CUBE] if label is None else label))
        return self

    def add_plane(self, point, normal, label=None):
        n = np.asarray(normal, np.float64)
        n = n / np.linalg.norm(n)
        self._objs.append((PLANE, point, tuple(n),
                           PRIMITIVE_LABELS[PLANE] if label is None else label))
        return self

    def add_cylinder(self, center, radius, height, label=None):
        self._objs.append((CYLINDER, center, (radius, height / 2, 0),
                           PRIMITIVE_LABELS[CYLINDER] if label is None else label))
        return self

    def build(self) -> World:
        kinds = jnp.array([o[0] for o in self._objs], dtype=jnp.int32)
        centers = jnp.array([o[1] for o in self._objs], dtype=jnp.float32)
        params = jnp.array([o[2] for o in self._objs], dtype=jnp.float32)
        labels = jnp.array([o[3] for o in self._objs], dtype=jnp.int32)
        return World(kind=kinds, center=centers, params=params, label=labels)


def default_eval_world() -> World:
    """The reference eval scene: sphere + walls + cube + ground
    (semantic_simulation_eval.cpp:16-34)."""
    b = WorldBuilder()
    b.add_sphere((0.0, 0.0, 2.0), 2.0)
    b.add_plane((-4.0, 0.0, 2.0), (1.0, 0.0, 0.0))
    b.add_plane((4.0, 0.0, 2.0), (-1.0, 0.0, 0.0))
    b.add_plane((0.0, -4.0, 2.0), (0.0, 1.0, 0.0))
    b.add_plane((0.0, 4.0, 2.0), (0.0, -1.0, 0.0))
    b.add_cube((-2.0, -2.0, 1.0), (1.0, 1.0, 2.0))
    b.add_plane((0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
    return b.build()


def object_sdf(world: World, points: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) points -> (..., O) per-object signed distances."""
    p = points[..., None, :] - world.center          # (..., O, 3)
    r = world.params[..., 0]

    sphere = jnp.linalg.norm(p, axis=-1) - r

    q = jnp.abs(p) - world.params                    # cube half-extents
    cube = (jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
            + jnp.minimum(jnp.max(q, axis=-1), 0.0))

    plane = jnp.sum(p * world.params, axis=-1)       # params = unit normal

    rho = jnp.linalg.norm(p[..., :2], axis=-1)
    d2 = jnp.stack([rho - r, jnp.abs(p[..., 2]) - world.params[..., 1]], axis=-1)
    cyl = (jnp.linalg.norm(jnp.maximum(d2, 0.0), axis=-1)
           + jnp.minimum(jnp.max(d2, axis=-1), 0.0))

    return jnp.select(
        [world.kind == SPHERE, world.kind == CUBE, world.kind == PLANE,
         world.kind == CYLINDER],
        [sphere, cube, plane, cyl], jnp.inf)


def world_sdf(world: World, points: jnp.ndarray):
    """(..., 3) -> (sdf (...,), label (...,)) — min over objects + its label
    (generateSemanticSdfFromWorld nearest-object rule, :68-91)."""
    d = object_sdf(world, points)
    amin = jnp.argmin(d, axis=-1)
    return jnp.take_along_axis(d, amin[..., None], axis=-1)[..., 0], \
        world.label[amin]


def generate_semantic_sdf(world: World, cfg: FusionConfig,
                          lower: Tuple[float, float, float],
                          upper: Tuple[float, float, float],
                          gt_weight: float = 1.0) -> VoxelGrid:
    """Fill a VoxelGrid with ground-truth distance + labels over an AABB.

    Equivalent of generateSemanticSdfFromWorld (:35-97): every voxel in bounds
    gets the exact world SDF (clamped to the truncation band by the storage
    contract) and the nearest object's label at effective probability 1
    (:99-109 sets prior log-odds to 0 for the GT label)."""
    g = cfg.grid
    vps = g.voxels_per_side
    lo_blk = np.floor(np.asarray(lower) / g.block_size).astype(np.int32)
    hi_blk = np.floor(np.asarray(upper) / g.block_size).astype(np.int32)
    bx, by, bz = (np.arange(lo_blk[d], hi_blk[d] + 1) for d in range(3))
    coords = np.stack(np.meshgrid(bx, by, bz, indexing="ij"), axis=-1).reshape(-1, 3)
    if len(coords) > g.block_capacity:
        raise ValueError(f"world AABB needs {len(coords)} blocks > capacity "
                         f"{g.block_capacity}")
    grid = gblocks.create(cfg)
    grid = gblocks.allocate_blocks(grid, jnp.asarray(coords, dtype=jnp.int32),
                                   jnp.ones(len(coords), dtype=bool), g)
    slots = np.asarray(gblocks.lookup_slots(
        grid, jnp.asarray(coords, dtype=jnp.int32), g))

    # Local voxel-center offsets within a block.
    ii = np.arange(vps)
    local = np.stack(np.meshgrid(ii, ii, ii, indexing="ij"), axis=-1).reshape(-1, 3)

    @jax.jit
    def fill(grid, coords_dev, slots_dev):
        centers = ((coords_dev[:, None, :] * vps + jnp.asarray(local)[None, :, :])
                   .astype(jnp.float32) + 0.5) * g.voxel_size
        sdf, label = world_sdf(world, centers)          # (Nb, V3)
        trunc = cfg.tsdf.truncation_distance
        wsum = grid.wsum.at[slots_dev].set(gt_weight)
        wsdf = grid.wsdf.at[slots_dev].set(
            jnp.clip(sdf, -trunc, trunc) * gt_weight)
        # GT label at p=1: one strong delta observation. sem_delta layout is
        # (L, B+1, V3) — scatter per-label planes.
        onehot = jax.nn.one_hot(label, g.num_labels, dtype=jnp.float32,
                                axis=0)                     # (L, Nb, V3)
        sem_delta = grid.sem_delta.at[:, slots_dev].set(onehot * 100.0)
        sem_count = grid.sem_count.at[slots_dev].set(1.0)
        updated = grid.updated.at[slots_dev].set(True)
        return dataclasses.replace(grid, wsum=wsum, wsdf=wsdf,
                                   sem_delta=sem_delta, sem_count=sem_count,
                                   updated=updated)

    return fill(grid, jnp.asarray(coords, dtype=jnp.int32), jnp.asarray(slots))
