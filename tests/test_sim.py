"""Simulation world tests: SDF math, GT grid generation, rendering."""

import numpy as np
import jax.numpy as jnp

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics, backproject
from kimera_semantics_tpu.core import transforms
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.sim import render as sim_render
from kimera_semantics_tpu.sim import world as sim_world


def small_cfg():
    return FusionConfig(
        grid=GridConfig(voxel_size=0.25, voxels_per_side=8, block_capacity=512),
        tsdf=TsdfConfig(truncation_distance=0.5),
        pipeline=PipelineConfig(max_rays=64, dedup_table_size=1 << 10),
    )


class TestSdf:
    def test_primitive_sdfs(self):
        w = (sim_world.WorldBuilder()
             .add_sphere((0, 0, 0), 1.0)
             .add_cube((5, 0, 0), (2.0, 2.0, 2.0))
             .add_plane((0, 0, -3.0), (0, 0, 1))
             .add_cylinder((0, 5, 0), 1.0, 4.0)
             .build())
        pts = jnp.array([[2.0, 0.0, 0.0],   # 1 from sphere
                         [5.0, 0.0, 0.0],   # -1 inside cube
                         [0.0, 0.0, -2.0],  # 1 above plane
                         [2.0, 5.0, 0.0]])  # 1 from cylinder wall
        d = np.asarray(sim_world.object_sdf(w, pts))
        np.testing.assert_allclose(d[0, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(d[1, 1], -1.0, atol=1e-5)
        np.testing.assert_allclose(d[2, 2], 1.0, atol=1e-5)
        np.testing.assert_allclose(d[3, 3], 1.0, atol=1e-5)

    def test_nearest_object_labels(self):
        # Reference primitive->label map (semantic_simulation_world.cpp:5-33).
        w = (sim_world.WorldBuilder()
             .add_sphere((0, 0, 0), 1.0)
             .add_cube((10, 0, 0), (2.0, 2.0, 2.0)).build())
        sdf, lab = sim_world.world_sdf(w, jnp.array([[0.5, 0, 0], [9.5, 0, 0]]))
        assert list(np.asarray(lab)) == [1, 2]

    def test_gt_grid_matches_analytic(self):
        cfg = small_cfg()
        w = sim_world.WorldBuilder().add_sphere((0, 0, 0), 1.0).build()
        grid = sim_world.generate_semantic_sdf(w, cfg, (-2,) * 3, (2,) * 3)
        dist = np.asarray(blocks.tsdf_distance(grid, cfg.tsdf.truncation_distance))
        labels = np.asarray(blocks.mle_labels(grid))
        # Probe a known voxel: center nearest to (1.5, 0, 0) -> sdf ~ 0.5 (clamped 0.5).
        v = blocks.point_to_voxel(jnp.array([1.375, 0.125, 0.125]),
                                  1 / cfg.grid.voxel_size)
        blk, lin = blocks.voxel_to_block_local(v, cfg.grid.voxels_per_side)
        slot = int(blocks.lookup_slots(grid, blk[None], cfg.grid)[0])
        got = dist[slot, int(lin)]
        expect = np.linalg.norm([1.375, 0.125, 0.125]) - 1.0
        np.testing.assert_allclose(got, np.clip(expect, -0.5, 0.5), atol=1e-5)
        assert labels[slot, int(lin)] == 1


class TestRender:
    def test_depth_consistency_with_sdf(self):
        # Render, backproject, and verify reprojected points lie on surfaces.
        intr = PinholeIntrinsics(fx=80, fy=80, cx=39.5, cy=29.5, width=80,
                                 height=60)
        w = sim_world.default_eval_world()
        T = sim_render.orbit_pose(0.3)
        depth, labels = sim_render.render_depth_labels(w, T, intr)
        d = np.asarray(depth)
        assert (d > 0).mean() > 0.9
        pts_C, valid = backproject(depth, intr)
        pts_G = transforms.apply(T, pts_C)
        sdf, lab_at = sim_world.world_sdf(w, pts_G)
        sdf = np.asarray(sdf)[np.asarray(valid)]
        assert np.abs(sdf).max() < 2e-2
        # Rendered label equals nearest-object label at the hit point.
        lab_img = np.asarray(labels).reshape(-1)[np.asarray(valid)]
        lab_pt = np.asarray(lab_at)[np.asarray(valid)]
        assert (lab_img == lab_pt).mean() > 0.99

    def test_orbit_pose_looks_at_target(self):
        T = np.asarray(sim_render.orbit_pose(1.0, radius=3.0, height=2.0,
                                             target=(0, 0, 1)))
        eye = T[:3, 3]
        fwd = T[:3, 2]
        to_target = np.array([0, 0, 1.0]) - eye
        to_target /= np.linalg.norm(to_target)
        assert np.dot(fwd, to_target) > 0.999
