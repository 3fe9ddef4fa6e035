"""TSDF scan-to-map alignment tests (ops/icp.py — enable_icp parity)."""

import numpy as np
import jax.numpy as jnp

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, TsdfConfig)
from kimera_semantics_tpu.core import transforms
from kimera_semantics_tpu.core.camera import PinholeIntrinsics, backproject
from kimera_semantics_tpu.ops import icp as icp_ops
from kimera_semantics_tpu.sim import render as sim_render
from kimera_semantics_tpu.sim import world as sim_world


def cfg_():
    return FusionConfig(
        grid=GridConfig(voxel_size=0.1, voxels_per_side=8, block_capacity=2048),
        tsdf=TsdfConfig(truncation_distance=0.3),
        pipeline=PipelineConfig(max_rays=64, dedup_table_size=1 << 10),
    )


def test_sample_tsdf_matches_analytic():
    cfg = cfg_()
    w = sim_world.WorldBuilder().add_sphere((0, 0, 0), 1.0).build()
    grid = sim_world.generate_semantic_sdf(w, cfg, (-1.6,) * 3, (1.6,) * 3)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1.2, 1.2, (256, 3)).astype(np.float32)
    d, wt = icp_ops.sample_tsdf(grid, cfg, jnp.asarray(pts))
    true = np.linalg.norm(pts, axis=1) - 1.0
    m = (np.asarray(wt) > 0) & (np.abs(true) < 0.25)  # inside trunc band
    assert m.sum() > 30
    np.testing.assert_allclose(np.asarray(d)[m], true[m], atol=0.03)


def test_alignment_recovers_perturbation():
    cfg = cfg_()
    world = sim_world.default_eval_world()
    grid = sim_world.generate_semantic_sdf(world, cfg, (-4.2, -4.2, -0.4),
                                           (4.2, 4.2, 3.8))
    intr = PinholeIntrinsics(fx=50, fy=50, cx=31.5, cy=23.5, width=64,
                             height=48)
    T_true = sim_render.orbit_pose(0.7)
    depth, _ = sim_render.render_depth_labels(world, T_true, intr)
    pts_C, valid = backproject(depth, intr)

    # Perturb the pose by a few cm / ~2 degrees.
    dq = jnp.array([0.0, 0.017, 0.0, 1.0])
    T_pert = transforms.compose(
        T_true, transforms.from_quat_trans(dq, jnp.array([0.04, -0.03, 0.02])))
    pre = float(jnp.linalg.norm(T_pert[:3, 3] - T_true[:3, 3]))

    # rms at the perturbed pose (iters=1 reports the entry residual).
    _, rms_init, _ = icp_ops.align_to_map(grid, cfg, pts_C, valid, T_pert,
                                          iters=1)
    T_ref, rms, _ = icp_ops.align_to_map(grid, cfg, pts_C, valid, T_pert,
                                         iters=10)
    post = float(jnp.linalg.norm(T_ref[:3, 3] - T_true[:3, 3]))
    rot_err = float(jnp.linalg.norm(
        np.asarray(T_ref[:3, :3] @ T_true[:3, :3].T) - np.eye(3)))
    # The optimized quantity is the scan-to-map TSDF residual; pose itself is
    # only partially observable from one limited-FOV view (coupled rot/trans
    # null directions), so assert strong residual reduction + no pose harm.
    assert float(rms) < 0.5 * float(rms_init), (float(rms_init), float(rms))
    assert post < pre * 1.2, (pre, post)
    assert rot_err < 0.08


def test_large_perturbation_converges():
    """Convergence radius: ~8 cm / ~6 degree initial error still shrinks the
    residual and does not worsen the pose (VERDICT r1 item 9)."""
    cfg = cfg_()
    world = sim_world.default_eval_world()
    grid = sim_world.generate_semantic_sdf(world, cfg, (-4.2, -4.2, -0.4),
                                           (4.2, 4.2, 3.8))
    intr = PinholeIntrinsics(fx=50, fy=50, cx=31.5, cy=23.5, width=64,
                             height=48)
    T_true = sim_render.orbit_pose(0.3)
    depth, _ = sim_render.render_depth_labels(world, T_true, intr)
    pts_C, valid = backproject(depth, intr)
    dq = jnp.array([0.03, -0.03, 0.021, 1.0])
    T_pert = transforms.compose(
        T_true, transforms.from_quat_trans(dq, jnp.array([0.08, 0.064, -0.048])))
    pre = float(jnp.linalg.norm(T_pert[:3, 3] - T_true[:3, 3]))
    _, rms_init, _ = icp_ops.align_to_map(grid, cfg, pts_C, valid, T_pert,
                                          iters=1)
    T_ref, rms, ratio = icp_ops.align_to_map(grid, cfg, pts_C, valid, T_pert,
                                             iters=25)
    post = float(jnp.linalg.norm(T_ref[:3, 3] - T_true[:3, 3]))
    assert float(ratio) > 0.2
    # The solver drives the scan-to-map residual to the interpolation floor
    # even from this far out (>10x reduction); pose error itself has genuine
    # single-view null directions (rms ~4e-4 at 7 cm offset), so only bound
    # its growth.
    assert float(rms) < 0.1 * float(rms_init), (float(rms_init), float(rms))
    assert post < pre + 2 * cfg.grid.voxel_size * 0.2, (pre, post)


def test_refine_roll_pitch_false_keeps_gravity():
    """With refine_roll_pitch=False the world-frame roll/pitch of the result
    equals the input's exactly (twist is constrained to yaw+translation)."""
    cfg = cfg_()
    world = sim_world.default_eval_world()
    grid = sim_world.generate_semantic_sdf(world, cfg, (-4.2, -4.2, -0.4),
                                           (4.2, 4.2, 3.8))
    intr = PinholeIntrinsics(fx=50, fy=50, cx=31.5, cy=23.5, width=64,
                             height=48)
    T_true = sim_render.orbit_pose(1.1)
    depth, _ = sim_render.render_depth_labels(world, T_true, intr)
    pts_C, valid = backproject(depth, intr)
    dq = jnp.array([0.0, 0.0, 0.02, 1.0])
    T_pert = transforms.compose(
        T_true, transforms.from_quat_trans(dq, jnp.array([0.03, -0.02, 0.01])))
    T_ref, _, _ = icp_ops.align_to_map(grid, cfg, pts_C, valid, T_pert,
                                       iters=8, refine_roll_pitch=False)
    # Left-applied yaw-only twists preserve the world z-row of R^T — i.e. the
    # direction of gravity expressed in the sensor frame up to yaw.
    gz_in = np.asarray(T_pert[:3, :3])[2, :]   # world-z expressed via rows
    gz_out = np.asarray(T_ref[:3, :3])[2, :]
    # Rotation about world z leaves the z-component of each column, so
    # compare third ROW of R (world-z in body coords) norms and z-z entry.
    np.testing.assert_allclose(gz_out[2], gz_in[2], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(gz_out), 1.0, atol=1e-5)
    # And the refinement still moved translation (it did something).
    assert float(jnp.linalg.norm(T_ref[:3, 3] - T_pert[:3, 3])) > 1e-4


def test_min_match_ratio_rejects_degenerate():
    """Points that miss the observed map entirely (no overlap) must leave the
    pose untouched when min_match_ratio is set."""
    cfg = cfg_()
    world = sim_world.default_eval_world()
    grid = sim_world.generate_semantic_sdf(world, cfg, (-4.2, -4.2, -0.4),
                                           (4.2, 4.2, 3.8))
    rng = np.random.RandomState(1)
    # A cloud far outside the mapped AABB.
    pts_C = jnp.asarray(rng.uniform(40.0, 50.0, (512, 3)).astype(np.float32))
    valid = jnp.ones(512, dtype=bool)
    T0 = jnp.eye(4, dtype=jnp.float32)
    T_ref, _, ratio = icp_ops.align_to_map(grid, cfg, pts_C, valid, T0,
                                           iters=6, min_match_ratio=0.1)
    assert float(ratio) < 0.1
    np.testing.assert_allclose(np.asarray(T_ref), np.eye(4), atol=1e-7)
