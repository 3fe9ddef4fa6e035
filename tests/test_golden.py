"""Golden-fixture end-to-end regression suite (VERDICT r1 item 3, r2 item 1).

Mirrors the reference's dataset-regression practice
(kimera_semantics_ros/scripts/kimera_semantics_eval.bash:36-77): a COMMITTED
12-frame bag (tests/fixtures/golden_scene.bag, built by
scripts/make_golden_fixture.py — byte-pinned input, exercising the ROS1 bag
reader in the loop) is integrated end to end by all three integrators; mesh
error, label accuracy, TSDF RMSE, accumulated weight mass, block counts, and
batch-ESDF statistics are pinned against frozen expectations. Any silent
accuracy regression from a performance change trips these bounds.

TWO gated configurations (VERDICT r2 item 1 — the benched operating point
must carry its own regression gate):
  "default": carve_mode="decimated" — the package default path.
  "benched": carve_mode="projective" + io-tiled storage blocks
             (GridConfig.io_voxels_per_side) — the configuration every
             headline bench number runs (bench.py BENCH_CARVE_MODE /
             BENCH_VPS=32 analogue at golden-scene scale).

Ray budgets are sized to the band-keep density so the scene integrates with
ZERO dropped rays (grid.dropped_rays == 0) and zero state overflow — the
pins certify complete, untruncated integration.

Pinned values derived on CPU (jit, float32) at the configs below; tolerances
absorb summation-order jitter across backends, not semantic drift.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.rosbag import RosbagDataset
from kimera_semantics_tpu.ops import esdf as esdf_ops
from kimera_semantics_tpu.ops import mesh as mesh_ops
from kimera_semantics_tpu.sim import eval as sim_eval
from kimera_semantics_tpu.sim import world as sim_world

BAG = "tests/fixtures/golden_scene.bag"

# max_rays=12288 covers the worst per-frame octave band keep of the golden
# scene (~8.8k; was 8192 with 604 keeps silently truncated until round 2
# started counting them — ADVICE r2 high finding).
CFG = FusionConfig(
    grid=GridConfig(voxel_size=0.1, voxels_per_side=8, block_capacity=1024),
    tsdf=TsdfConfig(truncation_distance=0.2, max_ray_length_m=5.0),
    semantic=SemanticConfig(semantic_measurement_probability=0.8),
    pipeline=PipelineConfig(max_rays=12288, dedup_table_size=1 << 16,
                            segment_budget=1 << 17, carve_budget=16384,
                            carve_steps=24, block_budget=512))

# The benched operating point's code path at golden-scene scale: projective
# free-space carve for the ray methods + io-regrouped storage tiles
# (bench.py: BENCH_CARVE_MODE=projective default, BENCH_VPS=32 on 16^3
# storage -> here io 16 on 8^3 storage).
CFG_BENCHED = dataclasses.replace(
    CFG,
    grid=dataclasses.replace(CFG.grid, io_voxels_per_side=16),
    tsdf=dataclasses.replace(CFG.tsdf, carve_mode="projective"))

# The recommended production mode for the ray methods (PARITY.md
# "Beyond-reference options"): near-surface semantic gate ON. Pinned so the
# recommended setting can't regress silently either (VERDICT r2 item 9).
CFG_GATED = dataclasses.replace(
    CFG_BENCHED,
    semantic=dataclasses.replace(CFG_BENCHED.semantic,
                                 update_near_surface_only=True))

CFGS = {"default": CFG, "benched": CFG_BENCHED, "gated": CFG_GATED}

# (cfg, method) -> (blocks, wsum_total, rmse_tsdf, label_acc, mesh_mean,
#                   mesh_p95)
GOLDEN = {
    ("default", "fast"):       (428, 314815.0, 0.0250, 0.487, 0.0100, 0.0287),
    ("default", "merged"):     (420, 972410.0, 0.0252, 0.492, 0.0081, 0.0246),
    ("default", "projective"): (412, 25651.0, 0.0303, 0.472, 0.0053, 0.0132),
    ("benched", "fast"):       (412, 192993.0, 0.0234, 0.527, 0.0120, 0.0500),
    ("benched", "merged"):     (412, 850589.0, 0.0235, 0.521, 0.0101, 0.0455),
    ("benched", "projective"): (412, 25651.0, 0.0303, 0.472, 0.0053, 0.0132),
    # gated rows evaluate band-restricted (surface_band=truncation): the
    # near-surface gate lifts ray-method label accuracy 0.53 -> 0.85 (fast)
    # and 0.52 -> 0.82 (merged) on the golden scene.
    ("gated", "fast"):         (412, 192993.0, 0.0428, 0.849, 0.0120,
                                0.0500),
    ("gated", "merged"):       (412, 850589.0, 0.0435, 0.818, 0.0101,
                                0.0455),
}
# Relative tolerances per column (mass/accuracy drift allowances).
TOL = dict(blocks=0, wsum=0.05, rmse=0.10, lacc=0.03, mesh=0.15)


@pytest.fixture(scope="module")
def fixture():
    lm = LabelColorMap.random(21, seed=0)
    ds = RosbagDataset(BAG, label_map=lm,
                       depth_topic="/depth/image_raw",
                       semantic_topic="/semantic/image_raw",
                       cam_info_topic="/depth/camera_info")
    frames = [ds.frame(i) for i in range(len(ds))]
    return ds, frames, lm, sim_world.default_eval_world()


def integrate(cfg, method, frames, intr):
    if method == "fast":
        from kimera_semantics_tpu.models import fast as mod
    elif method == "merged":
        from kimera_semantics_tpu.models import merged as mod
    else:
        from kimera_semantics_tpu.models import projective as mod
    g = blocks.create(cfg)
    for f in frames:
        g = mod.integrate_frame(g, f, cfg, intr)
    return g


_GRIDS = {}


def grid_for(cfgname, method, fixture):
    ds, frames, lm, world = fixture
    key = (cfgname, method)
    if key not in _GRIDS:
        _GRIDS[key] = integrate(CFGS[cfgname], method, frames, ds.intr)
    return _GRIDS[key]


@pytest.mark.parametrize("cfgname,method", sorted(GOLDEN))
def test_end_to_end_metrics(cfgname, method, fixture):
    ds, frames, lm, world = fixture
    cfg = CFGS[cfgname]
    g = grid_for(cfgname, method, fixture)
    exp_blocks, exp_wsum, exp_rmse, exp_lacc, exp_mmean, exp_mp95 = (
        GOLDEN[(cfgname, method)])
    assert int(g.overflow) == 0, "state overflow on the golden scene"
    assert int(g.dropped_rays) == 0, "ray-budget truncation on the golden scene"
    assert int(g.n_blocks) == exp_blocks
    wsum_total = float(jnp.sum(g.wsum[:int(g.n_blocks)]))
    assert wsum_total == pytest.approx(exp_wsum, rel=TOL["wsum"])
    # The gated config restricts semantic votes to the truncation band, so
    # its accuracy is meaningful only band-restricted (free-space voxels are
    # correctly unlabeled; the GT query labels them with the nearest object,
    # which would penalize exactly the intended behavior). Matches the
    # sim-eval CLI's surface_band handling.
    band = (cfg.tsdf.truncation_distance
            if cfg.semantic.update_near_surface_only else None)
    errs = sim_eval.compare_to_world(g, cfg, world, surface_band=band)
    assert float(errs.rmse_tsdf) == pytest.approx(exp_rmse, rel=TOL["rmse"])
    assert float(errs.label_accuracy) == pytest.approx(exp_lacc,
                                                       abs=TOL["lacc"])
    m = mesh_ops.extract_mesh(g, cfg, label_map=lm)
    me = sim_eval.mesh_surface_error(m.vertices, world)
    assert me["mean"] == pytest.approx(exp_mmean, rel=TOL["mesh"])
    assert me["p95"] == pytest.approx(exp_mp95, rel=TOL["mesh"])


def test_esdf_statistics(fixture):
    """Batch-ESDF tail of the offline pipeline (kimera_semantics_rosbag.cpp:
    153-167): pinned distance-field statistics on the fast grid."""
    g = grid_for("default", "fast", fixture)
    res = esdf_ops.compute_esdf(g, CFG, max_dist=2.0)
    vals = np.asarray(res.distance)[np.asarray(res.observed)]
    assert vals.size > 10000
    # Near-surface agreement: ESDF at observed band voxels tracks the TSDF.
    stats = (float(vals.mean()), float(np.abs(vals).mean()),
             float((vals < 0).mean()))
    exp = (0.5808, 0.6058, 0.1137)
    assert stats[0] == pytest.approx(exp[0], abs=0.05)
    assert stats[1] == pytest.approx(exp[1], rel=0.15)
    assert stats[2] == pytest.approx(exp[2], abs=0.05)
