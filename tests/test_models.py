"""End-to-end integrator tests: full frames through fast/merged models, and
reconstruction accuracy against the simulation world GT (the CS3 eval loop)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         IntegratorType, PipelineConfig,
                                         SemanticConfig, TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import factory
from kimera_semantics_tpu.sim import world as sim_world


def small_cfg(**kw):
    return FusionConfig(
        grid=GridConfig(voxel_size=0.25, voxels_per_side=8, block_capacity=768),
        tsdf=TsdfConfig(truncation_distance=0.5, max_ray_length_m=8.0),
        semantic=SemanticConfig(),
        pipeline=PipelineConfig(max_rays=4096, dedup_table_size=1 << 14),
        **kw,
    )


INTR = PinholeIntrinsics(fx=60.0, fy=60.0, cx=39.5, cy=29.5, width=80, height=60)


def reconstruct(kind, num_frames=6):
    cfg = small_cfg(integrator=IntegratorType(kind))
    ds = SyntheticDataset(num_frames=num_frames, intr=INTR,
                          label_map=LabelColorMap.random())
    integ = factory.create(kind, cfg, INTR)
    grid = blocks.create(cfg)
    for frame in ds:
        grid = integ.integrate(grid, frame)
    return cfg, ds, grid


def surface_error(cfg, grid, world):
    """Mean |analytic sdf| at reconstructed zero-crossing voxel centers."""
    dist = np.asarray(blocks.tsdf_distance(grid, cfg.tsdf.truncation_distance))
    wsum = np.asarray(grid.wsum)
    nb = int(grid.n_blocks)
    near = (np.abs(dist[:nb]) < cfg.grid.voxel_size * 0.5) & (wsum[:nb] > 1e-3)
    slots, lins = np.where(near)
    assert len(slots) > 50, "no surface voxels reconstructed"
    coords = np.asarray(grid.block_coords)[slots]
    vps = cfg.grid.voxels_per_side
    local = np.stack([lins // (vps * vps), (lins // vps) % vps, lins % vps], -1)
    centers = ((coords * vps + local) + 0.5) * cfg.grid.voxel_size
    sdf, lab = sim_world.world_sdf(world, jnp.asarray(centers, dtype=jnp.float32))
    # Reconstructed voxel says distance d; true sdf should be within a voxel.
    resid = np.abs(np.asarray(sdf) - dist[slots, lins])
    labels = np.asarray(blocks.mle_labels(grid))[slots, lins]
    label_acc = (labels == np.asarray(lab)).mean()
    return resid.mean(), label_acc


@pytest.mark.parametrize("kind", ["fast", "merged", "simple", "projective"])
class TestEndToEnd:
    def test_reconstruction_accuracy(self, kind):
        cfg, ds, grid = reconstruct(kind)
        assert int(grid.overflow) == 0, "block capacity overflow"
        err, label_acc = surface_error(cfg, grid, ds.world)
        assert err < cfg.grid.voxel_size, f"surface residual {err}"
        assert label_acc > 0.9, f"label accuracy {label_acc}"

    def test_carving_clears_free_space(self, kind):
        cfg, ds, grid = reconstruct(kind)
        # A point 0.5 m in front of frame-0's camera must be carved free.
        T = np.asarray(ds.pose(0))
        probe = T[:3, 3] + 0.5 * T[:3, 2]
        v = blocks.point_to_voxel(jnp.asarray(probe, dtype=jnp.float32),
                                  1 / cfg.grid.voxel_size)
        blk, lin = blocks.voxel_to_block_local(v, cfg.grid.voxels_per_side)
        slot = int(blocks.lookup_slots(grid, blk[None], cfg.grid)[0])
        assert slot < cfg.grid.block_capacity
        d = float(blocks.tsdf_distance(grid, cfg.tsdf.truncation_distance)
                  [slot, int(lin)])
        w = float(grid.wsum[slot, int(lin)])
        assert w > 0 and d > 0.2


class TestFactory:
    def test_kinds(self):
        cfg = small_cfg()
        from kimera_semantics_tpu.models.fast import FastSemanticTsdfIntegrator
        from kimera_semantics_tpu.models.merged import MergedSemanticTsdfIntegrator
        assert isinstance(factory.create("fast", cfg, INTR),
                          FastSemanticTsdfIntegrator)
        assert isinstance(factory.create("merged", cfg, INTR),
                          MergedSemanticTsdfIntegrator)
        from kimera_semantics_tpu.models.projective import (
            ProjectiveSemanticTsdfIntegrator)
        assert isinstance(factory.create("projective", cfg, INTR),
                          ProjectiveSemanticTsdfIntegrator)
        with pytest.raises(ValueError):
            factory.create("bogus", cfg, INTR)


class TestDedupBehavior:
    def test_start_voxel_subsampling_reduces_rays(self):
        # With a large subsampling factor, nearby rays collapse (the reference's
        # ray-rate limiter, _fast.cpp:87-91).
        from kimera_semantics_tpu.ops import dedup as dedup_ops
        pts = jnp.array(np.random.RandomState(0).uniform(0, 0.2, (512, 3)),
                        dtype=jnp.float32)
        keep, _ = dedup_ops.start_voxel_dedup(
            jnp.full((1 << 10,), -1, jnp.int32), pts,
            jnp.ones(512, dtype=bool), voxel_size_inv=1 / 0.25,
            subsampling_factor=2.0)
        kept = int(keep.sum())
        assert 1 <= kept <= 8  # 0.2m cloud, 0.125m dedup cells

    def test_set_persistence_across_frames(self):
        from kimera_semantics_tpu.ops import dedup as dedup_ops
        pts = jnp.array([[1.0, 1.0, 1.0]], dtype=jnp.float32)
        ones = jnp.ones(1, dtype=bool)
        st = jnp.full((1 << 10,), -1, jnp.int32)
        keep1, st = dedup_ops.start_voxel_dedup(
            st, pts, ones, voxel_size_inv=4.0, subsampling_factor=2.0)
        keep2, st = dedup_ops.start_voxel_dedup(
            st, pts, ones, voxel_size_inv=4.0, subsampling_factor=2.0)
        assert bool(keep1[0]) and not bool(keep2[0])


class TestBatchedFrames:
    def test_matches_sequential(self):
        from kimera_semantics_tpu.models import fast
        from kimera_semantics_tpu.models.common import Frame
        cfg = small_cfg()
        B = 3
        ds = SyntheticDataset(num_frames=B, intr=INTR,
                              label_map=LabelColorMap.random())
        frames = [ds.frame(i) for i in range(B)]

        g_seq = blocks.create(cfg)
        for f in frames:
            g_seq = fast.integrate_frame(g_seq, f, cfg, INTR)

        stacked = Frame(
            depth=jnp.stack([f.depth for f in frames]),
            labels=jnp.stack([f.labels for f in frames]),
            colors=jnp.stack([f.colors for f in frames]),
            T_G_C=jnp.stack([f.T_G_C for f in frames]))
        g_bat = fast.integrate_frames(blocks.create(cfg), stacked, cfg, INTR)

        assert int(g_bat.n_blocks) == int(g_seq.n_blocks)
        # Same voxel state (summation order differs -> tolerance compare).
        coords = np.asarray(g_seq.block_coords)[:int(g_seq.n_blocks)]
        s_seq = blocks.lookup_slots(g_seq, jnp.asarray(coords), cfg.grid)
        s_bat = blocks.lookup_slots(g_bat, jnp.asarray(coords), cfg.grid)
        for ch in ("wsum", "wsdf", "sem_count"):
            a = np.asarray(getattr(g_seq, ch))[np.asarray(s_seq)]
            b = np.asarray(getattr(g_bat, ch))[np.asarray(s_bat)]
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=ch)
        a = np.asarray(g_seq.sem_delta)[:, np.asarray(s_seq)]
        b = np.asarray(g_bat.sem_delta)[:, np.asarray(s_bat)]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


    def test_merged_matches_sequential(self):
        from kimera_semantics_tpu.models import merged
        from kimera_semantics_tpu.models.common import Frame
        cfg = small_cfg()
        B = 3
        ds = SyntheticDataset(num_frames=B, intr=INTR,
                              label_map=LabelColorMap.random())
        frames = [ds.frame(i) for i in range(B)]

        g_seq = blocks.create(cfg)
        for f in frames:
            g_seq = merged.integrate_frame(g_seq, f, cfg, INTR)

        stacked = Frame(
            depth=jnp.stack([f.depth for f in frames]),
            labels=jnp.stack([f.labels for f in frames]),
            colors=jnp.stack([f.colors for f in frames]),
            T_G_C=jnp.stack([f.T_G_C for f in frames]))
        g_bat = merged.integrate_frames(blocks.create(cfg), stacked, cfg,
                                        INTR)

        assert int(g_bat.n_blocks) == int(g_seq.n_blocks)
        coords = np.asarray(g_seq.block_coords)[:int(g_seq.n_blocks)]
        s_seq = blocks.lookup_slots(g_seq, jnp.asarray(coords), cfg.grid)
        s_bat = blocks.lookup_slots(g_bat, jnp.asarray(coords), cfg.grid)
        for ch in ("wsum", "wsdf", "sem_count"):
            a = np.asarray(getattr(g_seq, ch))[np.asarray(s_seq)]
            b = np.asarray(getattr(g_bat, ch))[np.asarray(s_bat)]
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=ch)
        a = np.asarray(g_seq.sem_delta)[:, np.asarray(s_seq)]
        b = np.asarray(g_bat.sem_delta)[:, np.asarray(s_bat)]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


class TestNearSurfaceSemanticGate:
    """SemanticConfig.update_near_surface_only (opt-in, beyond-reference):
    semantic votes restricted to the truncation band. TSDF/weights must be
    bit-identical to the parity default; ray-centric label accuracy improves
    (the reference votes along whole rays — label bleed,
    semantic_integrator_base.cpp:153-158)."""

    @pytest.mark.parametrize("kind", ["fast", "merged"])
    def test_tsdf_unchanged_accuracy_up(self, kind):
        lmap = LabelColorMap.random()
        ds = SyntheticDataset(num_frames=6, intr=INTR, label_map=lmap)

        def run(gate):
            cfg = small_cfg(integrator=IntegratorType(kind))
            cfg = dataclasses.replace(cfg, semantic=dataclasses.replace(
                cfg.semantic, update_near_surface_only=gate))
            integ = factory.create(kind, cfg, INTR)
            grid = blocks.create(cfg)
            for frame in ds:
                grid = integ.integrate(grid, frame)
            return cfg, grid

        cfg0, g0 = run(False)
        _, g1 = run(True)
        np.testing.assert_array_equal(np.asarray(g0.wsum), np.asarray(g1.wsum))
        np.testing.assert_array_equal(np.asarray(g0.wsdf), np.asarray(g1.wsdf))
        _, acc0 = surface_error(cfg0, g0, ds.world)
        _, acc1 = surface_error(cfg0, g1, ds.world)
        assert acc1 > acc0, (acc0, acc1)
        # gated: strictly fewer votes than whole-ray voting
        assert (np.asarray(g1.sem_count).sum()
                < np.asarray(g0.sem_count).sum())


class TestAntiGrazing:
    """TsdfConfig.enable_anti_grazing (_merged.cpp:306-313): traversed voxels
    that are destination voxels of OTHER bundles are skipped — strictly fewer
    updates, surface voxels (own destinations) still updated."""

    def test_fewer_updates_same_surface(self):
        lmap = LabelColorMap.random()
        ds = SyntheticDataset(num_frames=4, intr=INTR, label_map=lmap)

        def run(ag):
            cfg = small_cfg(integrator=IntegratorType("merged"))
            cfg = dataclasses.replace(cfg, tsdf=dataclasses.replace(
                cfg.tsdf, enable_anti_grazing=ag))
            integ = factory.create("merged", cfg, INTR)
            grid = blocks.create(cfg)
            for frame in ds:
                grid = integ.integrate(grid, frame)
            return cfg, grid

        cfg0, g0 = run(False)
        _, g1 = run(True)
        w0 = float(np.asarray(g0.wsum).sum())
        w1 = float(np.asarray(g1.wsum).sum())
        assert 0 < w1 < w0  # grazing updates removed
        # surface reconstruction must survive the pruning
        e0, _ = surface_error(cfg0, g0, ds.world)
        e1, _ = surface_error(cfg0, g1, ds.world)
        assert e1 < max(2.0 * e0, cfg0.grid.voxel_size)
