"""Octave-decimated carving (ops/carve.py) + cube-LUT slot kernel tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import fast, merged
from kimera_semantics_tpu.ops import carve, integrate as integ

INTR = PinholeIntrinsics(fx=40.0, fy=40.0, cx=39.5, cy=29.5, width=80,
                         height=60)


def make_cfg(**pipeline_kw):
    kw = dict(max_rays=2048, dedup_table_size=1 << 14,
              segment_budget=1 << 16, carve_budget=2048, carve_steps=16)
    kw.update(pipeline_kw)
    return FusionConfig(
        grid=GridConfig(voxel_size=0.2, voxels_per_side=8, block_capacity=512),
        tsdf=TsdfConfig(truncation_distance=0.4, max_ray_length_m=4.0),
        pipeline=PipelineConfig(**kw))


@pytest.fixture(scope="module")
def dataset():
    lm = LabelColorMap.random(21)
    ds = SyntheticDataset(num_frames=3, intr=INTR, label_map=lm)
    return ds, [ds.frame(i) for i in range(3)], lm


def run_frames(cfg, frames, model=fast):
    grid = blocks.create(cfg)
    for f in frames:
        grid = model.integrate_frame(grid, f, cfg, INTR)
    return grid


class TestPlan:
    def test_levels_cover_zero_to_max(self):
        cfg = make_cfg()
        plan = carve.plan_carve(cfg, INTR)
        los = [lo for _, lo, _ in plan.levels]
        his = [hi for _, _, hi in plan.levels]
        assert his[0] == cfg.tsdf.max_ray_length_m
        assert los[-1] == 0.0
        # Contiguous bands, coarser k with shrinking distance.
        for i in range(len(plan.levels) - 1):
            assert his[i + 1] == pytest.approx(los[i])
            assert plan.levels[i + 1][0] == 2 * plan.levels[i][0]

    def test_chunks_respect_step_budget(self):
        cfg = make_cfg()
        plan = carve.plan_carve(cfg, INTR)
        max_len = (cfg.pipeline.carve_steps - 3) * cfg.grid.voxel_size / 1.7321
        for chunks in plan.chunks:
            for t0, t1 in chunks:
                assert t1 - t0 <= max_len * 1.0001


class TestDecimatedAccuracy:
    def test_mesh_error_close_to_full(self, dataset):
        ds, frames, lm = dataset
        from kimera_semantics_tpu.ops import mesh as mesh_ops
        from kimera_semantics_tpu.sim import eval as sim_eval
        errs = {}
        for mode in ("full", "decimated"):
            cfg = dataclasses.replace(
                make_cfg(), tsdf=dataclasses.replace(make_cfg().tsdf,
                                                     carve_mode=mode))
            g = run_frames(cfg, frames)
            m = mesh_ops.extract_mesh(g, cfg, label_map=lm)
            errs[mode] = sim_eval.mesh_surface_error(m.vertices, ds.world)
        assert errs["decimated"]["mean"] <= errs["full"]["mean"] * 1.3 + 0.01

    def test_carve_overflow_counted(self, dataset):
        _, frames, _ = dataset
        cfg = make_cfg(carve_budget=64)  # deliberately starved
        g = run_frames(cfg, frames)
        # Budget truncation of carve jobs is input subsampling, not grid-state
        # incompleteness — counted in dropped_rays (grid/blocks.py contract).
        assert int(g.dropped_rays) > 0
        assert int(g.overflow) == 0

    def test_merged_decimated_runs(self, dataset):
        _, frames, _ = dataset
        cfg = make_cfg()
        g = run_frames(cfg, frames, model=merged)
        assert int(g.n_blocks) > 10


class TestBandOctave:
    def test_density_matches_levels(self):
        cfg = make_cfg()
        H, W = INTR.height, INTR.width
        # Constant-depth plane at 1 m: voxel footprint = v*f/d = 8 px ->
        # k = 8 with subsampling factor 2 -> T = 0.2*40/2 = 4, k(1m) = 4.
        pts_C = jnp.concatenate(
            [jnp.zeros((H * W, 2)), jnp.ones((H * W, 1))], axis=1)
        keep = carve.band_octave_keep(pts_C, jnp.ones((H * W,), bool), cfg,
                                      INTR)
        n = int(jnp.sum(keep))
        assert n == (W // 4) * (H // 4 + (1 if H % 4 else 0))

    def test_matched_density_thins_to_reference_rate(self):
        """band_density="matched" (TsdfConfig): exact-pow2 distances keep
        the octave selection verbatim; between octaves the candidate set is
        thinned to ~1/k_exact^2 density (the reference's dedup-cell rate,
        _fast.cpp:87-91)."""
        cfg = make_cfg()
        cfg = dataclasses.replace(
            cfg, tsdf=dataclasses.replace(cfg.tsdf, band_density="matched"))
        H, W = INTR.height, INTR.width
        ones = jnp.ones((H * W,), bool)

        def plane(d):
            return jnp.concatenate(
                [jnp.zeros((H * W, 2)), jnp.full((H * W, 1), d)], axis=1)

        # d=1: k_exact = T/d = 4 exactly -> r^2 = 1 -> identical to octave.
        base = carve.band_octave_keep(plane(1.0), ones, make_cfg(), INTR)
        matched = carve.band_octave_keep(plane(1.0), ones, cfg, INTR,
                                         salt=jnp.int32(123))
        assert bool(jnp.all(base == matched))

        # d=1.5: k_exact = 2.667 -> k = 2, r^2 = 1.78: candidates (1 per
        # 2x2 group) thinned to ~1/1.78. Statistical bound (hash-uniform).
        n_cand = int(jnp.sum(carve.band_octave_keep(
            plane(1.5), ones, make_cfg(), INTR)))
        n_kept = int(jnp.sum(carve.band_octave_keep(
            plane(1.5), ones, cfg, INTR, salt=jnp.int32(7))))
        expect = n_cand / (8.0 / 3.0 / 2.0) ** 2
        assert 0.7 * expect < n_kept < 1.3 * expect, (n_cand, n_kept, expect)

        # Different salts select different winners (temporal dithering).
        k2 = carve.band_octave_keep(plane(1.5), ones, cfg, INTR,
                                    salt=jnp.int32(8))
        k1 = carve.band_octave_keep(plane(1.5), ones, cfg, INTR,
                                    salt=jnp.int32(7))
        assert bool(jnp.any(k1 != k2))

    def test_matched_dither_moves_for_static_pose(self, dataset):
        """ADVICE r3 (medium): with an UNCHANGED camera pose the thinning
        salt must still vary frame to frame (grid.frame_counter is mixed
        in), or the same pixel groups would be dropped forever and the
        documented geometric coverage convergence would fail exactly for
        stationary cameras."""
        _, frames, _ = dataset
        cfg = make_cfg()
        cfg = dataclasses.replace(
            cfg, tsdf=dataclasses.replace(cfg.tsdf, band_density="matched"))
        f = frames[0]
        b0, _, _ = fast._band_prepare(f, cfg, INTR, frame_idx=jnp.int32(0))
        b1, _, _ = fast._band_prepare(f, cfg, INTR, frame_idx=jnp.int32(1))
        # Same frame, same pose — different frame index => different band
        # winners (compare the kept endpoint sets).
        e0 = np.sort(np.asarray(b0.end[b0.valid][:, 0]))
        e1 = np.sort(np.asarray(b1.end[b1.valid][:, 0]))
        assert e0.shape != e1.shape or not np.allclose(e0, e1)
        # And the integrator threads the counter: one frame advances it
        # (integrate_frame donates the grid — read the counter first).
        g = blocks.create(cfg)
        fc0 = int(g.frame_counter)
        g2 = fast.integrate_frame(g, f, cfg, INTR)
        assert int(g2.frame_counter) == fc0 + 1


class TestCubeLut:
    def test_cube_path_matches_hash_path(self, dataset):
        _, frames, _ = dataset
        cfg = make_cfg()
        g_x = run_frames(cfg, frames)           # XLA hash-lookup path
        integ.FORCE_PALLAS_INTERPRET = True     # pallas + cube LUT, interpreted
        try:
            fast.integrate_frame.clear_cache()
            g_p = run_frames(cfg, frames)
        finally:
            integ.FORCE_PALLAS_INTERPRET = False
            fast.integrate_frame.clear_cache()
        assert int(g_x.n_blocks) == int(g_p.n_blocks)
        coords = np.asarray(g_x.block_coords)[:int(g_x.n_blocks)]
        sx = blocks.lookup_slots(g_x, jnp.asarray(coords), cfg.grid)
        sp = blocks.lookup_slots(g_p, jnp.asarray(coords), cfg.grid)
        for f in ["wsum", "wsdf", "sem_count"]:
            np.testing.assert_allclose(
                np.asarray(getattr(g_x, f))[np.asarray(sx)],
                np.asarray(getattr(g_p, f))[np.asarray(sp)],
                rtol=1e-5, atol=1e-5, err_msg=f)
        np.testing.assert_allclose(
            np.asarray(g_x.sem_delta)[:, np.asarray(sx)],
            np.asarray(g_p.sem_delta)[:, np.asarray(sp)],
            rtol=1e-5, atol=1e-5)


class TestCubeLutBatched:
    """Batched streams resolve per-frame cubes (slot_resolve_stream's
    (B, pad) form — each frame's chunk of the concatenated ray axis against
    its own camera cube)."""

    def _stack(self, frames):
        from kimera_semantics_tpu.models.common import Frame
        return Frame(depth=jnp.stack([f.depth for f in frames]),
                     labels=jnp.stack([f.labels for f in frames]),
                     colors=jnp.stack([f.colors for f in frames]),
                     T_G_C=jnp.stack([f.T_G_C for f in frames]))

    @pytest.mark.parametrize("model", [fast, merged])
    @pytest.mark.parametrize("carve_mode", ["decimated", "projective"])
    def test_batched_cube_matches_sequential(self, dataset, model,
                                             carve_mode):
        _, frames, _ = dataset
        cfg = make_cfg(max_rays=1024)  # per-frame chunk = 2 ray tiles
        cfg = dataclasses.replace(
            cfg, tsdf=dataclasses.replace(cfg.tsdf, carve_mode=carve_mode))
        g_seq = run_frames(cfg, frames, model=model)   # XLA hash path
        integ.FORCE_PALLAS_INTERPRET = True
        try:
            model.integrate_frames.clear_cache()
            g_bat = model.integrate_frames(blocks.create(cfg),
                                           self._stack(frames), cfg, INTR)
        finally:
            integ.FORCE_PALLAS_INTERPRET = False
            model.integrate_frames.clear_cache()
        assert int(g_bat.n_blocks) == int(g_seq.n_blocks)
        coords = np.asarray(g_seq.block_coords)[:int(g_seq.n_blocks)]
        ss = blocks.lookup_slots(g_seq, jnp.asarray(coords), cfg.grid)
        sb = blocks.lookup_slots(g_bat, jnp.asarray(coords), cfg.grid)
        for ch in ("wsum", "wsdf", "sem_count"):
            np.testing.assert_allclose(
                np.asarray(getattr(g_seq, ch))[np.asarray(ss)],
                np.asarray(getattr(g_bat, ch))[np.asarray(sb)],
                rtol=1e-4, atol=1e-4, err_msg=ch)
        np.testing.assert_allclose(
            np.asarray(g_seq.sem_delta)[:, np.asarray(ss)],
            np.asarray(g_bat.sem_delta)[:, np.asarray(sb)],
            rtol=1e-4, atol=1e-4)


class TestProjectiveCarve:
    """carve_mode == "projective": dense free-space carve + ray-exact band
    (models/fast.py _maybe_projective_carve)."""

    def _mode_cfg(self, mode, **kw):
        cfg = make_cfg(**kw)
        return dataclasses.replace(
            cfg, tsdf=dataclasses.replace(cfg.tsdf, carve_mode=mode))

    def test_mesh_error_close_to_decimated(self):
        """Accuracy pinned at a production-like voxel/pixel ratio: the dense
        carve samples each voxel's own nearest pixel, so voxels must not
        span many pixels (at the canonical 0.05 m/640x480 operating point a
        voxel covers ~1-3 px; the 0.2 m/80x60 toy config here would cover
        dozens and is NOT the intended regime for this mode)."""
        from kimera_semantics_tpu.ops import mesh as mesh_ops
        from kimera_semantics_tpu.sim import eval as sim_eval
        intr = PinholeIntrinsics(fx=80.0, fy=80.0, cx=79.5, cy=59.5,
                                 width=160, height=120)
        lm = LabelColorMap.random(21)
        ds = SyntheticDataset(num_frames=3, intr=intr, label_map=lm)
        frames = [ds.frame(i) for i in range(3)]
        errs = {}
        for mode in ("decimated", "projective"):
            cfg = FusionConfig(
                grid=GridConfig(voxel_size=0.1, voxels_per_side=8,
                                block_capacity=1024),
                tsdf=TsdfConfig(truncation_distance=0.2, max_ray_length_m=4.0,
                                carve_mode=mode),
                pipeline=PipelineConfig(max_rays=8192,
                                        dedup_table_size=1 << 15,
                                        segment_budget=1 << 17,
                                        carve_budget=8192, carve_steps=16))
            grid = blocks.create(cfg)
            for f in frames:
                grid = fast.integrate_frame(grid, f, cfg, intr)
            m = mesh_ops.extract_mesh(grid, cfg, label_map=lm)
            errs[mode] = sim_eval.mesh_surface_error(m.vertices, ds.world)
        assert (errs["projective"]["mean"]
                <= errs["decimated"]["mean"] * 1.3 + 0.005), errs

    def test_free_space_carved_positive(self, dataset):
        """Observed voxels strictly before the band must hold tsdf ~ +trunc
        (free space), matching the full-traversal reference carving."""
        _, frames, _ = dataset
        cfg = self._mode_cfg("projective")
        g = run_frames(cfg, frames)
        cfg_full = self._mode_cfg("full")
        g_full = run_frames(cfg_full, frames)
        trunc = cfg.tsdf.truncation_distance
        for grid in (g, g_full):
            d = np.asarray(blocks.tsdf_distance(grid, trunc))
            w = np.asarray(grid.wsum)
            # Most observed voxels are free space at +trunc in both modes.
            frac_pos = (d[w > 1e-6] > 0.5 * trunc).mean()
            assert frac_pos > 0.5
        # Coverage: projective carve observes a comparable share of the
        # voxels the full traversal observes.
        obs_p = float((np.asarray(g.wsum) > 1e-6).sum())
        obs_f = float((np.asarray(g_full.wsum) > 1e-6).sum())
        assert obs_p > 0.6 * obs_f

    def test_band_matches_decimated_band(self, dataset):
        """Near-surface voxels (the ray-exact band) agree between projective
        and decimated modes — the band pipeline is shared."""
        _, frames, _ = dataset
        cfg_p = self._mode_cfg("projective")
        cfg_d = self._mode_cfg("decimated")
        gp = run_frames(cfg_p, frames)
        gd = run_frames(cfg_d, frames)
        trunc = cfg_p.tsdf.truncation_distance
        # Compare on voxels both observe with near-surface values.
        from kimera_semantics_tpu.grid import hash as bhash
        # match blocks by coordinates
        nb_p, nb_d = int(gp.n_blocks), int(gd.n_blocks)
        cp = {tuple(c): i for i, c in
              enumerate(np.asarray(gp.block_coords[:nb_p]))}
        dp = np.asarray(blocks.tsdf_distance(gp, trunc))
        dd = np.asarray(blocks.tsdf_distance(gd, trunc))
        wp, wd = np.asarray(gp.wsum), np.asarray(gd.wsum)
        diffs = []
        for j, c in enumerate(np.asarray(gd.block_coords[:nb_d])):
            i = cp.get(tuple(c))
            if i is None:
                continue
            m = ((wp[i] > 1e-6) & (wd[j] > 1e-6)
                 & (np.abs(dd[j]) < 0.9 * trunc))
            if m.any():
                diffs.append(np.abs(dp[i][m] - dd[j][m]))
        diffs = np.concatenate(diffs)
        # Identical band jobs; differences only from free-space weight mass
        # mixing at the band edge. Median near zero, bulk within a voxel.
        assert np.median(diffs) < 0.02
        assert (diffs < cfg_p.grid.voxel_size).mean() > 0.9

    def test_merged_projective_runs(self, dataset):
        _, frames, _ = dataset
        cfg = self._mode_cfg("projective")
        g = run_frames(cfg, frames, model=merged)
        assert int(g.n_blocks) > 0
        assert float(jnp.sum(g.wsum)) > 0
