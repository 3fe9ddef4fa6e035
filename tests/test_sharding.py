"""Multi-device sharding tests on the virtual 8-CPU mesh.

Validates the spatial-sharding protocol (parallel/sharding.py): sharded
integration must produce the same fused grid as single-device integration of
the same rays (ownership partition is exact, scatter-adds commute)."""

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
from kimera_semantics_tpu.models import fast
from kimera_semantics_tpu.models.common import Frame
from kimera_semantics_tpu.parallel import sharding

INTR = PinholeIntrinsics(fx=40.0, fy=40.0, cx=19.5, cy=14.5, width=40,
                         height=30)


def small_cfg():
    return FusionConfig(
        grid=GridConfig(voxel_size=0.25, voxels_per_side=8, block_capacity=256),
        tsdf=TsdfConfig(truncation_distance=0.5, max_ray_length_m=8.0),
        pipeline=PipelineConfig(max_rays=1280, dedup_table_size=1 << 12),
    )


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    return sharding.make_mesh(4)


def stack_frames(frames):
    return Frame(
        depth=jnp.stack([f.depth for f in frames]),
        labels=jnp.stack([f.labels for f in frames]),
        colors=jnp.stack([f.colors for f in frames]),
        T_G_C=jnp.stack([f.T_G_C for f in frames]),
    )


class TestShardedIntegration:
    def test_matches_single_device(self, mesh):
        cfg = small_cfg()
        d = mesh.devices.size
        ds = SyntheticDataset(num_frames=d, intr=INTR,
                              label_map=LabelColorMap.random())
        frames = [ds.frame(i) for i in range(d)]

        sgrid = sharding.create_sharded(cfg, mesh)
        sgrid = sharding.integrate_frames_sharded(
            sgrid, stack_frames(frames), cfg, INTR, mesh)
        merged, merged_cfg = sharding.merge_shards(sgrid, cfg)

        # Single-device reference: same frames, same per-frame dedup reset
        # (sharded path uses a fresh per-shard set per frame batch).
        single_cfg = dataclasses.replace(
            cfg, grid=dataclasses.replace(cfg.grid,
                                          block_capacity=cfg.grid.block_capacity * d))
        grid = blocks.create(single_cfg)
        for f in frames:
            grid = fast.integrate_frame(grid, f, single_cfg, INTR)

        # Compare per-voxel channels voxel-by-voxel via coordinates.
        nb_s = int(merged.n_blocks)
        nb_g = int(grid.n_blocks)
        assert nb_s == nb_g, (nb_s, nb_g)
        coords = np.asarray(merged.block_coords)[:nb_s]
        slots_m = blocks.lookup_slots(merged, jnp.asarray(coords),
                                      merged_cfg.grid)
        slots_g = blocks.lookup_slots(grid, jnp.asarray(coords),
                                      single_cfg.grid)
        for field in ["wsum", "wsdf", "sem_count"]:
            a = np.asarray(getattr(merged, field))[np.asarray(slots_m)]
            b = np.asarray(getattr(grid, field))[np.asarray(slots_g)]
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                       err_msg=field)
        # sem_delta layout is (L, B+1, V3) — label axis first.
        a = np.asarray(merged.sem_delta)[:, np.asarray(slots_m)]
        b = np.asarray(grid.sem_delta)[:, np.asarray(slots_g)]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_ownership_is_disjoint(self, mesh):
        cfg = small_cfg()
        d = mesh.devices.size
        ds = SyntheticDataset(num_frames=d, intr=INTR,
                              label_map=LabelColorMap.random())
        sgrid = sharding.create_sharded(cfg, mesh)
        sgrid = sharding.integrate_frames_sharded(
            sgrid, stack_frames([ds.frame(i) for i in range(d)]), cfg, INTR,
            mesh)
        seen = set()
        for s in range(d):
            nb = int(np.asarray(sgrid.n_blocks)[s])
            for c in np.asarray(sgrid.block_coords)[s][:nb]:
                key = tuple(c)
                assert key not in seen, f"block {key} allocated on two shards"
                seen.add(key)
        assert len(seen) > 0


class TestShardedMerged:
    """Sharded merged integrator (VERDICT r3 missing #1): D bundled frames,
    sparse (bundle, label) votes gathered with per-shard ray offsets, and —
    with anti-grazing — a globally consistent destination set."""

    @pytest.mark.parametrize("anti_grazing", [False, True])
    def test_matches_single_device(self, mesh, anti_grazing):
        from kimera_semantics_tpu.models import merged as merged_mod
        cfg = small_cfg()
        cfg = dataclasses.replace(
            cfg, tsdf=dataclasses.replace(
                cfg.tsdf, enable_anti_grazing=anti_grazing))
        d = mesh.devices.size
        ds = SyntheticDataset(num_frames=d, intr=INTR,
                              label_map=LabelColorMap.random())
        frames = [ds.frame(i) for i in range(d)]

        sgrid = sharding.create_sharded(cfg, mesh)
        sgrid = sharding.integrate_frames_sharded(
            sgrid, stack_frames(frames), cfg, INTR, mesh, method="merged")
        merged, merged_cfg = sharding.merge_shards(sgrid, cfg)

        single_cfg = dataclasses.replace(
            cfg, grid=dataclasses.replace(
                cfg.grid, block_capacity=cfg.grid.block_capacity * d))
        grid = blocks.create(single_cfg)
        for f in frames:
            grid = merged_mod.integrate_frame(grid, f, single_cfg, INTR)

        nb_s = int(merged.n_blocks)
        nb_g = int(grid.n_blocks)
        assert nb_s == nb_g > 0, (nb_s, nb_g)
        coords = np.asarray(merged.block_coords)[:nb_s]
        slots_m = blocks.lookup_slots(merged, jnp.asarray(coords),
                                      merged_cfg.grid)
        slots_g = blocks.lookup_slots(grid, jnp.asarray(coords),
                                      single_cfg.grid)
        for field in ["wsum", "wsdf", "sem_count"]:
            a = np.asarray(getattr(merged, field))[np.asarray(slots_m)]
            b = np.asarray(getattr(grid, field))[np.asarray(slots_g)]
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                       err_msg=field)
        a = np.asarray(merged.sem_delta)[:, np.asarray(slots_m)]
        b = np.asarray(grid.sem_delta)[:, np.asarray(slots_g)]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_cli_accepts_merged_devices(self, mesh):
        from kimera_semantics_tpu.parallel.multihost import MultiHostPipeline
        cfg = small_cfg()
        d = mesh.devices.size
        ds = SyntheticDataset(num_frames=d, intr=INTR,
                              label_map=LabelColorMap.random())
        pipe = MultiHostPipeline(cfg, INTR, mesh, method="merged",
                                 label_map=LabelColorMap.random())
        pipe.step(stack_frames([ds.frame(i) for i in range(d)]))
        m = pipe.update_mesh()
        assert m.num_triangles > 0


class TestShardedProjective:
    @pytest.mark.parametrize("wire", ["u16", "f32"])
    def test_matches_single_device(self, mesh, wire):
        """Protocol exactness under both wire formats: with the default u16
        wire-atlas exchange the single-device reference integrates the
        wire-roundtripped frames (what every shard sees); with f32 it
        integrates the raw frames. Both comparisons are tight."""
        cfg = small_cfg()
        cfg = dataclasses.replace(
            cfg, pipeline=dataclasses.replace(cfg.pipeline, wire_atlas=wire))
        d = mesh.devices.size
        ds = SyntheticDataset(num_frames=d, intr=INTR,
                              label_map=LabelColorMap.random())
        frames = [ds.frame(i) for i in range(d)]

        sgrid = sharding.create_sharded(cfg, mesh)
        sgrid = sharding.integrate_frames_sharded_projective(
            sgrid, stack_frames(frames), cfg, INTR, mesh)
        merged, merged_cfg = sharding.merge_shards(sgrid, cfg)

        from kimera_semantics_tpu.models import projective
        single_cfg = dataclasses.replace(
            cfg, grid=dataclasses.replace(
                cfg.grid, block_capacity=cfg.grid.block_capacity * d))
        grid = blocks.create(single_cfg)
        for f in frames:
            grid = projective.integrate_frame(grid, f, single_cfg, INTR,
                                              wire_sim=(wire == "u16"))

        nb_s = int(merged.n_blocks)
        nb_g = int(grid.n_blocks)
        assert nb_s == nb_g > 0, (nb_s, nb_g)
        coords = np.asarray(merged.block_coords)[:nb_s]
        slots_m = blocks.lookup_slots(merged, jnp.asarray(coords),
                                      merged_cfg.grid)
        slots_g = blocks.lookup_slots(grid, jnp.asarray(coords),
                                      single_cfg.grid)
        for field in ["wsum", "wsdf", "sem_count"]:
            a = np.asarray(getattr(merged, field))[np.asarray(slots_m)]
            b = np.asarray(getattr(grid, field))[np.asarray(slots_g)]
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                       err_msg=field)
        a = np.asarray(merged.sem_delta)[:, np.asarray(slots_m)]
        b = np.asarray(grid.sem_delta)[:, np.asarray(slots_g)]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


class TestShardMirror:
    """Incremental host mirror (parallel/sharding.py ShardMirror): per-cycle
    sync of only updated rows must reproduce the full shard merge, and the
    incremental MeshLayerCache mesh must equal a full-grid extraction
    (VERDICT r2 items 3/5)."""

    def test_incremental_sync_matches_merge(self, mesh):
        from kimera_semantics_tpu.parallel.multihost import MultiHostPipeline

        cfg = small_cfg()
        d = mesh.devices.size
        ds = SyntheticDataset(num_frames=2 * d, intr=INTR,
                              label_map=LabelColorMap.random())
        lm = LabelColorMap.random()
        pipe = MultiHostPipeline(cfg, INTR, mesh, method="fast",
                                 label_map=lm)
        # Two steps with a mesh cycle after each — the second sync must move
        # only rows updated by step 2.
        pipe.step(stack_frames([ds.frame(i) for i in range(d)]))
        m1 = pipe.update_mesh()
        pipe.step(stack_frames([ds.frame(i) for i in range(d, 2 * d)]))
        m2 = pipe.update_mesh()
        assert m2.num_triangles >= m1.num_triangles > 0

        # Mirror state (incremental, row replacement) == full shard merge.
        merged, merged_cfg = sharding.merge_shards(pipe.sgrid, cfg)
        mirror = pipe.mirror.grid
        nb = int(merged.n_blocks)
        assert int(mirror.n_blocks) == nb
        coords = np.asarray(merged.block_coords)[:nb]
        sm = blocks.lookup_slots(merged, jnp.asarray(coords), merged_cfg.grid)
        si = blocks.lookup_slots(mirror, jnp.asarray(coords),
                                 pipe.mirror.cfg.grid)
        for field in ["wsum", "wsdf", "sem_count"]:
            np.testing.assert_allclose(
                np.asarray(getattr(merged, field))[np.asarray(sm)],
                np.asarray(getattr(mirror, field))[np.asarray(si)],
                rtol=1e-5, atol=1e-5, err_msg=field)

        # Incremental cached mesh == full extraction over the mirror grid.
        from kimera_semantics_tpu.ops import mesh as mesh_ops
        full = mesh_ops.extract_mesh(mirror, pipe.mirror.cfg, label_map=lm)
        assert m2.num_triangles == full.num_triangles
        # Triangle soups match as sets (block order differs).
        a = np.sort(m2.vertices.reshape(-1, 9), axis=0)
        b = np.sort(full.vertices.reshape(-1, 9), axis=0)
        np.testing.assert_allclose(a, b, atol=1e-5)
