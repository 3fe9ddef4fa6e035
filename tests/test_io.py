"""I/O tests: PLY round-trip (native + numpy paths), grid checkpointing,
dataset providers."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, TsdfConfig)
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io import dataset as ds_io
from kimera_semantics_tpu.io import ply as ply_io
from kimera_semantics_tpu.io import serial as serial_io
from kimera_semantics_tpu.native import loader as native_loader


def small_cfg():
    return FusionConfig(
        grid=GridConfig(voxel_size=0.2, voxels_per_side=8, block_capacity=32),
        tsdf=TsdfConfig(),
        pipeline=PipelineConfig(max_rays=64, dedup_table_size=1 << 10),
    )


class TestPly:
    def _roundtrip(self, tmp_path, use_native):
        rng = np.random.RandomState(0)
        v = rng.randn(30, 3).astype(np.float32)
        c = rng.randint(0, 256, (30, 3)).astype(np.uint8)
        t = np.arange(30, dtype=np.int32).reshape(10, 3)
        path = str(tmp_path / f"m_{use_native}.ply")
        if use_native:
            lib = native_loader.get()
            if lib is None:
                pytest.skip("native library unavailable")
            native_loader.write_ply(lib, path, v, c, t)
        else:
            saved = native_loader._lib, native_loader._tried
            native_loader._lib, native_loader._tried = None, True
            try:
                ply_io.write_ply(path, v, c, t)
            finally:
                native_loader._lib, native_loader._tried = saved
        rv, rc, rt = ply_io.read_ply(path)
        np.testing.assert_array_equal(rv, v)
        np.testing.assert_array_equal(rc, c)
        np.testing.assert_array_equal(rt, t)
        return open(path, "rb").read()

    def test_numpy_roundtrip(self, tmp_path):
        self._roundtrip(tmp_path, use_native=False)

    def test_native_matches_numpy_bytes(self, tmp_path):
        if native_loader.get() is None:
            pytest.skip("native library unavailable")
        a = self._roundtrip(tmp_path, use_native=True)
        b = self._roundtrip(tmp_path, use_native=False)
        assert a == b


class TestCheckpoint:
    def test_grid_roundtrip(self, tmp_path):
        cfg = small_cfg()
        grid = blocks.create(cfg)
        grid = blocks.allocate_blocks(
            grid, jnp.array([[0, 0, 0], [1, 2, 3]], dtype=jnp.int32),
            jnp.ones(2, dtype=bool), cfg.grid)
        import dataclasses
        grid = dataclasses.replace(
            grid,
            wsum=grid.wsum.at[0, 5].set(2.5),
            wsdf=grid.wsdf.at[0, 5].set(-0.3),
            sem_delta=grid.sem_delta.at[7, 0, 5].set(1.5),
        )
        path = str(tmp_path / "map.ksdv")
        serial_io.save_grid(path, grid)
        loaded = serial_io.load_grid(path, cfg)
        # All semantic channels round-trip (reference never serialized the
        # semantic layer — SURVEY 5.4 gap, fixed here).
        for f in serial_io._FIELDS:
            np.testing.assert_array_equal(np.asarray(getattr(loaded, f)),
                                          np.asarray(getattr(grid, f)), f)

    def test_shape_mismatch_rejected(self, tmp_path):
        cfg = small_cfg()
        grid = blocks.create(cfg)
        path = str(tmp_path / "map.ksdv")
        serial_io.save_grid(path, grid)
        import dataclasses
        other = dataclasses.replace(
            cfg, grid=dataclasses.replace(cfg.grid, block_capacity=64))
        with pytest.raises(ValueError):
            serial_io.load_grid(path, other)


class TestDatasets:
    def test_synthetic_frames(self):
        ds = ds_io.SyntheticDataset(num_frames=2)
        f = ds.frame(0)
        assert f.depth.shape == (240, 320)
        d = np.asarray(f.depth)
        assert (d > 0).mean() > 0.5  # camera sees the room
        labs = np.asarray(f.labels)[d > 0]
        assert set(np.unique(labs)) <= {0, 1, 2, 3, 4}

    def test_directory_roundtrip(self, tmp_path):
        src = ds_io.SyntheticDataset(num_frames=2)
        path = str(tmp_path / "bag")
        ds_io.save_directory_dataset(path, src, num_frames=2)
        back = ds_io.DirectoryDataset(path)
        assert len(back) == 2
        f0 = back.frame(0)
        np.testing.assert_allclose(np.asarray(f0.depth),
                                   np.asarray(src.frame(0).depth), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(f0.T_G_C),
                                      np.asarray(src.frame(0).T_G_C))

    def test_missing_streams_rejected(self, tmp_path):
        os.makedirs(tmp_path / "bad", exist_ok=True)
        np.savez(tmp_path / "bad" / "intrinsics.npz", fx=1.0, fy=1.0, cx=0.0,
                 cy=0.0, width=4, height=4)
        np.savez(tmp_path / "bad" / "frame_00000.npz",
                 depth=np.zeros((4, 4), np.float32))
        with pytest.raises(ValueError):
            ds_io.DirectoryDataset(str(tmp_path / "bad"))


import os as _os
import pytest as _pytest


REF_CFG = "/root/reference/kimera_semantics_ros/cfg"


@_pytest.mark.skipif(not _os.path.isdir(REF_CFG),
                     reason="reference checkout not present")
class TestReferenceCsvCompat:
    """The reference's actual label<->color CSVs load unmodified
    (color.cpp:42-67 format: name,red,green,blue,alpha,id)."""

    @_pytest.mark.parametrize("name,n_min", [
        ("tesse_multiscene_office1_segmentation_mapping.csv", 20),
        # maskrcnn: 81 class names collapsed onto 21 ids
        # (mask_rcnn_mapping.csv is an unfilled template: rows "name," only)
        ("maskrcnn_mapping.csv", 21),
        ("simulation.csv", 3),
    ])
    def test_loads(self, name, n_min):
        import numpy as np
        from kimera_semantics_tpu.core.color import LabelColorMap
        path = _os.path.join(REF_CFG, name)
        if not _os.path.exists(path):
            _pytest.skip(f"{name} absent")
        m = LabelColorMap.from_csv(path)
        assert m.num_labels >= n_min
        # White is forced to label 0 (color.cpp:62-66) and unknown colors
        # fall back to label 0 (color.cpp:69-82).
        import jax.numpy as jnp
        white = jnp.asarray([[255, 255, 255]], dtype=jnp.uint8)
        assert int(m.labels_from_colors(white)[0]) == 0
        odd = jnp.asarray([[254, 253, 1]], dtype=jnp.uint8)
        assert int(m.labels_from_colors(odd)[0]) == 0
        # The label<->color mapping is many-to-one both ways in the
        # reference CSVs (shared colors; White forced to 0) — exact
        # round-trips don't exist, but one color->label->color->label pass
        # must be idempotent.
        labs = jnp.arange(m.num_labels, dtype=jnp.int32)
        back = m.labels_from_colors(m.colors_from_labels(labs).astype(
            jnp.uint8))
        canon = m.colors_from_labels(back)
        back2 = m.labels_from_colors(canon.astype(jnp.uint8))
        assert np.array_equal(np.asarray(back), np.asarray(back2))


class TestPrefetch:
    def test_order_and_completeness(self):
        from kimera_semantics_tpu.io.prefetch import prefetch
        assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))
        assert list(prefetch(iter([]), depth=2)) == []
        assert list(prefetch(iter([1, 2]), depth=0)) == [1, 2]

    def test_producer_exception_propagates(self):
        from kimera_semantics_tpu.io.prefetch import prefetch

        def gen():
            yield 1
            raise RuntimeError("boom")

        it = prefetch(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="boom"):
            list(it)

    def test_server_run_uses_prefetch(self):
        """run() through the prefetch thread integrates every frame once."""
        from kimera_semantics_tpu.config import FusionConfig, GridConfig, \
            PipelineConfig
        from kimera_semantics_tpu.core.camera import PinholeIntrinsics
        from kimera_semantics_tpu.server.pipeline import (SemanticTsdfServer,
                                                          ServerConfig)
        intr = PinholeIntrinsics(fx=40.0, fy=40.0, cx=19.5, cy=14.5,
                                 width=40, height=30)
        cfg = FusionConfig(
            grid=GridConfig(voxel_size=0.25, voxels_per_side=8,
                            block_capacity=512),
            pipeline=PipelineConfig(max_rays=1024,
                                    dedup_table_size=1 << 12))
        srv = SemanticTsdfServer(cfg, intr,
                                 server_cfg=ServerConfig(prefetch_depth=2))
        ds = ds_io.SyntheticDataset(num_frames=3, intr=intr,
                                    label_map=srv.label_map)
        assert srv.run(ds, max_frames=2) == 2
        assert srv.stats()["frames"] == 2
