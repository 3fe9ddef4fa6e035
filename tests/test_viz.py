"""Live incremental-mesh surface tests (server/viz.py — the rviz
incremental-mesh topic equivalent, VERDICT r1 item 6)."""

import json
import os
import urllib.request

import numpy as np
import pytest

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.io import ply as ply_io
from kimera_semantics_tpu.ops.mesh import Mesh
from kimera_semantics_tpu.server import viz
from kimera_semantics_tpu.server.pipeline import (SemanticTsdfServer,
                                                  ServerConfig)

INTR = PinholeIntrinsics(fx=40.0, fy=40.0, cx=39.5, cy=29.5, width=80,
                         height=60)


def cfg_():
    return FusionConfig(
        grid=GridConfig(voxel_size=0.2, voxels_per_side=8,
                        block_capacity=512),
        tsdf=TsdfConfig(truncation_distance=0.4, max_ray_length_m=4.0),
        pipeline=PipelineConfig(max_rays=2048, dedup_table_size=1 << 14,
                                segment_budget=1 << 16, carve_budget=4096,
                                carve_steps=16))


def _soup(tris, base=0.0):
    n = tris * 3
    v = (np.arange(n * 3, dtype=np.float32).reshape(n, 3) / 10.0) + base
    c = np.full((n, 3), 128, np.uint8)
    t = np.arange(n, dtype=np.int32).reshape(-1, 3)
    return Mesh(v, c, t)


class TestMeshLayerCache:
    def test_replaces_only_remeshed_blocks(self):
        cache = viz.MeshLayerCache()
        m = _soup(3)
        cache.update(m, meshed_rows=np.array([0, 1]),
                     tri_rows=np.array([0, 0, 1], np.int32))
        assert cache.num_blocks == 2
        assert cache.full_mesh().num_triangles == 3
        # Re-mesh block 0 with ONE triangle; block 1 must keep its old one.
        m2 = _soup(1, base=100.0)
        cache.update(m2, meshed_rows=np.array([0]),
                     tri_rows=np.array([0], np.int32))
        full = cache.full_mesh()
        assert cache.num_blocks == 2
        assert full.num_triangles == 2
        # Block 1's original vertices survived.
        assert (full.vertices < 50.0).any() and (full.vertices > 99.0).any()

    def test_remeshed_to_empty_clears_block(self):
        cache = viz.MeshLayerCache()
        cache.update(_soup(2), meshed_rows=np.array([5]),
                     tri_rows=np.array([5, 5], np.int32))
        assert cache.num_blocks == 1
        # Carved away: block 5 re-meshed, zero triangles now.
        cache.update(_soup(0), meshed_rows=np.array([5]),
                     tri_rows=np.zeros(0, np.int32))
        assert cache.num_blocks == 0
        assert cache.full_mesh().num_triangles == 0


class TestLiveMeshWriter:
    def test_atomic_rewrite_and_rotation(self, tmp_path):
        path = str(tmp_path / "live.ply")
        w = viz.LiveMeshWriter(path, keep=2)
        for i in range(4):
            w.write(_soup(i + 1))
        v, c, t = ply_io.read_ply(path)
        assert len(t) == 4 and not os.path.exists(path + ".tmp")
        snaps = sorted(p.name for p in tmp_path.glob("live.*.ply"))
        assert snaps == ["live.0002.ply", "live.0003.ply"]


class TestEndToEndStream:
    def test_growing_mesh_file_and_http(self, tmp_path):
        cfg = cfg_()
        lmap = LabelColorMap.random(cfg.grid.num_labels)
        ds = SyntheticDataset(num_frames=6, intr=INTR, label_map=lmap)
        live = str(tmp_path / "live.ply")
        srv = SemanticTsdfServer(
            cfg, INTR, lmap,
            ServerConfig(mesh_every_n_frames=2, live_mesh_path=live,
                         live_mesh_port=0))
        port = srv.live_streamer.port
        tri_counts = []
        for i in range(6):
            # insert_frame runs the periodic mesh update itself
            # (mesh_every_n_frames=2), which feeds the live surfaces.
            srv.insert_frame(ds.frame(i))
            if (i + 1) % 2 == 0:
                # r5: periodic meshing is pipelined (ServerConfig
                # .async_mesh); flush the in-flight cycle before reading
                # its side effects.
                srv.join_mesh()
                v, c, t = ply_io.read_ply(live)
                tri_counts.append(len(t))
        # The live file holds the FULL growing mesh, not the increment.
        assert tri_counts[0] > 0
        assert tri_counts[-1] >= tri_counts[0]
        assert srv.mesh_cache.version == 3

        def get(p):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{p}", timeout=10) as r:
                return r.read()

        stats = json.loads(get("/stats.json"))
        assert stats["version"] == 3 and stats["triangles"] == tri_counts[-1]
        body = get("/mesh.ply")
        assert body.startswith(b"ply\n")
        assert len(body) > 100
        html = get("/")
        assert b"mesh.ply" in html and b"<canvas" in html
        # Full mesh served == full mesh on disk.
        assert body == open(live, "rb").read()
        srv.live_streamer.close()
