"""Frame providers — the RosbagDataProvider equivalent.

The reference loads a rosbag's synchronized depth/semantic/rgb streams + TF tree
into RAM and replays them in lockstep (rosbag_data_provider.cpp:83-193, with
stream-length/timestamp sanity checks :178-190). Without ROS, the equivalents:

  - SyntheticDataset: frames rendered from the analytic sim world (sim/render.py)
    — the demo-sequence stand-in used by tests and bench.py.
  - DirectoryDataset: a directory of .npz frames (depth, labels, T_G_C) with an
    intrinsics.npz — the offline "bag" format for real data.

Both check stream consistency like the reference and yield models.common.Frame.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

import numpy as np
import jax.numpy as jnp

from ..core.camera import PinholeIntrinsics
from ..core.color import LabelColorMap
from ..models.common import Frame, frame_from_images
from ..sim import render as sim_render
from ..sim import world as sim_world


class SyntheticDataset:
    """Orbit-camera sweep of the eval world (CS3's 50-viewpoint loop)."""

    def __init__(self, num_frames: int = 50, intr: Optional[PinholeIntrinsics] = None,
                 world: Optional[sim_world.World] = None,
                 label_map: Optional[LabelColorMap] = None,
                 radius: float = 3.2, height: float = 2.2):
        self.num_frames = num_frames
        self.intr = intr or PinholeIntrinsics(fx=160.0, fy=160.0, cx=159.5,
                                              cy=119.5, width=320, height=240)
        self.world = world if world is not None else sim_world.default_eval_world()
        self.label_map = label_map or LabelColorMap.random()
        self.radius = radius
        self.height = height

    def __len__(self):
        return self.num_frames

    def pose(self, i: int):
        angle = 2.0 * np.pi * i / max(self.num_frames, 1)
        return sim_render.orbit_pose(angle, radius=self.radius,
                                     height=self.height)

    def frame(self, i: int) -> Frame:
        T = self.pose(i)
        depth, labels = sim_render.render_depth_labels(self.world, T, self.intr)
        colors = self.label_map.colors_from_labels(labels)
        return Frame(depth=depth, labels=labels,
                     colors=colors.astype(jnp.float32), T_G_C=T)

    def __iter__(self) -> Iterator[Frame]:
        for i in range(self.num_frames):
            yield self.frame(i)


class DirectoryDataset:
    """Loads frame_*.npz files: depth (H,W) f32, labels (H,W) i32 or
    colors (H,W,3) u8, T_G_C (4,4) f32; intrinsics.npz holds fx,fy,cx,cy,w,h."""

    def __init__(self, path: str, label_map: Optional[LabelColorMap] = None):
        self.path = path
        self.label_map = label_map or LabelColorMap.random()
        meta = np.load(os.path.join(path, "intrinsics.npz"))
        self.intr = PinholeIntrinsics(
            fx=float(meta["fx"]), fy=float(meta["fy"]), cx=float(meta["cx"]),
            cy=float(meta["cy"]), width=int(meta["width"]),
            height=int(meta["height"]))
        self.files: List[str] = sorted(
            f for f in os.listdir(path) if f.startswith("frame_")
            and f.endswith(".npz"))
        if not self.files:
            raise ValueError(f"{path}: no frame_*.npz files")
        # Stream-consistency check (rosbag_data_provider.cpp:178-190): every
        # frame must carry the full synchronized tuple.
        probe = np.load(os.path.join(path, self.files[0]))
        if "depth" not in probe or "T_G_C" not in probe:
            raise ValueError(f"{path}: frames need depth + T_G_C")
        if "labels" not in probe and "colors" not in probe:
            raise ValueError(f"{path}: frames need labels or colors")

    def __len__(self):
        return len(self.files)

    def frame(self, i: int) -> Frame:
        data = np.load(os.path.join(self.path, self.files[i]))
        return frame_from_images(
            depth=data["depth"], intr=self.intr, label_map=self.label_map,
            labels=data.get("labels"), colors=data.get("colors"),
            T_G_C=data["T_G_C"])

    def __iter__(self) -> Iterator[Frame]:
        for i in range(len(self)):
            yield self.frame(i)


def save_directory_dataset(path: str, dataset, num_frames: Optional[int] = None):
    """Materialize any dataset to the directory format (fixture builder)."""
    os.makedirs(path, exist_ok=True)
    intr = dataset.intr
    np.savez(os.path.join(path, "intrinsics.npz"),
             fx=intr.fx, fy=intr.fy, cx=intr.cx, cy=intr.cy,
             width=intr.width, height=intr.height)
    n = num_frames if num_frames is not None else len(dataset)
    for i in range(n):
        f = dataset.frame(i)
        np.savez(os.path.join(path, f"frame_{i:05d}.npz"),
                 depth=np.asarray(f.depth), labels=np.asarray(f.labels),
                 T_G_C=np.asarray(f.T_G_C))
