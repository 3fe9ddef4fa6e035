#!/usr/bin/env python
"""Regenerate the committed golden-fixture bag (tests/fixtures/).

The bag pins the INPUT of the end-to-end regression suite
(tests/test_golden.py) byte-for-byte: 12 synthetic frames of the analytic
eval world rendered at 160x120, written as a ROS1 v2.0 bag (16UC1 depth mm +
rgb8 semantics + camera info + /tf), mirroring the reference's demo-bag
regression practice (kimera_semantics_ros/scripts/kimera_semantics_eval.bash).
Rerun only when the fixture format itself must change — the test's pinned
metrics must be re-derived afterwards.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_platforms", "cpu")

from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.io.rosbag import write_dataset_bag

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "golden_scene.bag")


def main():
    intr = PinholeIntrinsics(fx=80.0, fy=80.0, cx=79.5, cy=59.5,
                             width=160, height=120)
    ds = SyntheticDataset(num_frames=12, intr=intr,
                          label_map=LabelColorMap.random(21, seed=0))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    write_dataset_bag(OUT, ds)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
