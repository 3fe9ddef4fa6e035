#!/usr/bin/env python
"""Device-side op breakdown of the projective frame via jax.profiler trace
(per-op dispatch timing over the tunnel is meaningless; this reads the real
TPU timeline)."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
import jax
import jax.numpy as jnp

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import projective as proj_model


def main():
    out_dir = "/tmp/jax_trace_proj"
    os.system(f"rm -rf {out_dir}")
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(
            alloc_stride=int(os.environ.get("STRIDE", "4")),
            block_budget=int(os.environ.get("BUDGET", "512"))))
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    ds = SyntheticDataset(num_frames=8, intr=intr,
                          label_map=LabelColorMap.random())
    frames = [ds.frame(i) for i in range(8)]
    grid = blocks.create(cfg)
    for f in frames[:3]:
        grid = proj_model.integrate_frame(grid, f, cfg, intr)
    jax.block_until_ready(grid.wsum)

    with jax.profiler.trace(out_dir):
        for f in frames[3:8]:
            grid = proj_model.integrate_frame(grid, f, cfg, intr)
        jax.block_until_ready(grid.wsum)

    paths = glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace written", glob.glob(f"{out_dir}/**", recursive=True))
        return 1
    with gzip.open(sorted(paths)[-1], "rt") as fh:
        trace = json.load(fh)
    # Find device-track complete events; aggregate by op name.
    by_name = defaultdict(float)
    total = 0.0
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "Device" in n}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        if name.startswith("Steps") or "/" in name and name.count("/") > 4:
            pass
        by_name[name] += dur
        total += dur
    print(f"device pids: {sorted(dev_pids)}; total op-ms over 5 frames: "
          f"{total:.2f} (= {total/5:.2f} ms/frame)")
    items = sorted(by_name.items(), key=lambda kv: -kv[1])
    for name, ms in items[:40]:
        print(f"{ms/5:9.3f} ms/frame  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
