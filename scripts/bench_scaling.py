#!/usr/bin/env python
"""Scaling-efficiency harness for the sharded integrators (BASELINE configs
4-5: spatially-sharded grid, data-parallel frames).

Real multi-chip hardware is not reachable from this environment (one v5e chip
behind a tunnel), so this harness quantifies scaling the way it CAN be
quantified honestly:

  1. **Analytic per-device work** from the compiled HLO (cost_analysis): for
     each mesh size D, the per-device FLOPs and bytes of one sharded step
     processing D frames. Ideal weak scaling keeps per-device FLOPs constant
     (== the single-device one-frame step); efficiency = flops(D=1) /
     flops_per_device(D). This captures the true parallel-overhead sources —
     ray/atlas replication (all_gather) and the ownership-filtered but
     still-replicated allocation pre-pass — without CPU-emulation noise.
  2. **Collective traffic** per step (bytes entering all_gather), the ICI
     load of the replication protocol.
  3. **Exactness**: the D-shard result merged equals the sequential
     single-grid result (tests/test_sharding.py asserts this voxel-for-voxel;
     here we re-check total accumulated weight as a fast invariant).

Wall-clock on the virtual CPU mesh is intentionally NOT the headline: D
virtual devices share 2 physical cores, so measured time grows ~linearly in D
regardless of the algorithm's real scaling.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/bench_scaling.py [--method projective|fast]
Prints one JSON line per mesh size.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_tests"))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models.common import Frame
from kimera_semantics_tpu.parallel import sharding


def stack_frames(frames):
    return Frame(depth=jnp.stack([f.depth for f in frames]),
                 labels=jnp.stack([f.labels for f in frames]),
                 colors=jnp.stack([f.colors for f in frames]),
                 T_G_C=jnp.stack([f.T_G_C for f in frames]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="projective",
                    choices=["projective", "fast"])
    ap.add_argument("--mesh-sizes", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--canonical", action="store_true",
                    help="reference operating point: 0.05 m voxels, 640x480, "
                        "thousands of blocks (BASELINE configs 4-5)")
    ap.add_argument("--block-budget", type=int, default=None,
                    help="per-shard row budget, sized to the scene's touched "
                        "blocks per frame (MESH-INDEPENDENT: the combined "
                        "row path makes per-shard apply work ~constant in D)")
    args = ap.parse_args()

    # ONE config for every mesh size: with the combined multi-frame row
    # budget (parallel/sharding.py apply_rows_multi) a shard's apply rows
    # are ~the per-frame touched count regardless of D, so budgets must not
    # shrink with the mesh — a d-dependent budget would fake the scaling.
    if args.canonical:
        bb = args.block_budget or 512
        cfg = FusionConfig(
            grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                            block_capacity=4096),
            tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0),
            pipeline=PipelineConfig(max_rays=32768, dedup_table_size=1 << 18,
                                    block_budget=bb, alloc_stride=8,
                                    use_pallas=False),
        )
        intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                                 width=640, height=480)
    else:
        bb = args.block_budget or 64
        cfg = FusionConfig(
            grid=GridConfig(voxel_size=0.1, voxels_per_side=16,
                            block_capacity=1024),
            tsdf=TsdfConfig(truncation_distance=0.2, max_ray_length_m=5.0),
            pipeline=PipelineConfig(max_rays=8192, dedup_table_size=1 << 16,
                                    block_budget=bb, use_pallas=False),
        )
        intr = PinholeIntrinsics(fx=160.0, fy=160.0, cx=159.5, cy=119.5,
                                 width=320, height=240)
    make_cfg = lambda d: cfg
    lmap = LabelColorMap.random(cfg.grid.num_labels)
    max_d = max(args.mesh_sizes)
    ds = SyntheticDataset(num_frames=max_d, intr=intr, label_map=lmap)
    frames = [ds.frame(i) for i in range(max_d)]

    step_fn = (sharding.integrate_frames_sharded_projective
               if args.method == "projective"
               else sharding.integrate_frames_sharded)

    base_flops = None
    for d in args.mesh_sizes:
        if d > len(jax.devices()):
            print(json.dumps({"mesh": d, "skipped": "not enough devices"}))
            continue
        cfg = make_cfg(d)
        mesh = sharding.make_mesh(d)
        sgrid = sharding.create_sharded(cfg, mesh)
        fstack = jax.device_put(
            stack_frames(frames[:d]),
            jax.NamedSharding(mesh, jax.sharding.PartitionSpec("grid")))

        lowered = jax.jit(
            lambda g, f: step_fn(g, f, cfg, intr, mesh)).lower(sgrid, fstack)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns one dict per device
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        # cost_analysis reports the per-device program (SPMD): one step
        # integrates d frames, so ideal per-device flops == flops(D=1).
        if d == 1:
            base_flops = flops
        eff = (base_flops / flops) if (base_flops and flops) else None

        # run the step once for the exactness invariant
        out = step_fn(sgrid, fstack, cfg, intr, mesh)
        jax.block_until_ready(out.wsum)
        total_w = float(np.asarray(out.wsum[:, :cfg.grid.block_capacity]).sum())
        rec = {
            "metric": f"{args.method}_sharded_step_mesh{d}",
            "mesh_devices": d,
            "frames_per_step": d,
            "per_device_gflops": round(flops / 1e9, 4),
            "per_device_gbytes": round(bytes_acc / 1e9, 4),
            "weak_scaling_efficiency": round(eff, 4) if eff else None,
            "total_weight": round(total_w, 2),
            "blocks_per_shard": [int(x) for x in np.asarray(out.n_blocks)],
            "overflow": int(np.asarray(out.overflow).sum()),
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
