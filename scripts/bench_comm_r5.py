#!/usr/bin/env python
"""Communication evidence r5 (VERDICT r4 item 2): the u16 wire-atlas step.

Same methodology as scripts/bench_comm_r4.py (per-step collective bytes
from the optimized HLO + conservative 1D-ring ICI model + measured
single-chip step times), re-run after the r5 protocol change: the sharded
projective step now exchanges level-0 u16 depth/label wire planes with a
local mip rebuild (parallel/sharding.py, ops/mip.py wire_encode) instead of
the full f32 atlas. Emits both wire modes for the projective method so the
delta is explicit.

Compute times: BENCH_METHODS_r04 post-fusion B=1 rows (projective 704.4 fps
-> 1.42 ms; fast 128.5 -> 7.78 ms; merged 31.1 -> 32.2 ms).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_comm_r5.py [--skip-gloo] > comm.json
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_tests"))

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from bench_comm_r4 import (ICI_HOP_LAT_US, ICI_LINK_GBPS, canonical_cfg,
                           collective_bytes, gloo_wallclock, ici_model,
                           stack_frames, step_fn_for)
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.parallel import sharding

# Measured single-chip per-frame step times, BENCH_METHODS_r04 post-fusion.
MEASURED_MS_PER_FRAME = {"projective": 1.42, "fast": 7.78, "merged": 32.2}


def measure(methods, mesh_sizes):
    base_cfg, intr = canonical_cfg()
    lmap = LabelColorMap.random(base_cfg.grid.num_labels)
    max_d = max(mesh_sizes)
    ds = SyntheticDataset(num_frames=max_d, intr=intr, label_map=lmap)
    frames = [ds.frame(i) for i in range(max_d)]
    rows = []
    for method in methods:
        wires = ["u16", "f32"] if method == "projective" else ["u16"]
        for wire in wires:
            cfg = dataclasses.replace(
                base_cfg, pipeline=dataclasses.replace(
                    base_cfg.pipeline, wire_atlas=wire))
            fn = step_fn_for(method)
            for d in mesh_sizes:
                if d > len(jax.devices()):
                    continue
                mesh = sharding.make_mesh(d)
                sgrid = sharding.create_sharded(cfg, mesh)
                fstack = jax.device_put(
                    stack_frames(frames[:d]),
                    jax.NamedSharding(mesh,
                                      jax.sharding.PartitionSpec("grid")))
                compiled = jax.jit(
                    lambda g, f, _fn=fn, _m=mesh, _c=cfg:
                    _fn(g, f, _c, intr, _m)
                ).lower(sgrid, fstack).compile()
                cb = collective_bytes(compiled.as_text())
                total = float(sum(cb.values()))
                t_comm_ms = ici_model(total, d)
                t_comp_ms = MEASURED_MS_PER_FRAME[method]
                rows.append({
                    "method": method, "wire_atlas": wire, "mesh_devices": d,
                    "collective_bytes_per_step": {k: int(v)
                                                  for k, v in cb.items()},
                    "total_collective_mb_per_step": round(total / 1e6, 3),
                    "ici_model_t_comm_ms": round(t_comm_ms, 4),
                    "measured_t_comp_ms_per_device": t_comp_ms,
                    "efficiency_floor_no_overlap": round(
                        t_comp_ms / (t_comp_ms + t_comm_ms), 4),
                })
                print(json.dumps(rows[-1]), file=sys.stderr, flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-gloo", action="store_true")
    ap.add_argument("--methods", nargs="*",
                    default=["projective", "fast", "merged"])
    ap.add_argument("--mesh-sizes", type=int, nargs="*", default=[2, 4, 8])
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {
        "ici_model_assumptions": {
            "link_gbps_unidirectional": ICI_LINK_GBPS,
            "hop_latency_us": ICI_HOP_LAT_US,
            "schedule": "1D ring (conservative; v5e 2D torus does better)",
        },
        "collectives": measure(args.methods, args.mesh_sizes),
    }
    if not args.skip_gloo:
        out["gloo_wallclock"] = gloo_wallclock(repo)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
