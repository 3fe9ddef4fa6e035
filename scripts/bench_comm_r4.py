#!/usr/bin/env python
"""Communication evidence for the sharded step (VERDICT r3 item 6).

Real multi-chip hardware is unreachable here (one v5e behind a tunnel), so
this harness extracts what CAN be measured honestly about the protocol's
communication cost, to complement the analytic FLOPs scaling of
scripts/bench_scaling.py:

  1. **Measured per-step collective bytes** — compile the sharded step for
     each mesh size/method and sum the output bytes of every collective op
     (all-gather / all-reduce / collective-permute / reduce-scatter) in the
     optimized HLO. This is the exact ICI traffic XLA will issue per step
     (the ray/atlas replication protocol of parallel/sharding.py).
  2. **ICI latency/bandwidth model** — ring all_gather time
     t = (D-1)/D * gathered_bytes / link_bw + (D-1) * hop_lat over the mesh
     axis, with v5e constants stated as ASSUMPTIONS (45 GB/s unidirectional
     per link, 1 us per hop; 2D-torus meshes would do better — the 1D ring
     is the conservative bound). Combined with the MEASURED single-chip
     per-frame step time (BENCH_METHODS_r03, per-device compute is
     ~constant in D by the combined-row-budget design), this bounds real
     weak-scaling efficiency: eff <= t_comp / (t_comp + t_comm), assuming
     zero compute/comm overlap (XLA overlaps, so this is a floor).
  3. **Wall-clock collective overhead, 2-process gloo** — the SAME step on a
     D=2 mesh, single-process (no cross-process comm) vs two processes
     (gloo/TCP over localhost, jax.distributed). The delta upper-bounds the
     per-step collective overhead of the protocol on the worst transport we
     can actually run (TCP loopback; ICI is ~100x faster). Labeled as such.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_comm_r4.py [--skip-gloo] > comm.json
"""

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import textwrap
import time

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

# -- stated ICI model assumptions (v5e; public "How to Scale Your Model"
#    numbers; conservative 1D-ring collective schedule) ----------------------
ICI_LINK_GBPS = 45.0        # unidirectional per link, GB/s
ICI_HOP_LAT_US = 1.0        # per-hop latency, us
DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8,
               "pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
               "u16": 2}

# Measured single-chip per-frame step time (BENCH_METHODS_r03, B=1 rows,
# canonical config): per-device compute per sharded step ~= one frame's
# compute (combined row budget / ownership filter designs).
MEASURED_MS_PER_FRAME = {"projective": 1.931, "fast": 30.0, "merged": 58.5}


def stack_frames(frames):
    return Frame(depth=jnp.stack([f.depth for f in frames]),
                 labels=jnp.stack([f.labels for f in frames]),
                 colors=jnp.stack([f.colors for f in frames]),
                 T_G_C=jnp.stack([f.T_G_C for f in frames]))


_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape string, e.g. 'f32[8,28672,3]' or a tuple
    '(f32[8,128], s32[8])' (sum of parts)."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes per collective kind in optimized HLO."""
    out = {}
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*((?:\([^)]*\)|\S+))\s+"
                      r"(all-gather|all-reduce|collective-permute|"
                      r"reduce-scatter|all-to-all)", line)
        if not m:
            continue
        kind = m.group(2)
        out[kind] = out.get(kind, 0) + _shape_bytes(m.group(1))
    return out


def canonical_cfg():
    return FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0),
        pipeline=PipelineConfig(max_rays=32768, dedup_table_size=1 << 18,
                                block_budget=512, alloc_stride=8,
                                use_pallas=False),
    ), PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                         width=640, height=480)


def step_fn_for(method):
    if method == "projective":
        return sharding.integrate_frames_sharded_projective
    from functools import partial
    return partial(sharding.integrate_frames_sharded, method=method)


def ici_model(total_bytes: float, d: int) -> float:
    """Ring all_gather/all_reduce time in ms for total collective bytes."""
    if d <= 1:
        return 0.0
    t_bw = (d - 1) / d * total_bytes / (ICI_LINK_GBPS * 1e9)
    t_lat = (d - 1) * ICI_HOP_LAT_US * 1e-6
    return (t_bw + t_lat) * 1e3


def measure_collectives(methods, mesh_sizes):
    cfg, intr = canonical_cfg()
    lmap = LabelColorMap.random(cfg.grid.num_labels)
    max_d = max(mesh_sizes)
    ds = SyntheticDataset(num_frames=max_d, intr=intr, label_map=lmap)
    frames = [ds.frame(i) for i in range(max_d)]
    rows = []
    for method in methods:
        fn = step_fn_for(method)
        for d in mesh_sizes:
            if d > len(jax.devices()):
                continue
            mesh = sharding.make_mesh(d)
            sgrid = sharding.create_sharded(cfg, mesh)
            fstack = jax.device_put(
                stack_frames(frames[:d]),
                jax.NamedSharding(mesh, jax.sharding.PartitionSpec("grid")))
            compiled = jax.jit(
                lambda g, f, _fn=fn, _m=mesh: _fn(g, f, cfg, intr, _m)
            ).lower(sgrid, fstack).compile()
            cb = collective_bytes(compiled.as_text())
            total = float(sum(cb.values()))
            t_comm_ms = ici_model(total, d)
            t_comp_ms = MEASURED_MS_PER_FRAME[method]
            rows.append({
                "method": method, "mesh_devices": d,
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


GLOO_WORKER = textwrap.dedent("""
    import os, sys, time
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_ksd_tests"))
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=2, process_id=pid)
    import numpy as np, jax.numpy as jnp
    sys.path.insert(0, {repo!r})
    from kimera_semantics_tpu.parallel import multihost
    from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                             PipelineConfig, TsdfConfig)
    from kimera_semantics_tpu.core.camera import PinholeIntrinsics
    from kimera_semantics_tpu.core.color import LabelColorMap
    from kimera_semantics_tpu.io.dataset import SyntheticDataset
    from kimera_semantics_tpu.models.common import Frame
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.25, voxels_per_side=8,
                        block_capacity=512),
        tsdf=TsdfConfig(truncation_distance=0.5, max_ray_length_m=8.0),
        pipeline=PipelineConfig(max_rays=1024, dedup_table_size=1 << 12,
                                use_pallas=False))
    intr = PinholeIntrinsics(fx=40.0, fy=40.0, cx=31.5, cy=23.5, width=64,
                             height=48)
    lmap = LabelColorMap.random()
    ds = SyntheticDataset(num_frames=16, intr=intr, label_map=lmap)
    pipe = multihost.MultiHostPipeline(cfg, intr)
    nloc = len(jax.local_devices())
    def local_batch(s):
        fr = [ds.frame((2 * s + pid) % 16) for i in range(nloc)]
        return Frame(depth=np.stack([np.asarray(f.depth) for f in fr]),
                     labels=np.stack([np.asarray(f.labels) for f in fr]),
                     colors=np.stack([np.asarray(f.colors) for f in fr]),
                     T_G_C=np.stack([np.asarray(f.T_G_C) for f in fr]))
    sgrid = pipe.step(local_batch(0))        # warmup + compile
    jax.block_until_ready(sgrid.wsum)
    t0 = time.perf_counter()
    for s in range(1, 5):
        sgrid = pipe.step(local_batch(s))
    jax.block_until_ready(sgrid.wsum)
    dt = (time.perf_counter() - t0) / 4
    print("STEPMS", pid, dt * 1e3, flush=True)
""")


def gloo_wallclock(repo):
    """Two-process gloo step time vs single-process same-mesh step time."""
    # single-process D=2 baseline (this process, no cross-process comm)
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.25, voxels_per_side=8,
                        block_capacity=512),
        tsdf=TsdfConfig(truncation_distance=0.5, max_ray_length_m=8.0),
        pipeline=PipelineConfig(max_rays=1024, dedup_table_size=1 << 12,
                                use_pallas=False))
    intr = PinholeIntrinsics(fx=40.0, fy=40.0, cx=31.5, cy=23.5, width=64,
                             height=48)
    lmap = LabelColorMap.random()
    ds = SyntheticDataset(num_frames=16, intr=intr, label_map=lmap)
    mesh = sharding.make_mesh(2)
    sgrid = sharding.create_sharded(cfg, mesh)
    spec = jax.NamedSharding(mesh, jax.sharding.PartitionSpec("grid"))
    def batch(s):
        return jax.device_put(stack_frames([ds.frame(2 * s), ds.frame(2 * s + 1)]), spec)
    sgrid = sharding.integrate_frames_sharded(sgrid, batch(0), cfg, intr,
                                              mesh)
    jax.block_until_ready(sgrid.wsum)
    t0 = time.perf_counter()
    for s in range(1, 5):
        sgrid = sharding.integrate_frames_sharded(sgrid, batch(s), cfg, intr,
                                                  mesh)
    jax.block_until_ready(sgrid.wsum)
    single_ms = (time.perf_counter() - t0) / 4 * 1e3

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "worker.py")
        with open(script, "w") as f:
            f.write(GLOO_WORKER.format(repo=repo))
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = str(s.getsockname()[1])
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["JAX_PLATFORMS"] = "cpu"
        procs = [subprocess.Popen([sys.executable, script, str(i), port],
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.PIPE, env=env, text=True)
                 for i in range(2)]
        outs = [p.communicate(timeout=600) for p in procs]
        ms = []
        for (out, err), p in zip(outs, procs):
            if p.returncode != 0:
                return {"skipped": f"gloo run failed: {err[-300:]}"}
            for line in out.splitlines():
                if line.startswith("STEPMS"):
                    ms.append(float(line.split()[2]))
    return {
        "single_process_2dev_step_ms": round(single_ms, 2),
        "two_process_gloo_step_ms": [round(m, 2) for m in ms],
        "collective_overhead_ms_upper_bound": round(
            max(ms) - single_ms, 2) if ms else None,
        "note": ("gloo/TCP loopback on 2 shared CPU cores — worst-case "
                 "transport AND compute contention; ICI is ~100x faster. "
                 "Evidences the protocol's O(1) collectives per step, "
                 "not ICI latency."),
    }


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
        "collectives": measure_collectives(args.methods, args.mesh_sizes),
    }
    if not args.skip_gloo:
        out["gloo_wallclock"] = gloo_wallclock(repo)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
