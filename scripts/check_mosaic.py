#!/usr/bin/env python
"""Pre-flight Mosaic validation WITHOUT a TPU.

`jax.export(..., platforms=["tpu"])` runs the full TPU lowering — including
Pallas->Mosaic kernel lowering and its BlockSpec/layout checks — client-side
on CPU. Every fresh bench process on the axon tunnel pays ~10 min of compile
before a lowering error surfaces (and an aborted client can wedge the tunnel
for everyone), so run THIS first after touching ops/pallas_kernels.py or any
jit signature on the hot path:

    python scripts/check_mosaic.py            # all entries
    python scripts/check_mosaic.py fast_b8    # one entry

Checks trace+lower only (no execution, no numerics): a passing entry can
still be slow or wrong — it just won't die in Mosaic lowering on the chip.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import export

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.models.common import Frame
from kimera_semantics_tpu.ops import integrate as int_ops


def bench_cfg(vps=16, carve_mode="projective", batch=1):
    return FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=vps,
                        block_capacity=4096 if vps <= 16 else 768),
        tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0,
                        voxel_carving_enabled=True, use_const_weight=False,
                        carve_mode=carve_mode),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(
            max_rays=32768, dedup_table_size=1 << 20,
            scatter_mode="segment", segment_budget=(1 << 18) * batch,
            alloc_stride=8, block_budget=512 if vps <= 16 else 128),
    )


INTR = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                         width=640, height=480)


def frame_struct(batch=None):
    sh = lambda *s: jax.ShapeDtypeStruct(
        ((batch,) + s) if batch else s, jnp.float32)
    shi = lambda *s: jax.ShapeDtypeStruct(
        ((batch,) + s) if batch else s, jnp.int32)
    H, W = INTR.height, INTR.width
    return Frame(depth=sh(H, W), labels=shi(H, W), colors=sh(H, W, 3),
                 T_G_C=sh(4, 4))


def grid_struct(cfg):
    g = blocks.create(cfg)
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), g)


def _force_tpu_pallas():
    # integrate_jobs gates the Pallas path on the runtime backend; force it
    # so the export traces the TPU kernels.
    int_ops.FORCE_PALLAS_LOWER = True


def check(name, fn, *args):
    try:
        export.export(jax.jit(fn), platforms=["tpu"])(*args)
        print(f"  ok   {name}")
        return True
    except Exception as e:  # noqa: BLE001 — report and continue
        print(f"  FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        return False


def main(only=None):
    from kimera_semantics_tpu.models import fast, merged, projective

    # The Pallas branch keys off the runtime backend; interpret=False +
    # forcing the gate makes the export include the real kernels.
    int_ops.FORCE_PALLAS_INTERPRET = False
    real_use_pallas = int_ops._use_pallas
    int_ops._use_pallas = lambda cfg: cfg.pipeline.use_pallas

    entries = {}

    cfg_p = bench_cfg()
    entries["projective"] = lambda: check(
        "projective.integrate_frame",
        lambda g, f: projective.integrate_frame(g, f, cfg_p, INTR),
        grid_struct(cfg_p), frame_struct())

    entries["projective_b8"] = lambda: check(
        "projective.integrate_frames B=8",
        lambda g, f: projective.integrate_frames(g, f, cfg_p, INTR),
        grid_struct(cfg_p), frame_struct(batch=8))

    cfg_f = bench_cfg(carve_mode="projective")
    entries["fast"] = lambda: check(
        "fast.integrate_frame (projective carve)",
        lambda g, f: fast.integrate_frame(g, f, cfg_f, INTR),
        grid_struct(cfg_f), frame_struct())

    cfg_f8 = bench_cfg(carve_mode="projective", batch=8)
    entries["fast_b8"] = lambda: check(
        "fast.integrate_frames B=8",
        lambda g, f: fast.integrate_frames(g, f, cfg_f8, INTR),
        grid_struct(cfg_f8), frame_struct(batch=8))

    entries["merged_b8"] = lambda: check(
        "merged.integrate_frames B=8",
        lambda g, f: merged.integrate_frames(g, f, cfg_f8, INTR),
        grid_struct(cfg_f8), frame_struct(batch=8))

    cfg_d = bench_cfg(carve_mode="decimated")
    entries["fast_decimated"] = lambda: check(
        "fast.integrate_frame (decimated carve)",
        lambda g, f: fast.integrate_frame(g, f, cfg_d, INTR),
        grid_struct(cfg_d), frame_struct())

    entries["merged"] = lambda: check(
        "merged.integrate_frame (projective carve)",
        lambda g, f: merged.integrate_frame(g, f, cfg_f, INTR),
        grid_struct(cfg_f), frame_struct())

    names = [only] if only else list(entries)
    ok = all(entries[n]() for n in names)
    int_ops._use_pallas = real_use_pallas
    print("ALL OK" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
