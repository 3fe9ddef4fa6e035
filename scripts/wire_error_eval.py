"""r5: measured accuracy impact of the u16 wire-atlas quantization.

Integrates the sim-eval sequence twice with the single-device projective
integrator — raw f32 atlases vs wire-roundtripped atlases (wire_sim=True,
exactly what every shard consumes under the sharded u16 protocol) — and
reports the grid-level deltas plus GT errors for both. The wire's depth
quantization is ~0.09 mm in the geometry range / ~17 mm in the
weight-only far range (ops/mip.py); this run turns those bounds into
end-to-end evidence.

Run: JAX_PLATFORMS=cpu python -u scripts/wire_error_eval.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_tests"))
import jax
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import numpy as np
import jax.numpy as jnp

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         SemanticConfig, TsdfConfig,
                                         PipelineConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import projective


def main():
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.1, voxels_per_side=16,
                        block_capacity=1024),
        tsdf=TsdfConfig(truncation_distance=0.2, max_ray_length_m=5.0),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(max_rays=8192, dedup_table_size=1 << 16,
                                block_budget=256, use_pallas=False))
    intr = PinholeIntrinsics(fx=160.0, fy=160.0, cx=159.5, cy=119.5,
                             width=320, height=240)
    lmap = LabelColorMap.random(cfg.grid.num_labels)
    ds = SyntheticDataset(num_frames=10, intr=intr, label_map=lmap)
    frames = [ds.frame(i) for i in range(10)]

    grids = {}
    for wire_sim in (False, True):
        g = blocks.create(cfg)
        for f in frames:
            g = projective.integrate_frame(g, f, cfg, intr,
                                           wire_sim=wire_sim)
        jax.block_until_ready(g.wsum)
        grids[wire_sim] = g

    ga, gb = grids[False], grids[True]
    assert int(ga.n_blocks) == int(gb.n_blocks)
    coords = np.asarray(ga.block_coords)[:int(ga.n_blocks)]
    sa = np.asarray(blocks.lookup_slots(ga, jnp.asarray(coords), cfg.grid))
    sb = np.asarray(blocks.lookup_slots(gb, jnp.asarray(coords), cfg.grid))
    trunc = cfg.tsdf.truncation_distance
    da = np.asarray(blocks.tsdf_distance(ga, trunc))[sa]
    db = np.asarray(blocks.tsdf_distance(gb, trunc))[sb]
    wa = np.asarray(ga.wsum)[sa]
    wb = np.asarray(gb.wsum)[sb]
    obs = (wa > 1e-6) & (wb > 1e-6)
    la = np.asarray(blocks.mle_labels(ga))[sa]
    lb = np.asarray(blocks.mle_labels(gb))[sb]
    out = {
        "blocks": int(ga.n_blocks),
        "observed_voxels": int(obs.sum()),
        "tsdf_abs_diff_max_m": float(np.max(np.abs(da - db)[obs])),
        "tsdf_abs_diff_mean_m": float(np.mean(np.abs(da - db)[obs])),
        "weight_rel_diff_max": float(np.max(
            np.abs(wa - wb)[obs] / np.maximum(wa[obs], 1e-9))),
        "label_disagreement_frac": float(np.mean(la[obs] != lb[obs])),
        "note": ("single-device projective, raw f32 atlas vs "
                 "wire_sim=True (the sharded u16 protocol's exact data); "
                 "voxel 0.1 m"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
