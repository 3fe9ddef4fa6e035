#!/usr/bin/env python
"""Batch evaluation sweep — equivalent of
kimera_semantics_ros/scripts/kimera_semantics_eval.bash (SURVEY 2a "Launch/
config assets"): runs the reconstruction across configurations (gt vs
perturbed poses, with/without dynamic-label masking, fast vs merged), saving
mesh.ply + map checkpoints + a metrics JSON per run.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(out_dir, method, dynamic_mask, pose_noise, num_frames, seed=0):
    import numpy as np
    import jax.numpy as jnp
    from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                             IntegratorType, PipelineConfig,
                                             SemanticConfig, TsdfConfig)
    from kimera_semantics_tpu.core.camera import PinholeIntrinsics
    from kimera_semantics_tpu.core.color import LabelColorMap
    from kimera_semantics_tpu.core import transforms
    from kimera_semantics_tpu.io.dataset import SyntheticDataset
    from kimera_semantics_tpu.models.common import Frame
    from kimera_semantics_tpu.server.pipeline import (SemanticTsdfServer,
                                                      ServerConfig)
    from kimera_semantics_tpu.sim import eval as sim_eval

    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.1, voxels_per_side=8, block_capacity=8192),
        tsdf=TsdfConfig(truncation_distance=0.3, max_ray_length_m=8.0),
        semantic=SemanticConfig(dynamic_labels=(20,) if dynamic_mask else ()),
        pipeline=PipelineConfig(max_rays=16384, dedup_table_size=1 << 16),
        integrator=IntegratorType(method),
    )
    intr = PinholeIntrinsics(fx=120.0, fy=120.0, cx=119.5, cy=89.5,
                             width=240, height=180)
    lmap = LabelColorMap.random(cfg.grid.num_labels)
    ds = SyntheticDataset(num_frames=num_frames, intr=intr, label_map=lmap)
    srv = SemanticTsdfServer(cfg, intr, lmap)
    rng = np.random.RandomState(seed)
    for i in range(num_frames):
        frame = ds.frame(i)
        if pose_noise > 0:
            q = np.concatenate([rng.randn(3) * pose_noise * 0.2, [1.0]])
            t = rng.randn(3) * pose_noise
            T = transforms.compose(frame.T_G_C, transforms.from_quat_trans(
                jnp.asarray(q, dtype=jnp.float32), jnp.asarray(t, dtype=jnp.float32)))
            frame = dataclasses.replace(frame, T_G_C=T)
        srv.insert_frame(frame)

    os.makedirs(out_dir, exist_ok=True)
    mesh = srv.generate_mesh(os.path.join(out_dir, "mesh.ply"))
    srv.save_map(os.path.join(out_dir, "map.ksdv"))
    errs = sim_eval.compare_to_world(srv.grid, cfg, ds.world,
                                     surface_band=cfg.tsdf.truncation_distance)
    mesh_err = sim_eval.mesh_surface_error(mesh.vertices, ds.world)
    metrics = {"method": method, "dynamic_mask": dynamic_mask,
               "pose_noise": pose_noise, "rmse_tsdf": errs.rmse_tsdf,
               "label_accuracy": errs.label_accuracy, "mesh_error": mesh_err,
               "triangles": mesh.num_triangles, **srv.stats()}
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="eval_out")
    ap.add_argument("--num-frames", type=int, default=20)
    ap.add_argument("--methods", nargs="*", default=["fast", "merged"])
    args = ap.parse_args()
    results = []
    for method in args.methods:
        for dyn in (True, False):
            for noise in (0.0, 0.02):
                name = f"{method}_{'dyn' if dyn else 'nodyn'}_noise{noise}"
                print(f"== {name}", file=sys.stderr)
                results.append(run_one(os.path.join(args.out, name), method,
                                       dyn, noise, args.num_frames))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
