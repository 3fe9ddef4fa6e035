"""Recompute golden-fixture pins (tests/test_golden.py GOLDEN dict).

Run on CPU:
  JAX_PLATFORMS=cpu JAX_COMPILATION_CACHE_DIR=~/.cache/jax_ksd_tests \
      python -u scripts/repin_golden.py
Prints one GOLDEN line per (cfg, method) plus the ESDF stats tuple.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_golden import BAG, CFGS, integrate  # noqa: E402

from kimera_semantics_tpu.core.color import LabelColorMap  # noqa: E402
from kimera_semantics_tpu.io.rosbag import RosbagDataset  # noqa: E402
from kimera_semantics_tpu.ops import esdf as esdf_ops  # noqa: E402
from kimera_semantics_tpu.ops import mesh as mesh_ops  # noqa: E402
from kimera_semantics_tpu.sim import eval as sim_eval  # noqa: E402
from kimera_semantics_tpu.sim import world as sim_world  # noqa: E402


def main():
    lm = LabelColorMap.random(21, seed=0)
    ds = RosbagDataset(BAG, label_map=lm,
                       depth_topic="/depth/image_raw",
                       semantic_topic="/semantic/image_raw",
                       cam_info_topic="/depth/camera_info")
    frames = [ds.frame(i) for i in range(len(ds))]
    world = sim_world.default_eval_world()
    for cfgname, cfg in CFGS.items():
        for method in ("fast", "merged", "projective"):
            g = integrate(cfg, method, frames, ds.intr)
            band = (cfg.tsdf.truncation_distance
                    if cfg.semantic.update_near_surface_only else None)
            errs = sim_eval.compare_to_world(g, cfg, world,
                                             surface_band=band)
            m = mesh_ops.extract_mesh(g, cfg, label_map=lm)
            me = sim_eval.mesh_surface_error(m.vertices, world)
            wsum_total = float(jnp.sum(g.wsum[:int(g.n_blocks)]))
            print(f'    ("{cfgname}", "{method}"): '
                  f"({int(g.n_blocks)}, {round(wsum_total, 0)}, "
                  f"{float(errs.rmse_tsdf):.4f}, "
                  f"{float(errs.label_accuracy):.3f}, "
                  f"{me['mean']:.4f}, {me['p95']:.4f}),"
                  f"  # overflow={int(g.overflow)} "
                  f"dropped={int(g.dropped_rays)}", flush=True)
            if cfgname == "default" and method == "fast":
                res = esdf_ops.compute_esdf(g, cfg, max_dist=2.0)
                vals = np.asarray(res.distance)[np.asarray(res.observed)]
                print(f"    # esdf: n={vals.size} mean={vals.mean():.4f} "
                      f"absmean={np.abs(vals).mean():.4f} "
                      f"negfrac={(vals < 0).mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
