#!/usr/bin/env python
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
import numpy as np
import jax
import jax.numpy as jnp

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.ops import mip as mip_ops
from kimera_semantics_tpu.ops import pallas_kernels as pk

cfg = FusionConfig(
    grid=GridConfig(voxel_size=0.05, voxels_per_side=16, block_capacity=4096),
    tsdf=TsdfConfig(), semantic=SemanticConfig(),
    pipeline=PipelineConfig())
intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                         width=640, height=480)
plan = mip_ops.make_plan(480, 640, 128, 256)
rng = np.random.RandomState(0)
K = 64
meta = np.zeros((K, 8), np.int32)
meta[:, 0] = rng.randint(0, (plan.atlas_height - 128) // 8, K) * 8
meta[:, 1] = rng.randint(0, (plan.atlas_width - 256) // 128, K) * 128
meta[:, 2] = 1
meta[:, 3] = rng.randint(0, plan.num_levels, K)
meta[:, 4] = meta[:, 1] - np.array(plan.offsets)[meta[:, 3]]
meta[:, 5:8] = rng.randint(-10, 10, (K, 3))
tflat = jnp.zeros((1, 128), jnp.float32).at[0, :12].set(
    jnp.eye(3, 4).reshape(-1))
atlas = jnp.asarray(rng.uniform(0.2, 5.0, (4, plan.atlas_height,
                                           plan.atlas_width)).astype(np.float32))
out = pk.projective_sample_update(jnp.asarray(meta), tflat, atlas, cfg, intr,
                                  plan, with_color=False)
jax.block_until_ready(out)
print("OK", [o.shape for o in out])
