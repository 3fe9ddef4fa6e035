import sys; sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
"""TPU smoke check for the with_color projective kernel branch (Mosaic
compile + finite wcolor after integration) — the color epilogue is the one
path the default bench never compiles (bench color_mode=semantic)."""
import jax
from kimera_semantics_tpu.config import (ColorMode, FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import projective as proj
import numpy as np

cfg = FusionConfig(
    grid=GridConfig(voxel_size=0.05, voxels_per_side=16, block_capacity=4096),
    tsdf=TsdfConfig(truncation_distance=0.1, max_ray_length_m=5.0),
    semantic=SemanticConfig(color_mode=ColorMode.COLOR),
    pipeline=PipelineConfig())
intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                         width=640, height=480)
ds = SyntheticDataset(num_frames=3, intr=intr, label_map=LabelColorMap.random())
grid = blocks.create(cfg)
for i in range(3):
    grid = proj.integrate_frame(grid, ds.frame(i), cfg, intr)
jax.block_until_ready(grid.wcolor)
wc = np.asarray(grid.wcolor)
assert np.isfinite(wc).all(), "NaN/Inf in wcolor!"
assert (wc != 0).any(), "no color accumulated"
print("with_color Mosaic path OK: finite wcolor, nonzero entries:",
      int((wc != 0).sum()))
