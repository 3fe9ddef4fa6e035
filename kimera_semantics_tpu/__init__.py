"""kimera_semantics_tpu: TPU-native metric-semantic volumetric fusion.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
MIT-SPARK/Kimera-Semantics (+ its inherited Voxblox surface): depth + 2D
semantic-label streams ray-cast into a block-hashed TSDF grid with Bayesian
label fusion, marching-cubes semantic meshing, ESDF generation, simulation-world
evaluation, and spatial sharding across TPU device meshes.
"""

import jax as _jax

# Geometry (pose matmuls, backprojection) needs true float32: on TPU-class
# backends the DEFAULT matmul precision is bfloat16, which injects ~5e-3
# relative error — centimeters at mapping range. This framework is not a
# neural net; highest-precision matmul everywhere costs nothing (the hot path
# is elementwise/scatter, not MXU-bound).
_jax.config.update("jax_default_matmul_precision", "highest")

from .config import (ColorMode, FusionConfig, GridConfig, IntegratorType,
                     PipelineConfig, SemanticConfig, TsdfConfig)
from .core.camera import PinholeIntrinsics
from .core.color import LabelColorMap
from .grid import blocks
from .grid.blocks import VoxelGrid, create
from .models.common import Frame, frame_from_images

__version__ = "0.1.0"


def __getattr__(name):
    # Heavy / IO-facing surfaces load lazily so `import kimera_semantics_tpu`
    # stays light: SemanticTsdfServer, ServerConfig, datasets, mesh/esdf ops.
    lazy = {
        "SemanticTsdfServer": ("server.pipeline", "SemanticTsdfServer"),
        "ServerConfig": ("server.pipeline", "ServerConfig"),
        "RosbagDataset": ("io.rosbag", "RosbagDataset"),
        "DirectoryDataset": ("io.dataset", "DirectoryDataset"),
        "SyntheticDataset": ("io.dataset", "SyntheticDataset"),
        "extract_mesh": ("ops.mesh", "extract_mesh"),
        "compute_esdf": ("ops.esdf", "compute_esdf"),
    }
    if name in lazy:
        import importlib
        mod, attr = lazy[name]
        return getattr(importlib.import_module(f".{mod}", __name__), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
