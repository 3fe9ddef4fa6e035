"""VoxelGrid checkpoint save/load — the saveMap/loadMap equivalent.

Reference behavior: TSDF (+ESDF) layers serialize to `.vxblx` protobuf
(kimera_semantics_rosbag.cpp:150,166), loaded with kReplace merge semantics
(semantic_simulation_server.cpp:57-89). The reference never serializes the
semantic layer (gap noted in SURVEY 5.4); here *all* channels round-trip.

Format: the native versioned container (native/src/serializer.cpp) when the
C++ library is available, with a pure-numpy reader/writer producing the same
bytes otherwise.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np
import jax.numpy as jnp

from ..config import FusionConfig
from ..grid import blocks as gblocks
from ..grid.blocks import VoxelGrid
from ..native import loader as native_loader

_MAGIC = b"KSDV"
_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.int32): 1,
                np.dtype(np.uint8): 2, np.dtype(np.bool_): 3}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}

_FIELDS = ["table_keys", "table_slots", "block_coords", "n_blocks", "overflow",
           "dropped_rays",
           "wsum", "wsdf", "wcolor", "sem_count", "sem_delta", "updated",
           "start_set", "observed_set", "frame_counter"]

# Fields that older checkpoints may not carry (additive counters); load_grid
# falls back to the freshly-created default (zero) when absent.
_OPTIONAL_FIELDS = {"dropped_rays"}


def _grid_arrays(grid: VoxelGrid) -> dict:
    out = {}
    for name in _FIELDS:
        arr = np.asarray(getattr(grid, name))
        if arr.dtype == np.int64:
            arr = arr.astype(np.int32)
        out[name] = arr
    return out


def save_grid(path: str, grid: VoxelGrid) -> None:
    arrays = _grid_arrays(grid)
    lib = native_loader.get()
    if lib is not None:
        native_loader.write_container(lib, path, arrays)
        return
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<II", 1, len(arrays)))
        for name, arr in arrays.items():
            arr = np.ascontiguousarray(arr)
            nb = name.encode()
            f.write(struct.pack("<I", len(nb)))
            f.write(nb)
            f.write(struct.pack("<II", _DTYPE_CODES[arr.dtype], arr.ndim))
            f.write(struct.pack(f"<{arr.ndim}q", *arr.shape))
            f.write(arr.tobytes())


def load_arrays(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC:
        raise IOError(f"{path}: not a KSDV container")
    version, count = struct.unpack_from("<II", data, 4)
    if version != 1:
        raise IOError(f"{path}: unsupported version {version}")
    off = 12
    out = {}
    for _ in range(count):
        (nlen,) = struct.unpack_from("<I", data, off); off += 4
        name = data[off:off + nlen].decode(); off += nlen
        code, ndim = struct.unpack_from("<II", data, off); off += 8
        dims = struct.unpack_from(f"<{ndim}q", data, off); off += 8 * ndim
        dtype = _CODE_DTYPES[code]
        nbytes = int(np.prod(dims)) * dtype.itemsize if ndim else dtype.itemsize
        arr = np.frombuffer(data, dtype=dtype, count=max(int(np.prod(dims)), 1),
                            offset=off).reshape(dims)
        off += nbytes
        out[name] = arr.copy()
    return out


def load_grid(path: str, cfg: FusionConfig) -> VoxelGrid:
    """Load a checkpoint (kReplace merge semantics: the file's state replaces
    the in-memory layer, matching vxb::io::LoadBlocksFromFile kReplace)."""
    arrays = load_arrays(path)
    ref = gblocks.create(cfg)
    kwargs = {}
    for name in _FIELDS:
        if name not in arrays and name in _OPTIONAL_FIELDS:
            kwargs[name] = getattr(ref, name)
            continue
        arr = arrays[name]
        ref_val = getattr(ref, name)
        ref_shape = tuple(np.asarray(ref_val).shape)
        if int(arr.size) != int(np.prod(ref_shape, dtype=np.int64)):
            raise ValueError(
                f"{path}: field {name} shape {arr.shape} does not match config "
                f"shape {ref_shape}")
        # ascontiguousarray promotes 0-d scalars to (1,) at write time;
        # restore the config-defined shape.
        arr = arr.reshape(ref_shape)
        kwargs[name] = jnp.asarray(arr.astype(np.asarray(ref_val).dtype))
    return VoxelGrid(**kwargs)
