"""PLY mesh export (binary little-endian), with optional C++ fast path.

Equivalent of voxblox's `outputMeshLayerAsPly` used by generateMesh
(kimera_semantics_rosbag.cpp:148; `mesh_filename` in
launch/kimera_semantics.launch:132). The native writer (native/src/ply.cpp)
is used when built; the numpy fallback produces identical bytes.
"""

from __future__ import annotations

import numpy as np

from ..native import loader as native_loader


def write_ply(path: str, vertices: np.ndarray, colors: np.ndarray,
              triangles: np.ndarray,
              normals: np.ndarray | None = None) -> None:
    vertices = np.ascontiguousarray(vertices, dtype=np.float32)
    colors = np.ascontiguousarray(colors, dtype=np.uint8)
    triangles = np.ascontiguousarray(triangles, dtype=np.int32)
    assert vertices.shape[0] == colors.shape[0]
    if normals is not None:
        normals = np.ascontiguousarray(normals, dtype=np.float32)
        assert normals.shape == vertices.shape

    lib = native_loader.get()
    if lib is not None:
        native_loader.write_ply(lib, path, vertices, colors, triangles,
                                normals)
        return

    with open(path, "wb") as f:
        f.write(ply_bytes(vertices, colors, triangles, normals))


def ply_bytes(vertices: np.ndarray, colors: np.ndarray,
              triangles: np.ndarray,
              normals: np.ndarray | None = None) -> bytes:
    """Encode the mesh as binary-little-endian PLY bytes (identical layout to
    write_ply; used by the live HTTP mesh streamer, server/viz.py)."""
    vertices = np.ascontiguousarray(vertices, dtype=np.float32)
    colors = np.ascontiguousarray(colors, dtype=np.uint8)
    triangles = np.ascontiguousarray(triangles, dtype=np.int32)
    nrm_props = ("property float nx\nproperty float ny\nproperty float nz\n"
                 if normals is not None else "")
    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {len(vertices)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"{nrm_props}"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        f"element face {len(triangles)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    ).encode("ascii")
    if normals is not None:
        vert_dtype = np.dtype([("xyz", np.float32, 3), ("nrm", np.float32, 3),
                               ("rgb", np.uint8, 3)])
    else:
        vert_dtype = np.dtype([("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
    vbuf = np.empty(len(vertices), dtype=vert_dtype)
    vbuf["xyz"] = vertices
    if normals is not None:
        vbuf["nrm"] = normals
    vbuf["rgb"] = colors
    face_dtype = np.dtype([("n", np.uint8), ("idx", np.int32, 3)])
    fbuf = np.empty(len(triangles), dtype=face_dtype)
    fbuf["n"] = 3
    fbuf["idx"] = triangles
    return header + vbuf.tobytes() + fbuf.tobytes()


def read_ply(path: str, with_normals: bool = False):
    """Minimal reader for the files write_ply produces (round-trip tests).

    Returns (vertices, colors, triangles) or, with `with_normals=True`,
    (vertices, colors, triangles, normals-or-None)."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii").splitlines()
    nv = nf = 0
    has_normals = any(line.strip() == "property float nx" for line in header)
    for line in header:
        if line.startswith("element vertex"):
            nv = int(line.split()[-1])
        elif line.startswith("element face"):
            nf = int(line.split()[-1])
    if has_normals:
        vert_dtype = np.dtype([("xyz", np.float32, 3), ("nrm", np.float32, 3),
                               ("rgb", np.uint8, 3)])
    else:
        vert_dtype = np.dtype([("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
    face_dtype = np.dtype([("n", np.uint8), ("idx", np.int32, 3)])
    vbuf = np.frombuffer(data, dtype=vert_dtype, count=nv, offset=end)
    fbuf = np.frombuffer(data, dtype=face_dtype, count=nf,
                         offset=end + nv * vert_dtype.itemsize)
    out = (vbuf["xyz"].copy(), vbuf["rgb"].copy(), fbuf["idx"].copy())
    if with_normals:
        return out + (vbuf["nrm"].copy() if has_normals else None,)
    return out
