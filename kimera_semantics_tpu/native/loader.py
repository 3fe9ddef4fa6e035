"""ctypes loader for the native runtime library (auto-builds on first use).

The compute path is JAX/XLA/Pallas; host-side I/O (PLY export, layer
serialization) runs in C++ like the reference's runtime (which is all C++).
Falls back to numpy implementations when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libksd_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def get():
    """Return the loaded library, building it if needed; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # (Re)build when the .so is missing or older than any source. A
        # missing/empty src tree with a prebuilt .so is fine (ships built).
        try:
            src_dir = os.path.join(_DIR, "src")
            srcs = [os.path.join(src_dir, f) for f in os.listdir(src_dir)] \
                if os.path.isdir(src_dir) else []
            stale = (not os.path.exists(_SO) or
                     (srcs and os.path.getmtime(_SO) <
                      max(map(os.path.getmtime, srcs))))
        except OSError:
            stale = not os.path.exists(_SO)
        if stale:
            try:
                subprocess.run(["make", "-B", "-C", _DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                if not os.path.exists(_SO):
                    return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        # A stale prebuilt .so that survived a failed rebuild may lack newer
        # symbols — treat that as "no native lib" (numpy fallback), not a
        # crash at first use.
        try:
            _bind(lib)
        except AttributeError:
            return None
        _lib = lib
        return _lib


def _bind(lib):
    """Declare ctypes signatures; raises AttributeError on missing symbols."""
    lib.ksd_write_ply.restype = ctypes.c_int
    lib.ksd_write_ply.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.ksd_write_ply_normals.restype = ctypes.c_int
    lib.ksd_write_ply_normals.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.ksd_serializer_open_write.restype = ctypes.c_int
    lib.ksd_serializer_open_write.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.POINTER(ctypes.c_void_p)]
    lib.ksd_serializer_write_array.restype = ctypes.c_int
    lib.ksd_serializer_write_array.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_void_p, ctypes.c_int64]
    lib.ksd_serializer_close.restype = ctypes.c_int
    lib.ksd_serializer_close.argtypes = [ctypes.c_void_p]


def write_ply(lib, path: str, vertices: np.ndarray, colors: np.ndarray,
              triangles: np.ndarray, normals: np.ndarray = None) -> None:
    if normals is not None:
        rc = lib.ksd_write_ply_normals(
            path.encode(),
            vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            normals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            colors.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(vertices),
            triangles.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(triangles))
    else:
        rc = lib.ksd_write_ply(
            path.encode(),
            vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            colors.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(vertices),
            triangles.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(triangles))
    if rc != 0:
        raise IOError(f"native PLY write failed with code {rc} for {path}")


_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.int32): 1,
                np.dtype(np.uint8): 2, np.dtype(np.bool_): 3}
DTYPE_BY_CODE = {v: k for k, v in _DTYPE_CODES.items()}


def write_container(lib, path: str, arrays: dict) -> None:
    """Write named arrays via the native serializer."""
    handle = ctypes.c_void_p()
    rc = lib.ksd_serializer_open_write(path.encode(), len(arrays),
                                       ctypes.byref(handle))
    if rc != 0:
        raise IOError(f"serializer open failed: {rc}")
    try:
        for name, arr in arrays.items():
            arr = np.ascontiguousarray(arr)
            code = _DTYPE_CODES[arr.dtype]
            dims = (ctypes.c_int64 * arr.ndim)(*arr.shape)
            rc = lib.ksd_serializer_write_array(
                handle, name.encode(), code, arr.ndim, dims,
                arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes)
            if rc != 0:
                raise IOError(f"serializer write failed for {name}: {rc}")
    finally:
        lib.ksd_serializer_close(handle)
