"""ctypes bindings for the native host ops (csrc/host_ops.cpp).

Builds the shared library on first use (g++, cached next to the source)
and falls back to numpy implementations when no compiler is available —
mirroring the reference's lazy JIT-build op loader
(reference: paddle3d/ops/__init__.py:139-193) without the import-hook
machinery.
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["host_hard_voxelize", "host_points_in_boxes", "native_available"]

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "libhost_ops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.join(_CSRC, "host_ops.cpp")
        try:
            if (not os.path.exists(_SO) or
                    os.path.getmtime(_SO) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.hard_voxelize_host.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def host_hard_voxelize(points: np.ndarray, voxel_size, point_cloud_range,
                       max_points: int, max_voxels: int):
    """CPU hard voxelization (deploy-preprocessing parity with the
    on-device ops.hard_voxelize). Returns (voxels, coords, num_points, n)."""
    points = np.ascontiguousarray(points, np.float32)
    n, c = points.shape
    voxels = np.zeros((max_voxels, max_points, c), np.float32)
    coords = np.full((max_voxels, 3), -1, np.int32)
    npts = np.zeros((max_voxels,), np.int32)
    lib = _load()
    if lib is not None:
        vs = np.asarray(voxel_size, np.float32)
        pr = np.asarray(point_cloud_range, np.float32)
        nv = lib.hard_voxelize_host(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, c,
            vs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_points, max_voxels,
            voxels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            npts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return voxels, coords, npts, int(nv)

    # numpy fallback (same semantics, slower)
    vs = np.asarray(voxel_size, np.float32)
    lo = np.asarray(point_cloud_range[:3], np.float32)
    hi = np.asarray(point_cloud_range[3:], np.float32)
    grid = np.round((hi - lo) / vs).astype(int)
    table = {}
    nv = 0
    for p in points:
        if not np.all(np.isfinite(p[:3])):
            continue
        cidx = np.floor((p[:3] - lo) / vs).astype(int)
        if np.any(cidx < 0) or np.any(cidx >= grid):
            continue
        key = (int(cidx[2]), int(cidx[1]), int(cidx[0]))
        if key not in table:
            if nv >= max_voxels:
                continue
            table[key] = nv
            coords[nv] = key
            nv += 1
        v = table[key]
        if npts[v] < max_points:
            voxels[v, npts[v]] = p
            npts[v] += 1
    return voxels, coords, npts, nv


def host_points_in_boxes(points: np.ndarray,
                         boxes: np.ndarray) -> np.ndarray:
    """[N,>=3] x [M,7] (bottom-z boxes) -> [N,M] bool."""
    points = np.ascontiguousarray(points, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    n = points.shape[0]
    m = boxes.shape[0]
    lib = _load()
    if lib is not None and n and m:
        out = np.zeros((n, m), np.uint8)
        lib.points_in_boxes_host(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            points.shape[1],
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.astype(bool)

    # numpy fallback
    if n == 0 or m == 0:
        return np.zeros((n, m), bool)
    dx = points[:, None, 0] - boxes[None, :, 0]
    dy = points[:, None, 1] - boxes[None, :, 1]
    dz = points[:, None, 2] - boxes[None, :, 2]
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    lx = c[None] * dx + s[None] * dy
    ly = -s[None] * dx + c[None] * dy
    return ((np.abs(lx) <= boxes[None, :, 3] / 2) &
            (np.abs(ly) <= boxes[None, :, 4] / 2) &
            (dz >= 0) & (dz <= boxes[None, :, 5]))
