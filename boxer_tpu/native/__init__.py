"""ctypes bindings for the native runtime components (libboxer_native.so).

Built with `make -C boxer_tpu/native`. Python callers transparently fall
back to the numpy implementations when the library is absent.
"""

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "libboxer_native.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.points_to_voxel.restype = ctypes.c_int
        lib.points_to_voxel.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.box_collision_test.restype = None
        lib.mask_to_rle_counts.restype = ctypes.c_int64
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def ensure_built() -> bool:
    """Build the library if the toolchain is present; returns availability."""
    if available():
        return True
    import subprocess

    try:
        subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                       check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return available()


def _cptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def points_to_voxel_native(
    points: np.ndarray, voxel_size, pc_range, max_points: int = 35,
    reverse: bool = True, max_voxels: int = 20000,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native points_to_voxel; same contract as
    `boxer_tpu.dataset.processor.voxelizer.points_to_voxel`.
    Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    vs = np.ascontiguousarray(voxel_size, np.float32)
    rng = np.ascontiguousarray(pc_range, np.float32)
    n, f = points.shape

    voxels = np.zeros((max_voxels, max_points, f), np.float32)
    coords = np.zeros((max_voxels, 3), np.int32)
    num_points = np.zeros((max_voxels,), np.int32)
    nv = lib.points_to_voxel(
        _cptr(points, ctypes.c_float), n, f,
        _cptr(vs, ctypes.c_float), _cptr(rng, ctypes.c_float),
        max_points, max_voxels, int(reverse),
        _cptr(voxels, ctypes.c_float), _cptr(coords, ctypes.c_int32),
        _cptr(num_points, ctypes.c_int32))
    return voxels[:nv], coords[:nv], num_points[:nv]


def box_collision_test_native(boxes: np.ndarray,
                              qboxes: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    qboxes = np.ascontiguousarray(qboxes, np.float32)
    n, d = boxes.shape
    m = qboxes.shape[0]
    out = np.zeros((n, m), np.uint8)
    lib.box_collision_test(
        _cptr(boxes, ctypes.c_float), n, d,
        _cptr(qboxes, ctypes.c_float), m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool)


def mask_to_rle_counts_native(mask: np.ndarray) -> Optional[list]:
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    counts = np.zeros((h * w + 1,), np.uint32)
    n = lib.mask_to_rle_counts(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return counts[:n].tolist()
