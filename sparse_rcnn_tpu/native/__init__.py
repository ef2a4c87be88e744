"""ctypes bindings for the C++ host core (auto-built on first use).

Falls back gracefully (``available() == False``) when no compiler exists;
the pure-device path in :mod:`sparse_rcnn_tpu.ops` is always available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsparse_host.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "libsparse_host.so"],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.voxelize_scene.argtypes = [
        f32p, f32p, u8p, ctypes.c_int64, ctypes.c_int64, f32p,
        ctypes.c_int64, i32p, f32p, i32p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.subm_rulebook.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def voxelize_scene(
    points: np.ndarray, feats: np.ndarray, valid: np.ndarray,
    voxel_size, capacity: int,
) -> Tuple[np.ndarray, np.ndarray, int, np.ndarray, int]:
    """Host twin of ops.voxelize.voxelize_scene (same output contract)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n, c = feats.shape
    points = np.ascontiguousarray(points, np.float32)
    feats = np.ascontiguousarray(feats, np.float32)
    valid = np.ascontiguousarray(valid, np.uint8)
    vs = np.ascontiguousarray(
        np.broadcast_to(np.asarray(voxel_size, np.float32), (3,)).copy()
    )
    out_coords = np.empty((capacity, 3), np.int32)
    out_feats = np.empty((capacity, c), np.float32)
    out_p2v = np.empty((n,), np.int32)
    nv = ctypes.c_int32()
    ovf = ctypes.c_int32()
    lib.voxelize_scene(points, feats, valid, n, c, vs, capacity,
                       out_coords, out_feats, out_p2v,
                       ctypes.byref(nv), ctypes.byref(ovf))
    return out_coords, out_feats, int(nv.value), out_p2v, int(ovf.value)


def subm_rulebook(coords: np.ndarray, n_valid: int, kernel: int) -> np.ndarray:
    """Host twin of ops.rulebook.submanifold_rulebook."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    coords = np.ascontiguousarray(coords, np.int32)
    m = len(coords)
    out = np.empty((kernel ** 3, m), np.int32)
    lib.subm_rulebook(coords, m, n_valid, kernel, out)
    return out
