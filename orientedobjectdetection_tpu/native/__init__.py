"""Native (C++) host-side geometry core, loaded via ctypes.

The reference's host/device rotated NMS + IoU come from mmcv's native
kernels; the TPU in-graph path here is Pallas/jnp (``ops/iou.py``,
``ops/nms.py``), and this package is the native equivalent for HOST call
sites (DOTA ``merge_det``, numpy-side NMS). The shared library is built
lazily with g++ on first use and cached next to the source; every consumer
falls back to the jnp path when no compiler is available, so the package
stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'rnms.cpp')
_LIB_PATH = os.path.join(_DIR, '_rnms.so')
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> bool:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
           '-o', _LIB_PATH + '.tmp', _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return False
    os.replace(_LIB_PATH + '.tmp', _LIB_PATH)  # atomic for racing builders
    return True


def _load():
    """Return the ctypes lib (building it if needed) or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED and not os.path.exists(_LIB_PATH):
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        _TRIED = True
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i64 = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
        i64p = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
        lib.oodt_rbox_iou.argtypes = [f32p, i64, f32p, i64, ctypes.c_int,
                                      f32p]
        lib.oodt_rbox_iou.restype = None
        lib.oodt_rnms_rotated.argtypes = [f32p, f32p, i64, ctypes.c_float,
                                          i64p]
        lib.oodt_rnms_rotated.restype = i64
        lib.oodt_nms_hbb.argtypes = [f32p, f32p, i64, ctypes.c_float, i64p]
        lib.oodt_nms_hbb.restype = i64
        _LIB = lib
        return _LIB


def available() -> bool:
    """True if the native library is loadable (building it on demand)."""
    return _load() is not None


def rbox_iou(boxes1, boxes2, mode: str = 'iou') -> np.ndarray:
    """Pairwise rotated IoU/IoF matrix on the host: (N, 5) x (M, 5) ->
    (N, M) float32. Raises RuntimeError if the native lib is unavailable
    (callers gate on :func:`available`)."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native rnms library unavailable')
    b1 = np.ascontiguousarray(boxes1, np.float32).reshape(-1, 5)
    b2 = np.ascontiguousarray(boxes2, np.float32).reshape(-1, 5)
    out = np.empty((b1.shape[0], b2.shape[0]), np.float32)
    lib.oodt_rbox_iou(b1, b1.shape[0], b2, b2.shape[0],
                      int(mode == 'iof'), out.reshape(-1))
    return out


def nms_rotated(boxes, scores, iou_thr: float) -> np.ndarray:
    """Greedy rotated NMS on the host. Returns survivor indices in
    descending-score order (int64), matching ``ops/nms.py:nms_rotated_np``."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native rnms library unavailable')
    b = np.ascontiguousarray(boxes, np.float32).reshape(-1, 5)
    s = np.ascontiguousarray(scores, np.float32).reshape(-1)
    keep = np.empty((b.shape[0],), np.int64)
    k = lib.oodt_rnms_rotated(b, s, b.shape[0], float(iou_thr), keep)
    return keep[:k]


def nms_hbb(boxes, scores, iou_thr: float) -> np.ndarray:
    """Greedy axis-aligned NMS on the host over (x1, y1, x2, y2) boxes."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native rnms library unavailable')
    b = np.ascontiguousarray(boxes, np.float32).reshape(-1, 4)
    s = np.ascontiguousarray(scores, np.float32).reshape(-1)
    keep = np.empty((b.shape[0],), np.int64)
    k = lib.oodt_nms_hbb(b, s, b.shape[0], float(iou_thr), keep)
    return keep[:k]
