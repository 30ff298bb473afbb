"""ctypes bindings for the native host runtime kernels (hvs_native.cpp).

Builds the shared library on first import if g++ is available (``make -C
hvs_tpu/native``); every entry point has a pure-Python fallback so the
framework works without a compiler. Check :data:`NATIVE_AVAILABLE`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libhvs_native.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.letterbox_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 u8p, ctypes.c_int, ctypes.c_int]
    lib.letterbox_u8.restype = ctypes.c_double
    lib.greedy_nms.argtypes = [f32p, f32p, i32p, ctypes.c_int, ctypes.c_float,
                               ctypes.c_float, ctypes.c_int, ctypes.c_int, i32p]
    lib.greedy_nms.restype = ctypes.c_int
    lib.iou_matrix.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p]
    lib.iou_matrix.restype = None
    _lib = lib
    return lib


NATIVE_AVAILABLE = _load() is not None


def letterbox_u8_native(
    image: np.ndarray, size: int, pad_value: int = 114
) -> Optional[Tuple[np.ndarray, float, Tuple[int, int]]]:
    """Native letterbox; returns None if the library is unavailable.

    Same geometry contract as :func:`hvs_tpu.data.dataset.letterbox`.
    """
    lib = _load()
    if lib is None or image.dtype != np.uint8 or image.ndim != 3:
        return None
    image = np.ascontiguousarray(image)
    h, w, c = image.shape
    dst = np.empty((size, size, c), np.uint8)
    scale = lib.letterbox_u8(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size, pad_value,
    )
    nh, nw = int(round(h * scale)), int(round(w * scale))
    return dst, float(scale), ((size - nw) // 2, (size - nh) // 2)


def greedy_nms_native(
    boxes: np.ndarray, scores: np.ndarray, classes: np.ndarray,
    iou_threshold: float = 0.45, score_threshold: float = 0.25,
    max_out: int = 100, class_aware: bool = True,
) -> Optional[np.ndarray]:
    """Native exact greedy NMS; returns kept indices or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    classes = np.ascontiguousarray(classes, np.int32)
    keep = np.empty((max_out,), np.int32)
    n = lib.greedy_nms(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        classes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(scores), iou_threshold, score_threshold, max_out,
        1 if class_aware else 0,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return keep[:n].astype(np.int64)


def iou_matrix_native(a: np.ndarray, b: np.ndarray) -> Optional[np.ndarray]:
    """Native pairwise IoU [n,4]x[m,4]->[n,m]; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float32).reshape(-1, 4)
    b = np.ascontiguousarray(b, np.float32).reshape(-1, 4)
    out = np.empty((len(a), len(b)), np.float32)
    lib.iou_matrix(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(b),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
