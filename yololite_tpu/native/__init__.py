"""ctypes bindings for the native host kernels (kernels.cpp).

Compiled lazily with g++ -O3 -shared -fPIC into a cached .so next to the
source; every entry point has a pure-numpy fallback so the package works
without a toolchain. See kernels.cpp for the rationale (first-party
replacements for the reference's torchvision-NMS / pycocotools C code).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kernels.cpp")
_LIB_PATH = os.path.join(_HERE, "_yl_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    try:
        if (os.path.exists(_LIB_PATH)
                and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
            return _LIB_PATH
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               _SRC, "-o", _LIB_PATH + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        return _LIB_PATH
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.yl_nms.restype = ctypes.c_int
            lib.yl_nms.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int)]
            lib.yl_box_iou.restype = None
            lib.yl_box_iou.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float)]
            lib.yl_coco_match.restype = None
            lib.yl_coco_match.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8)]
            lib.yl_pack_s2d.restype = None
            lib.yl_pack_s2d.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def nms_native(boxes: np.ndarray, scores: np.ndarray,
               iou_th: float) -> Optional[np.ndarray]:
    """Greedy NMS; returns kept indices (score-desc) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(boxes)
    keep = np.empty(n, np.int32)
    kept = lib.yl_nms(_fptr(boxes, ctypes.c_float), _fptr(scores, ctypes.c_float),
                      n, float(iou_th), _fptr(keep, ctypes.c_int))
    return keep[:kept].astype(np.int64)


def coco_match_native(ious: np.ndarray, gt_ignore: np.ndarray,
                      thrs: np.ndarray):
    """COCOeval greedy matcher; returns (dtm [T,D] int32, dt_ig [T,D] bool)
    or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    D, G = ious.shape
    T = len(thrs)
    ious = np.ascontiguousarray(ious, np.float64)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.uint8)
    thrs = np.ascontiguousarray(thrs, np.float64)
    dtm = np.zeros((T, D), np.int32)
    dt_ig = np.zeros((T, D), np.uint8)
    lib.yl_coco_match(_fptr(ious, ctypes.c_double), _fptr(gt_ignore, ctypes.c_uint8),
                      D, G, _fptr(thrs, ctypes.c_double), T,
                      _fptr(dtm, ctypes.c_int32), _fptr(dt_ig, ctypes.c_uint8))
    return dtm, dt_ig.astype(bool)


def pack_s2d_native(images: np.ndarray) -> Optional[np.ndarray]:
    """Space-to-depth 2x2 uint8 pack [B,H,W,C] -> [B,H/2,W/2,4C]
    ((di,dj)-major phases, matching deploy/s2d.pack_s2d) or None if the
    native lib is unavailable."""
    lib = get_lib()
    if lib is None or images.dtype != np.uint8:
        return None
    images = np.ascontiguousarray(images)
    b, h, w, c = images.shape
    out = np.empty((b, h // 2, w // 2, 4 * c), np.uint8)
    lib.yl_pack_s2d(_fptr(images, ctypes.c_uint8), b, h, w, c,
                    _fptr(out, ctypes.c_uint8))
    return out
