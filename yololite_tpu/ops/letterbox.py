"""Letterbox preprocessing geometry + host-side image ops.

Parity targets:
  - training/val letterbox = Albumentations LongestMaxSize + PadIfNeeded(value=114)
    centered (scripts/data/augment.py:87-95, :153-171):
        scale = img_size / max(h, w); resized then centered pad with 114.
  - inference letterbox (tools/infer.py:121-131, tools/infer_onnx.py:24-47):
        scale = min(s/h, s/w); pad_x = (s - w*scale)/2 (top-left int floor).
  - back-mapping boxes through pad/scale to original pixels
    (tools/infer.py:507-516, tools/infer_onnx.py:214-231).
  - ImageNet normalization mean/std (augment.py Normalize).

The image resize/pad runs on host (numpy/cv2) as part of the input pipeline; the
normalize step runs on device inside the jitted graph so HBM receives uint8.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:  # cv2 is present in this image; degrade to PIL if not.
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)
PAD_VALUE = 114


def letterbox_params(h: int, w: int, img_size: int) -> Tuple[float, int, int]:
    """Return (scale, pad_x, pad_y) for mapping an (h, w) image into a centered
    img_size x img_size letterboxed canvas. scale = min(s/h, s/w); int pads."""
    scale = min(img_size / float(h), img_size / float(w))
    nw, nh = int(round(w * scale)), int(round(h * scale))
    pad_x = (img_size - nw) // 2
    pad_y = (img_size - nh) // 2
    return scale, pad_x, pad_y


def letterbox_image(img: np.ndarray, img_size: int, pad_value: int = PAD_VALUE):
    """Resize-keep-aspect + centered pad. Returns (canvas uint8 [S,S,3], scale, pad_x, pad_y)."""
    h, w = img.shape[:2]
    scale, pad_x, pad_y = letterbox_params(h, w, img_size)
    nw, nh = int(round(w * scale)), int(round(h * scale))
    if _HAS_CV2:
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    else:  # pragma: no cover
        from PIL import Image
        resized = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
    canvas = np.full((img_size, img_size, img.shape[2] if img.ndim == 3 else 1),
                     pad_value, dtype=img.dtype)
    canvas[pad_y:pad_y + nh, pad_x:pad_x + nw] = resized
    return canvas, scale, pad_x, pad_y


def resize_image(img: np.ndarray, img_size: int):
    """Plain square resize (the --use_resize path). Returns (img, sx, sy)."""
    h, w = img.shape[:2]
    if _HAS_CV2:
        out = cv2.resize(img, (img_size, img_size), interpolation=cv2.INTER_LINEAR)
    else:  # pragma: no cover
        from PIL import Image
        out = np.asarray(Image.fromarray(img).resize((img_size, img_size), Image.BILINEAR))
    return out, img_size / float(w), img_size / float(h)


def forward_boxes(boxes_xyxy: np.ndarray, scale: float, pad_x: int, pad_y: int) -> np.ndarray:
    """Map original-image xyxy boxes into letterboxed canvas coords."""
    b = boxes_xyxy.astype(np.float32).copy()
    b[..., [0, 2]] = b[..., [0, 2]] * scale + pad_x
    b[..., [1, 3]] = b[..., [1, 3]] * scale + pad_y
    return b


def unletterbox_boxes(boxes_xyxy: np.ndarray, scale, pad_x: float, pad_y: float,
                      orig_w: int, orig_h: int) -> np.ndarray:
    """Map letterboxed-canvas boxes back to original pixels and clip
    (parity with tools/infer.py:507-516).

    `scale` may be a single float (letterbox: uniform) or an (sx, sy) pair
    (plain-resize path on non-square inputs)."""
    sx, sy = (scale if isinstance(scale, (tuple, list)) else (scale, scale))
    b = np.asarray(boxes_xyxy, dtype=np.float32).copy()
    b[..., [0, 2]] = (b[..., [0, 2]] - pad_x) / max(sx, 1e-12)
    b[..., [1, 3]] = (b[..., [1, 3]] - pad_y) / max(sy, 1e-12)
    b[..., [0, 2]] = b[..., [0, 2]].clip(0, orig_w - 1)
    b[..., [1, 3]] = b[..., [1, 3]].clip(0, orig_h - 1)
    return b


def normalize_image_np(img_uint8: np.ndarray) -> np.ndarray:
    """uint8 RGB HWC -> float32 ImageNet-normalized (host path)."""
    x = img_uint8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD
