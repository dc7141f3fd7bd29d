"""Box geometry primitives (pure JAX, static shapes, fully batched).

Numerical parity targets in the reference:
  - IoU matrix:  `bbox_iou_matrix` scripts/loss/loss.py:107-128 (eps=1e-7)
  - CIoU:        `bbox_ciou_flat`  scripts/loss/loss.py:130-155
  - xywh<->xyxy: scripts/helpers/utils_ms.py:6-12, scripts/helpers/helpers.py:58-83

Everything here broadcasts over arbitrary leading dims so the SimOTA loss can be
vmapped/batched without per-image Python loops.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

EPS = 1e-7


def xywh_to_xyxy(xywh: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (cx, cy, w, h) -> (x1, y1, x2, y2)."""
    x, y, w, h = jnp.split(xywh, 4, axis=-1)
    return jnp.concatenate([x - w * 0.5, y - h * 0.5, x + w * 0.5, y + h * 0.5], axis=-1)


def xyxy_to_xywh(xyxy: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (x1, y1, x2, y2) -> (cx, cy, w, h); w/h clamped >= 0."""
    x1, y1, x2, y2 = jnp.split(xyxy, 4, axis=-1)
    w = jnp.maximum(x2 - x1, 0.0)
    h = jnp.maximum(y2 - y1, 0.0)
    return jnp.concatenate([x1 + 0.5 * w, y1 + 0.5 * h, w, h], axis=-1)


def box_area(xyxy: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] -> [...] area with sides clamped >= 0."""
    w = jnp.maximum(xyxy[..., 2] - xyxy[..., 0], 0.0)
    h = jnp.maximum(xyxy[..., 3] - xyxy[..., 1], 0.0)
    return w * h


def box_iou_matrix(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """IoU between all pairs. box1 [..., N, 4] x box2 [..., M, 4] -> [..., N, M].

    Matches reference `bbox_iou_matrix` (loss.py:107-128) including side clamping
    and eps placement in the union.
    """
    b1 = box1[..., :, None, :]  # [..., N, 1, 4]
    b2 = box2[..., None, :, :]  # [..., 1, M, 4]

    inter_w = jnp.maximum(jnp.minimum(b1[..., 2], b2[..., 2]) - jnp.maximum(b1[..., 0], b2[..., 0]), 0.0)
    inter_h = jnp.maximum(jnp.minimum(b1[..., 3], b2[..., 3]) - jnp.maximum(b1[..., 1], b2[..., 1]), 0.0)
    inter = inter_w * inter_h

    area1 = jnp.maximum(b1[..., 2] - b1[..., 0], 0.0) * jnp.maximum(b1[..., 3] - b1[..., 1], 0.0)
    area2 = jnp.maximum(b2[..., 2] - b2[..., 0], 0.0) * jnp.maximum(b2[..., 3] - b2[..., 1], 0.0)
    union = area1 + area2 - inter + eps
    return inter / union


def box_iou_pairwise(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Elementwise IoU for matched pairs: [..., 4] x [..., 4] -> [...]."""
    inter_w = jnp.maximum(jnp.minimum(box1[..., 2], box2[..., 2]) - jnp.maximum(box1[..., 0], box2[..., 0]), 0.0)
    inter_h = jnp.maximum(jnp.minimum(box1[..., 3], box2[..., 3]) - jnp.maximum(box1[..., 1], box2[..., 1]), 0.0)
    inter = inter_w * inter_h
    area1 = jnp.maximum(box1[..., 2] - box1[..., 0], 0.0) * jnp.maximum(box1[..., 3] - box1[..., 1], 0.0)
    area2 = jnp.maximum(box2[..., 2] - box2[..., 0], 0.0) * jnp.maximum(box2[..., 3] - box2[..., 1], 0.0)
    union = area1 + area2 - inter + eps
    return inter / union


def bbox_ciou(pred_xyxy: jnp.ndarray, target_xyxy: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Complete IoU for matched pairs [..., 4] -> [...].

    Parity with reference `bbox_ciou_flat` (loss.py:130-155): width/height clamped
    to >= eps, alpha computed under stop_gradient (torch.no_grad in the reference).
    """
    px1, py1, px2, py2 = (pred_xyxy[..., i] for i in range(4))
    tx1, ty1, tx2, ty2 = (target_xyxy[..., i] for i in range(4))

    pw = jnp.maximum(px2 - px1, eps)
    ph = jnp.maximum(py2 - py1, eps)
    tw = jnp.maximum(tx2 - tx1, eps)
    th = jnp.maximum(ty2 - ty1, eps)

    inter_w = jnp.maximum(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1), 0.0)
    inter_h = jnp.maximum(jnp.minimum(py2, ty2) - jnp.maximum(py1, ty1), 0.0)
    inter = inter_w * inter_h
    union = pw * ph + tw * th - inter + eps
    iou = inter / union

    pcx = (px1 + px2) * 0.5
    pcy = (py1 + py2) * 0.5
    tcx = (tx1 + tx2) * 0.5
    tcy = (ty1 + ty2) * 0.5
    center_dist = (pcx - tcx) ** 2 + (pcy - tcy) ** 2

    cw = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    ch = jnp.maximum(py2, ty2) - jnp.minimum(py1, ty1)
    c2 = cw**2 + ch**2 + eps

    v = (4.0 / (math.pi**2)) * (jnp.arctan(tw / th) - jnp.arctan(pw / ph)) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + 1.0 + eps))
    return iou - (center_dist / c2) - alpha * v
