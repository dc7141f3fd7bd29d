"""Geometry unit tests: IoU/CIoU vs hand values, conversions, letterbox round-trip."""

import numpy as np
import jax.numpy as jnp

from yololite_tpu.ops import (
    xywh_to_xyxy, xyxy_to_xywh, box_iou_matrix, box_iou_pairwise, bbox_ciou,
    letterbox_params, unletterbox_boxes,
)
from yololite_tpu.ops.letterbox import forward_boxes, letterbox_image


def test_xywh_xyxy_roundtrip():
    xywh = jnp.array([[10.0, 20.0, 4.0, 6.0], [0.0, 0.0, 2.0, 2.0]])
    xyxy = xywh_to_xyxy(xywh)
    np.testing.assert_allclose(np.asarray(xyxy), [[8, 17, 12, 23], [-1, -1, 1, 1]])
    back = xyxy_to_xywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xywh), atol=1e-6)


def test_iou_hand_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[5.0, 5.0, 15.0, 15.0], [0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(box_iou_matrix(a, b))[0]
    # inter 25, union 175
    np.testing.assert_allclose(iou, [25 / 175, 1.0, 0.0], atol=1e-5)


def test_iou_pairwise_matches_matrix():
    rng = np.random.RandomState(0)
    x1y1 = rng.rand(32, 2) * 50
    wh = rng.rand(32, 2) * 30 + 1
    boxes1 = np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float32)
    x1y1 = rng.rand(32, 2) * 50
    wh = rng.rand(32, 2) * 30 + 1
    boxes2 = np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float32)
    m = np.asarray(box_iou_matrix(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    p = np.asarray(box_iou_pairwise(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    np.testing.assert_allclose(np.diag(m), p, atol=1e-6)


def test_ciou_perfect_match_is_one():
    b = jnp.array([[3.0, 4.0, 10.0, 12.0]])
    c = np.asarray(bbox_ciou(b, b))
    np.testing.assert_allclose(c, [1.0], atol=1e-5)


def test_ciou_less_than_iou_for_offset_boxes():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[5.0, 5.0, 15.0, 15.0]])
    ciou = float(bbox_ciou(a, b)[0])
    iou = float(box_iou_pairwise(a, b)[0])
    assert ciou < iou  # center-distance penalty active
    assert np.isclose(iou, 25 / 175, atol=1e-5)


def test_ciou_reference_formula():
    # Hand-computed against the reference formula (loss.py:130-155)
    import math
    a = np.array([0.0, 0.0, 4.0, 8.0])
    b = np.array([1.0, 1.0, 6.0, 7.0])
    pw, ph = 4.0, 8.0
    tw, th = 5.0, 6.0
    inter = (4 - 1) * (7 - 1)
    union = pw * ph + tw * th - inter + 1e-7
    iou = inter / union
    cd = ((2.0 - 3.5) ** 2 + (4.0 - 4.0) ** 2)
    c2 = (6.0 - 0.0) ** 2 + (8.0 - 0.0) ** 2 + 1e-7
    v = (4 / math.pi**2) * (math.atan(tw / th) - math.atan(pw / ph)) ** 2
    alpha = v / (v - iou + 1 + 1e-7)
    expected = iou - cd / c2 - alpha * v
    got = float(bbox_ciou(jnp.asarray(a)[None], jnp.asarray(b)[None])[0])
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_letterbox_roundtrip():
    h, w, s = 480, 640, 320
    scale, px, py = letterbox_params(h, w, s)
    assert scale == 0.5 and px == 0 and py == (320 - 240) // 2
    boxes = np.array([[10.0, 20.0, 200.0, 400.0], [0.0, 0.0, 639.0, 479.0]])
    fwd = forward_boxes(boxes, scale, px, py)
    back = unletterbox_boxes(fwd, scale, px, py, w, h)
    np.testing.assert_allclose(back, boxes, atol=1e-4)


def test_letterbox_image_padding_value():
    img = np.full((100, 200, 3), 50, np.uint8)
    canvas, scale, px, py = letterbox_image(img, 64)
    assert canvas.shape == (64, 64, 3)
    assert canvas[0, 0, 0] == 114  # pad rows top
    ny = int(round(100 * scale))
    assert canvas[py + ny // 2, 32, 0] == 50  # image content


def test_unletterbox_per_axis_scale():
    """Plain-resize path on non-square inputs: per-axis (sx, sy) back-mapping."""
    w, h, s = 400, 200, 100
    sx, sy = s / w, s / h
    boxes_canvas = np.array([[25.0, 50.0, 75.0, 100.0]])  # canvas coords
    back = unletterbox_boxes(boxes_canvas, (sx, sy), 0, 0, w, h)
    np.testing.assert_allclose(back, [[100.0, 100.0, 300.0, 199.0]], atol=1e-4)
