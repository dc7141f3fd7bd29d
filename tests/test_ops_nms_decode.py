"""Decode parity (vs the reference formulas re-computed in numpy) and NMS
correctness (device fixpoint NMS == host greedy NMS)."""

import numpy as np
import jax
import jax.numpy as jnp

from yololite_tpu.ops import decode_anchorfree, batched_nms, make_anchors
from yololite_tpu.ops.nms import nms_numpy, yolo_scores


def _softplus(x):
    return np.logaddexp(0.0, x)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _reference_decode_np(levels, img_size, center_mode="v8", wh_mode="softplus"):
    """Numpy transcription of decode_preds_anchorfree (utils_ms.py:26-123)."""
    boxes_all, obj_all, cls_all = [], [], []
    for pred in levels:
        B, A, S, _, D = pred.shape
        stride = img_size / float(S)
        gy, gx = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
        gx = gx[None, None]
        gy = gy[None, None]
        tx, ty, tw, th = pred[..., 0], pred[..., 1], pred[..., 2], pred[..., 3]
        if center_mode == "v8":
            px = ((_sigmoid(tx) * 2.0 - 0.5) + gx) * stride
            py = ((_sigmoid(ty) * 2.0 - 0.5) + gy) * stride
        else:
            px = (_sigmoid(tx) + gx) * stride
            py = (_sigmoid(ty) + gy) * stride
        if wh_mode == "v8":
            pw = (_sigmoid(tw) * 2.0) ** 2 * stride
            ph = (_sigmoid(th) * 2.0) ** 2 * stride
        elif wh_mode == "softplus":
            pw = _softplus(tw) * stride
            ph = _softplus(th) * stride
        else:
            pw = np.exp(np.clip(tw, -4, 4)) * stride
            ph = np.exp(np.clip(th, -4, 4)) * stride
        x1 = np.clip(px - pw * 0.5, 0, img_size - 1)
        y1 = np.clip(py - ph * 0.5, 0, img_size - 1)
        x2 = np.clip(px + pw * 0.5, 0, img_size - 1)
        y2 = np.clip(py + ph * 0.5, 0, img_size - 1)
        boxes = np.stack([x1, y1, x2, y2], -1).reshape(B, A * S * S, 4)
        boxes_all.append(boxes)
        obj_all.append(pred[..., 4].reshape(B, A * S * S, 1))
        cls_all.append(pred[..., 5:].reshape(B, A * S * S, D - 5))
    return (np.concatenate(boxes_all, 1), np.concatenate(obj_all, 1),
            np.concatenate(cls_all, 1))


def test_decode_parity_all_modes():
    rng = np.random.RandomState(42)
    img_size = 64
    levels = [rng.randn(2, 1, s, s, 5 + 3).astype(np.float32) * 2 for s in (8, 4, 2)]
    for cm in ("v8", "simple"):
        for wm in ("v8", "softplus", "exp"):
            ref_box, ref_obj, ref_cls = _reference_decode_np(levels, img_size, cm, wm)
            got = decode_anchorfree([jnp.asarray(l) for l in levels], img_size,
                                    center_mode=cm, wh_mode=wm)
            np.testing.assert_allclose(np.asarray(got["box"]), ref_box, atol=2e-3,
                                       err_msg=f"{cm}/{wm}")
            np.testing.assert_allclose(np.asarray(got["obj"]), ref_obj, atol=1e-6)
            np.testing.assert_allclose(np.asarray(got["cls"]), ref_cls, atol=1e-6)


def test_anchor_grid_order():
    pts, strides = make_anchors([(2, 2), (1, 1)], 8)
    np.testing.assert_allclose(np.asarray(pts),
                               [[0, 0], [1, 0], [0, 1], [1, 1], [0, 0]])
    np.testing.assert_allclose(np.asarray(strides), [4, 4, 4, 4, 8])


def _random_dets(rng, n, img=640, nc=5):
    cx = rng.rand(n) * img
    cy = rng.rand(n) * img
    w = rng.rand(n) * 100 + 5
    h = rng.rand(n) * 100 + 5
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    classes = rng.randint(0, nc, size=n).astype(np.int32)
    return boxes, scores, classes


def test_device_nms_matches_host_greedy():
    rng = np.random.RandomState(7)
    boxes, scores, classes = _random_dets(rng, 400)
    conf_th, iou_th, max_det = 0.05, 0.5, 300

    out_b, out_s, out_c, out_v, _ = jax.tree.map(
        np.asarray,
        batched_nms(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                    jnp.asarray(classes)[None], iou_th=iou_th, conf_th=conf_th,
                    max_det=max_det, pre_nms_topk=512))

    # host reference: per-class greedy on conf-filtered dets
    m = scores > conf_th
    hb, hs, hc = boxes[m], scores[m], classes[m]
    kept = []
    for c in np.unique(hc):
        cm = hc == c
        k = nms_numpy(hb[cm], hs[cm], iou_th)
        for i in k:
            kept.append((hs[cm][i], tuple(hb[cm][i]), c))
    kept.sort(key=lambda t: -t[0])
    kept = kept[:max_det]

    got_valid = out_v[0]
    assert int(got_valid.sum()) == len(kept)
    got = sorted(zip(out_s[0][got_valid], map(tuple, out_b[0][got_valid]),
                     out_c[0][got_valid]), key=lambda t: -t[0])
    for (es, eb, ec), (gs, gb, gc) in zip(kept, got):
        assert abs(es - gs) < 1e-5
        assert ec == gc
        np.testing.assert_allclose(eb, gb, atol=1e-3)


def test_nms_class_aware_keeps_overlapping_different_classes():
    boxes = jnp.asarray(np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32))[None]
    scores = jnp.asarray(np.array([0.9, 0.8], np.float32))[None]
    classes = jnp.asarray(np.array([0, 1], np.int32))[None]
    _, s, c, v, _i = batched_nms(boxes, scores, classes, iou_th=0.5,
                                 conf_th=0.01, max_det=10, pre_nms_topk=2)
    assert int(np.asarray(v).sum()) == 2  # both survive per-class NMS
    _, s2, c2, v2, _i2 = batched_nms(boxes, scores, classes, iou_th=0.5,
                                     conf_th=0.01, max_det=10, pre_nms_topk=2,
                                     class_aware=False)
    assert int(np.asarray(v2).sum()) == 1  # class-agnostic suppresses one


def test_yolo_scores():
    obj = jnp.asarray(np.array([[0.0, 2.0]], np.float32))
    cls = jnp.asarray(np.array([[[2.0, -1.0], [-3.0, 1.0]]], np.float32))
    s, c = yolo_scores(obj, cls)
    s, c = np.asarray(s), np.asarray(c)
    np.testing.assert_allclose(s[0, 0], _sigmoid(0.0) * _sigmoid(2.0), atol=1e-6)
    assert c[0, 0] == 0 and c[0, 1] == 1


def test_nms_approx_topk_near_exact():
    """approx_max_k pre-selection (recall 0.99) keeps detections ~identical to
    the exact sort on a realistic score distribution."""
    rng = np.random.RandomState(0)
    n = 4096
    boxes_wh = rng.uniform(8, 60, (n, 2)).astype(np.float32)
    xy = rng.uniform(0, 600, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + boxes_wh], 1)
    scores = (rng.beta(0.5, 8.0, n)).astype(np.float32)
    classes = rng.randint(0, 20, n).astype(np.int32)
    args = dict(iou_th=0.5, conf_th=0.05, max_det=100, pre_nms_topk=512)
    exact = batched_nms(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                        jnp.asarray(classes)[None], **args)
    approx = batched_nms(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                         jnp.asarray(classes)[None], approx_topk=True, **args)
    ev, av = np.asarray(exact[3][0]), np.asarray(approx[3][0])
    es = set(np.round(np.asarray(exact[1][0])[ev], 5))
    as_ = set(np.round(np.asarray(approx[1][0])[av], 5))
    # recall_target=0.99 on the pre-selection: allow a couple of tail swaps
    assert len(es & as_) >= int(0.97 * len(es))
