"""Pallas NMS suppression kernel == XLA fixpoint path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from yololite_tpu.ops.nms import _greedy_keep, _suppression_matrix
from yololite_tpu.ops.pallas_nms import pallas_greedy_keep


def test_pallas_keep_matches_xla():
    rng = np.random.RandomState(0)
    B, k = 3, 128
    cx, cy = rng.rand(2, B, k) * 500
    w, h = rng.rand(2, B, k) * 90 + 5
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)\
        .astype(np.float32)
    valid = rng.rand(B, k) > 0.1

    got = np.asarray(pallas_greedy_keep(jnp.asarray(boxes), jnp.asarray(valid),
                                        iou_th=0.5, interpret=True))
    for b in range(B):
        overlap = _suppression_matrix(jnp.asarray(boxes[b]), use_diou=False)
        want = np.asarray(_greedy_keep(overlap, jnp.asarray(valid[b]), 0.5))
        np.testing.assert_array_equal(got[b], want)


def test_batched_nms_pallas_path_matches_default():
    import jax
    from yololite_tpu.ops.nms import batched_nms
    rng = np.random.RandomState(3)
    B, n = 2, 300
    cx, cy = rng.rand(2, B, n) * 600
    w, h = rng.rand(2, B, n) * 80 + 5
    boxes = jnp.asarray(np.stack([cx - w / 2, cy - h / 2, cx + w / 2,
                                  cy + h / 2], -1).astype(np.float32))
    scores = jnp.asarray(rng.rand(B, n).astype(np.float32))
    classes = jnp.asarray(rng.randint(0, 4, (B, n)).astype(np.int32))
    kw = dict(iou_th=0.5, conf_th=0.05, max_det=50, pre_nms_topk=128)
    # interpret-mode pallas on CPU
    import yololite_tpu.ops.pallas_nms as pn
    orig = pn.pallas_greedy_keep
    pn.pallas_greedy_keep = lambda b, v, iou_th: orig(b, v, iou_th=iou_th,
                                                     interpret=True)
    try:
        got = batched_nms(boxes, scores, classes, use_pallas=True, **kw)
    finally:
        pn.pallas_greedy_keep = orig
    want = batched_nms(boxes, scores, classes, **kw)
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))
