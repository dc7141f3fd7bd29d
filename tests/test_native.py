"""Native C++ kernels: build, NMS parity vs numpy, COCO-match parity vs python."""

import numpy as np
import pytest

from yololite_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of kernels.cpp failed"


def _pure_numpy_nms(boxes, scores, iou_th):
    order = scores.argsort()[::-1]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
        iou = inter / (areas[i] + areas[order[1:]] - inter + 1e-7)
        order = order[1:][iou <= iou_th]
    return np.asarray(keep)


def test_native_nms_matches_numpy():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 200
        cx, cy = rng.rand(2, n) * 500
        w, h = rng.rand(2, n) * 80 + 5
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)\
            .astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        got = native.nms_native(boxes, scores, 0.5)
        want = _pure_numpy_nms(boxes, scores, 0.5)
        np.testing.assert_array_equal(got, want)


def test_native_coco_match_matches_python():
    rng = np.random.RandomState(1)
    D, G, T = 30, 12, 10
    ious = rng.rand(D, G)
    gt_ignore = np.zeros(G, np.uint8)
    gt_ignore[-3:] = 1  # ignored sorted last, as the evaluator guarantees
    thrs = np.linspace(0.5, 0.95, T)

    got = native.coco_match_native(ious, gt_ignore, thrs)
    assert got is not None
    dtm_n, ig_n = got

    # python reference (same algorithm as eval/coco.py fallback)
    dtm = np.zeros((T, D), np.int32)
    dt_ig = np.zeros((T, D), bool)
    for ti, thr in enumerate(thrs):
        gtm = np.zeros(G, bool)
        for di in range(D):
            best = min(thr, 1.0 - 1e-10)
            m = -1
            for gi in range(G):
                if gtm[gi]:
                    continue
                if m > -1 and not gt_ignore[m] and gt_ignore[gi]:
                    break
                if ious[di, gi] < best:
                    continue
                best = ious[di, gi]
                m = gi
            if m == -1:
                continue
            dtm[ti, di] = m + 1
            dt_ig[ti, di] = gt_ignore[m]
            gtm[m] = True

    np.testing.assert_array_equal(dtm_n, dtm)
    np.testing.assert_array_equal(ig_n, dt_ig)


def test_nms_numpy_entry_uses_native():
    from yololite_tpu.ops.nms import nms_numpy
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms_numpy(boxes, scores, 0.5)
    np.testing.assert_array_equal(sorted(keep), [0, 2])


def test_pack_s2d_native_matches_numpy():
    from yololite_tpu.native import available, pack_s2d_native
    if not available():
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.RandomState(0)
    x = (rng.rand(2, 32, 48, 3) * 255).astype(np.uint8)
    out = pack_s2d_native(x)
    assert out.shape == (2, 16, 24, 12)
    for di in range(2):
        for dj in range(2):
            ph = di * 2 + dj
            np.testing.assert_array_equal(out[..., ph * 3:(ph + 1) * 3],
                                          x[:, di::2, dj::2, :])
