"""COCO evaluator golden tests + P/R/F1 sweep + confusion matrix."""

import numpy as np

from yololite_tpu.eval.coco import COCOEvaluator, coco_eval_from_lists
from yololite_tpu.eval.prf1 import build_curves_from_coco
from yololite_tpu.eval.confusion import create_confusion_matrix


def _img(i):
    return {"id": i, "file_name": f"{i}.jpg", "width": 640, "height": 640}


def _ann(aid, img, cat, bbox):
    return {"id": aid, "image_id": img, "category_id": cat, "bbox": list(bbox),
            "area": bbox[2] * bbox[3], "iscrowd": 0}


def _det(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox), "score": score}


def test_perfect_detections_ap1():
    anns = [_ann(1, 1, 1, [10, 10, 50, 50]), _ann(2, 1, 2, [100, 100, 40, 40]),
            _ann(3, 2, 1, [5, 5, 60, 80])]
    dets = [_det(1, 1, [10, 10, 50, 50], 0.9), _det(1, 2, [100, 100, 40, 40], 0.8),
            _det(2, 1, [5, 5, 60, 80], 0.95)]
    stats = COCOEvaluator().evaluate([_img(1), _img(2)], anns, dets)
    assert abs(stats["AP"] - 1.0) < 1e-6
    assert abs(stats["AP50"] - 1.0) < 1e-6
    assert abs(stats["AR"] - 1.0) < 1e-6


def test_empty_dets_returns_zeros():
    anns = [_ann(1, 1, 1, [10, 10, 50, 50])]
    stats = coco_eval_from_lists([_img(1)], anns, [])
    assert stats["AP"] == 0.0 and stats["AR"] == 0.0


def test_half_recall_ap():
    # 2 GTs, 1 perfect det -> precision 1 up to recall 0.5 -> AP = 51/101
    anns = [_ann(1, 1, 1, [10, 10, 50, 50]), _ann(2, 1, 1, [200, 200, 50, 50])]
    dets = [_det(1, 1, [10, 10, 50, 50], 0.9)]
    stats = COCOEvaluator().evaluate([_img(1)], anns, dets)
    np.testing.assert_allclose(stats["AP50"], 51 / 101, atol=1e-6)
    np.testing.assert_allclose(stats["AP"], 51 / 101, atol=1e-6)
    np.testing.assert_allclose(stats["AR"], 0.5, atol=1e-6)


def test_fp_before_tp_halves_precision():
    # FP scored above the TP -> interpolated precision 0.5 everywhere
    anns = [_ann(1, 1, 1, [10, 10, 50, 50])]
    dets = [_det(1, 1, [300, 300, 50, 50], 0.95),  # FP
            _det(1, 1, [10, 10, 50, 50], 0.90)]    # TP
    stats = COCOEvaluator().evaluate([_img(1)], anns, dets)
    np.testing.assert_allclose(stats["AP50"], 0.5, atol=1e-6)


def test_fp_after_full_recall_does_not_hurt_ap():
    anns = [_ann(1, 1, 1, [10, 10, 50, 50])]
    dets = [_det(1, 1, [10, 10, 50, 50], 0.95),
            _det(1, 1, [300, 300, 50, 50], 0.90)]
    stats = COCOEvaluator().evaluate([_img(1)], anns, dets)
    np.testing.assert_allclose(stats["AP50"], 1.0, atol=1e-6)


def test_iou_threshold_sensitivity():
    # det IoU with GT = 0.5 exactly at x-offset trick: use shifted box with known IoU
    # GT [0,0,100,100]; det [0,0,100,50] -> IoU = 0.5 -> counts at 0.5 but not 0.75
    anns = [_ann(1, 1, 1, [0, 0, 100, 100])]
    dets = [_det(1, 1, [0, 0, 100, 50], 0.9)]
    stats = COCOEvaluator().evaluate([_img(1)], anns, dets)
    assert stats["AP50"] == 1.0
    assert stats["AP75"] == 0.0


def test_area_ranges():
    # one small GT (20x20=400 < 1024) only -> APM/APL are -1 (N/A), APS == AP50 val
    anns = [_ann(1, 1, 1, [10, 10, 20, 20])]
    dets = [_det(1, 1, [10, 10, 20, 20], 0.9)]
    stats = COCOEvaluator().evaluate([_img(1)], anns, dets)
    assert stats["APS"] == 1.0
    assert stats["APM"] == -1.0 and stats["APL"] == -1.0


def test_prf1_sweep_golden():
    anns = [_ann(1, 1, 1, [10, 10, 50, 50]), _ann(2, 1, 1, [200, 200, 50, 50])]
    dets = [_det(1, 1, [10, 10, 50, 50], 0.9),        # TP
            _det(1, 1, [400, 400, 20, 20], 0.6)]      # FP
    s = build_curves_from_coco([_img(1)], anns, dets, out_dir=None)
    # at conf 0.95: no dets -> P=R=0; at 0.7: 1 TP -> P=1, R=0.5, F1=2/3
    confs = s["confs"]
    i_07 = int(np.argmin(np.abs(confs - 0.7)))
    assert abs(s["P_curve"][i_07] - 1.0) < 1e-9
    assert abs(s["R_curve"][i_07] - 0.5) < 1e-9
    # at conf 0.5: TP+FP -> P=0.5, R=0.5, F1=0.5
    i_05 = int(np.argmin(np.abs(confs - 0.5)))
    assert abs(s["P_curve"][i_05] - 0.5) < 1e-9
    assert abs(s["best_f1"] - 2 / 3) < 1e-9
    assert s["best_conf"] > 0.6  # best threshold excludes the FP


def test_prf1_empty():
    s = build_curves_from_coco([], [], [], out_dir=None)
    assert s["best_f1"] == 0.0


def test_confusion_matrix():
    anns = [_ann(1, 1, 1, [10, 10, 50, 50]),    # class 0
            _ann(2, 1, 2, [200, 200, 50, 50])]  # class 1
    dets = [_det(1, 1, [10, 10, 50, 50], 0.9),       # TP class 0
            _det(1, 1, [400, 400, 20, 20], 0.8),     # FP class 0 (background)
            _det(1, 1, [200, 200, 50, 50], 0.7)]     # GT class 1 predicted as class 0
    m = create_confusion_matrix(anns, dets, num_classes=2, conf=0.25)
    assert m[0, 0] == 1          # class0 -> class0
    assert m[1, 0] == 1          # class1 GT predicted class0
    assert m[2, 0] == 1          # background -> class0 FP
    assert m[1, 2] == 0          # class1 was matched (mislabeled), not FN
    assert m.sum() == 3


def test_segm_evaluator_golden():
    """Mask-IoU COCOeval: a det with a perfect box but half-covering mask gets
    full bbox AP yet zero segm AP75 (mask IoU 0.5)."""
    from yololite_tpu.eval.coco import COCOEvaluator
    gm = np.zeros((16, 16), bool)
    gm[4:12, 4:12] = True                    # GT mask: 8x8 square
    dm_perfect = gm.copy()
    dm_half = np.zeros((16, 16), bool)
    dm_half[4:12, 4:8] = True                # covers half -> IoU 0.5

    ann = dict(_ann(1, 1, 1, [16, 16, 32, 32]), mask=gm)
    det_p = dict(_det(1, 1, [16, 16, 32, 32], 0.9), mask=dm_perfect)
    det_h = dict(_det(1, 1, [16, 16, 32, 32], 0.9), mask=dm_half)

    segm = COCOEvaluator(iou_type="segm")
    s1 = segm.evaluate([_img(1)], [ann], [det_p])
    assert abs(s1["AP50"] - 1.0) < 1e-6 and abs(s1["AP"] - 1.0) < 1e-6

    s2 = segm.evaluate([_img(1)], [ann], [det_h])
    assert abs(s2["AP50"] - 1.0) < 1e-6      # IoU 0.5 passes the 0.5 threshold
    assert s2["AP75"] == 0.0                 # but not 0.75
    # bbox evaluator ignores masks entirely
    s3 = COCOEvaluator().evaluate([_img(1)], [ann], [det_h])
    assert abs(s3["AP75"] - 1.0) < 1e-6
