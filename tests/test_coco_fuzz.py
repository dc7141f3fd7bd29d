"""Randomized cross-validation of the first-party COCO evaluator.

The production evaluator (yololite_tpu/eval/coco.py, replacing the reference's
pycocotools path `scripts/helpers/helpers.py:155-227`) is vectorized: cumsum
PR curves, backwards-max monotone precision, searchsorted 101-pt interpolation,
optional C++ matcher. A subtle protocol bug there would silently shift every AP
in the repo, so this file re-implements the COCOeval bbox protocol a SECOND
time, maximally naive and structurally different (dict-free per-threshold
loops, textbook "max precision at recall >= r" interpolation, pure-python
greedy matching written fresh), and asserts agreement to 1e-9 on all 10 stats
over a few hundred randomized det/GT configurations plus adversarial edge
cases (empty images, ignored-area GTs, unmatched out-of-range dets, maxDets
truncation, multi-category, det-only / gt-only images).

No code is shared with the production path except numpy.
"""

from __future__ import annotations

import numpy as np
import pytest

from yololite_tpu.eval.coco import COCOEvaluator

IOU_T = [0.5 + 0.05 * i for i in range(10)]
REC_T = [0.01 * i for i in range(101)]
AREAS = [("all", 0.0, 1e10), ("small", 0.0, 1024.0),
         ("medium", 1024.0, 9216.0), ("large", 9216.0, 1e10)]
STAT_KEYS = ["AP", "AP50", "AP75", "APS", "APM", "APL", "AR", "ARS", "ARM", "ARL"]


def _iou_one(d, g):
    """Plain scalar IoU of two xywh boxes, written independently."""
    dx1, dy1, dx2, dy2 = d[0], d[1], d[0] + d[2], d[1] + d[3]
    gx1, gy1, gx2, gy2 = g[0], g[1], g[0] + g[2], g[1] + g[3]
    iw = min(dx2, gx2) - max(dx1, gx1)
    ih = min(dy2, gy2) - max(dy1, gy1)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    union = max(d[2] * d[3], 0) + max(g[2] * g[3], 0) - inter
    return inter / union if union > 0 else 0.0


def brute_force_cocoeval(images, anns, dets):
    """Independent, deliberately slow COCOeval bbox protocol.

    Follows the official semantics step by step:
      per (category, area range, IoU threshold):
        per image: sort dets by score desc, truncate to maxDets=100; sort GTs
        ignored-last; greedy match each det to the best still-free GT with
        IoU >= threshold (preferring non-ignored: stop scanning ignored GTs
        once a non-ignored candidate is held); det matched to ignored GT is
        ignored; unmatched det whose own area is outside the range is ignored.
      pool all images, sort by score desc, walk the ranked list accumulating
      TP/FP; precision at recall r = max precision over points with
      recall >= r (textbook interpolation, NOT searchsorted); AP = mean over
      101 recall thresholds; category skipped when it has no non-ignored GT.
    """
    if not dets or not anns:
        return {k: 0.0 for k in STAT_KEYS}
    cats = sorted({int(a["category_id"]) for a in anns})
    img_ids = sorted({int(im["id"]) for im in images}) if images else \
        sorted({int(a["image_id"]) for a in anns} | {int(d["image_id"]) for d in dets})

    # precision[t][k][a] = list over 101 recall thrs; recall_last[t][k][a]
    prec = {}
    rec = {}
    for _, lo, hi in AREAS:
        for cat in cats:
            # per-image matching, pooled
            pooled = []  # (score, is_tp, is_ignored) per kept det, per threshold
            npig = 0
            per_thr = [[] for _ in IOU_T]
            for img in img_ids:
                g = [a for a in anns if int(a["image_id"]) == img
                     and int(a["category_id"]) == cat]
                d = [x for x in dets if int(x["image_id"]) == img
                     and int(x["category_id"]) == cat]
                g_area = [float(a.get("area", a["bbox"][2] * a["bbox"][3])) for a in g]
                g_ign = [ga < lo or ga > hi for ga in g_area]
                # ignored GTs last, stable
                gorder = sorted(range(len(g)), key=lambda i: (g_ign[i], i))
                g = [g[i] for i in gorder]
                g_ign = [g_ign[i] for i in gorder]
                npig += sum(1 for x in g_ign if not x)
                dorder = sorted(range(len(d)), key=lambda i: (-d[i]["score"], i))[:100]
                d = [d[i] for i in dorder]
                for ti, thr in enumerate(IOU_T):
                    taken = [False] * len(g)
                    for det in d:
                        best = min(thr, 1.0 - 1e-10)
                        match = -1
                        for gi in range(len(g)):
                            if taken[gi]:
                                continue
                            if match > -1 and not g_ign[match] and g_ign[gi]:
                                break
                            iou = _iou_one(det["bbox"], g[gi]["bbox"])
                            if iou < best:
                                continue
                            best = iou
                            match = gi
                        if match >= 0:
                            taken[match] = True
                            if g_ign[match]:
                                per_thr[ti].append((det["score"], False, True))
                            else:
                                per_thr[ti].append((det["score"], True, False))
                        else:
                            da = max(det["bbox"][2] * det["bbox"][3], 0.0)
                            ignored = da < lo or da > hi
                            per_thr[ti].append((det["score"], False, ignored))
            if npig == 0:
                continue
            for ti in range(len(IOU_T)):
                ranked = sorted(per_thr[ti], key=lambda t: -t[0])
                tp = fp = 0
                points = []  # (recall, precision) after each non-ignored det
                for score, is_tp, is_ign in ranked:
                    if is_ign:
                        continue
                    if is_tp:
                        tp += 1
                    else:
                        fp += 1
                    points.append((tp / npig, tp / (tp + fp)))
                q = []
                for rt in REC_T:
                    # exact >= to mirror pycocotools' searchsorted(side="left"):
                    # a recall point of 7/20=0.35 does NOT satisfy the float
                    # threshold 35*0.01=0.35000000000000003 there either
                    cands = [p for r, p in points if r >= rt]
                    q.append(max(cands) if cands else 0.0)
                prec[(ti, cat, (lo, hi))] = q
                rec[(ti, cat, (lo, hi))] = points[-1][0] if points else 0.0

    def ap(t_sel, lo, hi):
        vals = [v for (ti, c, rng), q in prec.items()
                if ti in t_sel and rng == (lo, hi) for v in q]
        return float(np.mean(vals)) if vals else -1.0

    def ar(lo, hi):
        vals = [v for (ti, c, rng), v in rec.items() if rng == (lo, hi)]
        return float(np.mean(vals)) if vals else -1.0

    all_t = list(range(len(IOU_T)))
    return {
        "AP": ap(all_t, 0.0, 1e10), "AP50": ap([0], 0.0, 1e10),
        "AP75": ap([5], 0.0, 1e10),
        "APS": ap(all_t, 0.0, 1024.0), "APM": ap(all_t, 1024.0, 9216.0),
        "APL": ap(all_t, 9216.0, 1e10),
        "AR": ar(0.0, 1e10), "ARS": ar(0.0, 1024.0),
        "ARM": ar(1024.0, 9216.0), "ARL": ar(9216.0, 1e10),
    }


def _random_scene(rng: np.random.Generator, n_images, n_cats, max_gt, max_dt,
                  jitter=0.35, drop_p=0.3, spurious=3, big_boxes=False):
    """Random GT boxes + detections that are jittered copies (so IoUs straddle
    the 0.5:0.95 grid) plus spurious false positives. Continuous scores so
    ties have measure zero (both implementations use stable tie-breaks, but
    the fuzz shouldn't depend on that)."""
    images, anns, dets = [], [], []
    ann_id = 1
    for img in range(1, n_images + 1):
        images.append({"id": img, "width": 640, "height": 640})
        for _ in range(rng.integers(0, max_gt + 1)):
            cat = int(rng.integers(1, n_cats + 1))
            # mix of areas spanning small/medium/large COCO bins
            if big_boxes:
                w, h = rng.uniform(5, 300, 2)
            else:
                w, h = np.exp(rng.uniform(np.log(4), np.log(200), 2))
            x, y = rng.uniform(0, 640 - w), rng.uniform(0, 640 - h)
            anns.append({"id": ann_id, "image_id": img, "category_id": cat,
                         "bbox": [float(x), float(y), float(w), float(h)],
                         "area": float(w * h), "iscrowd": 0})
            ann_id += 1
            if rng.uniform() > drop_p:  # matched-ish detection
                k = 1 + int(rng.uniform() < 0.3)  # sometimes duplicate dets
                for _ in range(k):
                    jx, jy = rng.uniform(-jitter, jitter, 2) * [w, h]
                    jw = w * rng.uniform(1 - jitter, 1 + jitter)
                    jh = h * rng.uniform(1 - jitter, 1 + jitter)
                    cat_d = cat if rng.uniform() > 0.1 else int(rng.integers(1, n_cats + 1))
                    dets.append({"image_id": img, "category_id": cat_d,
                                 "bbox": [float(x + jx), float(y + jy),
                                          float(jw), float(jh)],
                                 "score": float(rng.uniform(0.05, 1.0))})
        for _ in range(rng.integers(0, spurious + 1)):  # pure FPs
            w, h = np.exp(rng.uniform(np.log(4), np.log(250), 2))
            x, y = rng.uniform(0, 640 - w), rng.uniform(0, 640 - h)
            dets.append({"image_id": img, "category_id": int(rng.integers(1, n_cats + 1)),
                         "bbox": [float(x), float(y), float(w), float(h)],
                         "score": float(rng.uniform(0.05, 1.0))})
        if rng.integers(0, min(max_dt, 1) + 1) and len(dets) > max_dt:
            dets = dets[:max_dt]
    return images, anns, dets


def _assert_stats_equal(images, anns, dets, seed):
    got = COCOEvaluator().evaluate(images, anns, dets)
    want = brute_force_cocoeval(images, anns, dets)
    for k in STAT_KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), \
            f"seed={seed} stat {k}: production={got[k]!r} brute-force={want[k]!r}"


@pytest.mark.parametrize("seed", range(120))
def test_fuzz_random_scenes(seed):
    rng = np.random.default_rng(seed)
    n_images = int(rng.integers(1, 6))
    n_cats = int(rng.integers(1, 5))
    images, anns, dets = _random_scene(
        rng, n_images, n_cats,
        max_gt=int(rng.integers(1, 8)), max_dt=40,
        jitter=float(rng.uniform(0.05, 0.6)),
        drop_p=float(rng.uniform(0.0, 0.6)),
        spurious=int(rng.integers(0, 6)),
        big_boxes=bool(rng.integers(0, 2)))
    if not anns or not dets:
        anns = [{"id": 1, "image_id": 1, "category_id": 1,
                 "bbox": [10, 10, 50, 50], "area": 2500.0, "iscrowd": 0}]
        dets = [{"image_id": 1, "category_id": 1,
                 "bbox": [12, 11, 48, 52], "score": 0.9}]
    _assert_stats_equal(images, anns, dets, seed)


def test_fuzz_maxdets_truncation():
    """>100 dets in one (image, cat): only top-100 by score may count."""
    rng = np.random.default_rng(1234)
    images = [{"id": 1, "width": 640, "height": 640}]
    anns = [{"id": i + 1, "image_id": 1, "category_id": 1,
             "bbox": [float(5 + 45 * (i % 13)), float(5 + 45 * (i // 13)), 40.0, 40.0],
             "area": 1600.0, "iscrowd": 0} for i in range(20)]
    dets = []
    for i in range(160):
        a = anns[i % 20]["bbox"]
        dets.append({"image_id": 1, "category_id": 1,
                     "bbox": [a[0] + float(rng.uniform(-8, 8)),
                              a[1] + float(rng.uniform(-8, 8)), 40.0, 40.0],
                     "score": float(rng.uniform(0, 1))})
    _assert_stats_equal(images, anns, dets, "maxdets")


def test_fuzz_area_range_ignores():
    """GTs outside an area bin are ignored there; dets matching them are
    neither TP nor FP; unmatched dets outside the bin are ignored too."""
    images = [{"id": 1, "width": 640, "height": 640}]
    anns = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "area": 400.0, "iscrowd": 0},               # small
        {"id": 2, "image_id": 1, "category_id": 1, "bbox": [100, 100, 60, 60],
         "area": 3600.0, "iscrowd": 0},              # medium
        {"id": 3, "image_id": 1, "category_id": 1, "bbox": [300, 300, 120, 150],
         "area": 18000.0, "iscrowd": 0},             # large
    ]
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [11, 11, 20, 20], "score": 0.95},
        {"image_id": 1, "category_id": 1, "bbox": [101, 99, 61, 60], "score": 0.85},
        {"image_id": 1, "category_id": 1, "bbox": [302, 305, 118, 148], "score": 0.75},
        {"image_id": 1, "category_id": 1, "bbox": [500, 20, 25, 20], "score": 0.65},  # FP small
        {"image_id": 1, "category_id": 1, "bbox": [500, 400, 100, 110], "score": 0.55},  # FP large
    ]
    _assert_stats_equal(images, anns, dets, "area-ranges")


def test_fuzz_gt_only_and_det_only_images():
    images = [{"id": i, "width": 640, "height": 640} for i in (1, 2, 3)]
    anns = [{"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [50, 50, 80, 80], "area": 6400.0, "iscrowd": 0},
            {"id": 2, "image_id": 2, "category_id": 2,
             "bbox": [10, 10, 200, 150], "area": 30000.0, "iscrowd": 0}]
    dets = [{"image_id": 1, "category_id": 1, "bbox": [52, 48, 80, 82], "score": 0.9},
            {"image_id": 3, "category_id": 1, "bbox": [30, 30, 90, 90], "score": 0.8},
            {"image_id": 3, "category_id": 2, "bbox": [5, 5, 210, 140], "score": 0.7}]
    _assert_stats_equal(images, anns, dets, "gt-det-only")


def test_fuzz_duplicate_dets_one_gt():
    """Second det on an already-matched GT is an FP at that threshold."""
    images = [{"id": 1, "width": 640, "height": 640}]
    anns = [{"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [100, 100, 100, 100], "area": 10000.0, "iscrowd": 0}]
    dets = [{"image_id": 1, "category_id": 1, "bbox": [100, 100, 100, 100], "score": 0.9},
            {"image_id": 1, "category_id": 1, "bbox": [105, 95, 100, 104], "score": 0.8},
            {"image_id": 1, "category_id": 1, "bbox": [98, 102, 99, 97], "score": 0.7}]
    _assert_stats_equal(images, anns, dets, "dup-dets")


def test_golden_analytic_two_thresholds():
    """Hand-derivable: one GT 100x100, one det with IoU ~ 0.6926 -> TP for
    IoU thr in {.50,.55,.60,.65} (4 of 10), FP above. AP50 = 1.0,
    AP = 4/10, AR = mean recall = 0.4."""
    images = [{"id": 1, "width": 640, "height": 640}]
    anns = [{"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 100, 100], "area": 10000.0, "iscrowd": 0}]
    # det shifted by 15 px in x: inter = 85*100, union = 2*10000-8500
    # IoU = 8500/11500 = 0.73913 -> thresholds .50,.55,.60,.65,.70 pass (5)
    dets = [{"image_id": 1, "category_id": 1, "bbox": [15, 0, 100, 100], "score": 0.9}]
    got = COCOEvaluator().evaluate(images, anns, dets)
    assert got["AP50"] == pytest.approx(1.0)
    assert got["AP"] == pytest.approx(0.5)    # 5 of 10 thresholds give AP 1
    assert got["AR"] == pytest.approx(0.5)
    assert got["APL"] == pytest.approx(0.5)   # 10000 px^2 -> large
    assert got["APS"] == -1.0 and got["APM"] == -1.0
    _assert_stats_equal(images, anns, dets, "analytic")
