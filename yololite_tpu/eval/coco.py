"""Self-contained COCO-protocol detection evaluator (numpy, pycocotools-free).

The reference shells out to pycocotools' C extension via temp JSON files
(`_coco_eval_from_lists` scripts/helpers/helpers.py:155-227). pycocotools is
not available here, so this module implements the COCOeval bbox protocol
natively and returns the same stats dict:
  {AP, AP50, AP75, APS, APM, APL, AR, ARS, ARM, ARL}
following the official evaluation semantics:
  - IoU thresholds 0.50:0.05:0.95 (10), recall thresholds 0:0.01:1 (101),
  - area ranges all/small/medium/large = [0,1e10]/[0,32^2]/[32^2,96^2]/[96^2,1e10],
  - maxDets 100 for AP; AR reported at maxDets=100 (stats[8]) like the reference,
  - greedy per-(image,category) matching, ignored-GT handling for area ranges,
  - 101-point interpolated precision, averaged over categories present in GT.

Inputs use the exact same list-of-dicts format the reference builds in its val
loop (tools/train.py:432-478): images [{"id",...}], anns [{"id","image_id",
"category_id","bbox":[x,y,w,h],"area","iscrowd"}], dets [{"image_id",
"category_id","bbox","score"}].

Empty-detection guard returns zeros (helpers.py:166-178 parity).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = 100


def iou_xywh_matrix(dt: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """IoU between [D,4] and [G,4] xywh boxes."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)), np.float64)
    dx1, dy1 = dt[:, 0], dt[:, 1]
    dx2, dy2 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    gx1, gy1 = gt[:, 0], gt[:, 1]
    gx2, gy2 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    iw = np.minimum(dx2[:, None], gx2[None, :]) - np.maximum(dx1[:, None], gx1[None, :])
    ih = np.minimum(dy2[:, None], gy2[None, :]) - np.maximum(dy1[:, None], gy1[None, :])
    iw = np.maximum(iw, 0.0)
    ih = np.maximum(ih, 0.0)
    inter = iw * ih
    area_d = np.maximum(dt[:, 2] * dt[:, 3], 0.0)
    area_g = np.maximum(gt[:, 2] * gt[:, 3], 0.0)
    union = area_d[:, None] + area_g[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _dense_masks(items) -> np.ndarray:
    """COCO ann/det dicts -> stacked binary masks [N, H, W].

    Accepts full-resolution RLE under "segmentation" (the evaluation-time
    format: GT rasterized from polygons at image resolution, dets upsampled
    from prototype resolution — reference V2 masks are image-resolution,
    README.md:41) or a dense binary array under "mask" (legacy/proto-res).
    All items in one (image, class) group must share one resolution.
    """
    from yololite_tpu.ops.masks import rle_decode_np
    if not items:
        return np.zeros((0, 1, 1), bool)
    out = []
    for it in items:
        if "segmentation" in it:
            out.append(rle_decode_np(it["segmentation"]).astype(bool))
        else:
            out.append(np.asarray(it["mask"], bool))
    return np.stack(out)


def mask_iou_matrix(dt_masks: np.ndarray, gt_masks: np.ndarray) -> np.ndarray:
    """IoU between binary masks: [D,h,w] x [G,h,w] -> [D,G] (segm COCOeval)."""
    if len(dt_masks) == 0 or len(gt_masks) == 0:
        return np.zeros((len(dt_masks), len(gt_masks)), np.float64)
    d = dt_masks.reshape(len(dt_masks), -1).astype(np.float64)
    g = gt_masks.reshape(len(gt_masks), -1).astype(np.float64)
    inter = d @ g.T
    union = d.sum(1)[:, None] + g.sum(1)[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _evaluate_img(dt_boxes, dt_scores, gt_boxes, gt_areas, area_rng, max_dets,
                  iou_matrix=None):
    """Match dets to GTs for one (image, category) over all IoU thresholds.

    `iou_matrix` [D,G] (unsorted det x gt order) overrides the default bbox IoU
    — used for segm evaluation with mask IoUs.
    Returns (dt_matches [T,D] (1=TP), dt_ignore [T,D], scores [D], npig).
    """
    arng_lo, arng_hi = area_rng
    gt_ignore = (gt_areas < arng_lo) | (gt_areas > arng_hi)
    # sort GT: non-ignored first (COCOeval semantics)
    gorder = np.argsort(gt_ignore, kind="stable")
    gt_boxes = gt_boxes[gorder]
    gt_ignore = gt_ignore[gorder]

    dorder = np.argsort(-dt_scores, kind="stable")[:max_dets]
    dt_boxes = dt_boxes[dorder]
    dt_scores = dt_scores[dorder]

    T = len(IOU_THRS)
    D = len(dt_boxes)
    G = len(gt_boxes)
    if iou_matrix is not None:
        ious = np.asarray(iou_matrix, np.float64)[dorder][:, gorder]
    else:
        ious = iou_xywh_matrix(dt_boxes, gt_boxes)

    native = None
    if D and G:
        from yololite_tpu.native import coco_match_native
        native = coco_match_native(ious, gt_ignore, IOU_THRS)
    if native is not None:
        dtm, dt_ig = native
    else:  # pure-python fallback (same semantics as native yl_coco_match)
        dtm = np.zeros((T, D), np.int32)      # matched gt index + 1, 0 = unmatched
        dt_ig = np.zeros((T, D), bool)
        gtm = np.zeros((T, G), bool)
        for ti, thr in enumerate(IOU_THRS):
            for di in range(D):
                best = min(thr, 1.0 - 1e-10)
                m = -1
                for gi in range(G):
                    if gtm[ti, gi]:
                        continue
                    # stop at ignored GTs once a non-ignored match exists
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
                gtm[ti, m] = True
    # unmatched dets outside the area range are ignored
    d_areas = np.maximum(dt_boxes[:, 2] * dt_boxes[:, 3], 0.0)
    out_rng = (d_areas < arng_lo) | (d_areas > arng_hi)
    dt_ig = dt_ig | ((dtm == 0) & out_rng[None, :])
    npig = int(np.sum(~gt_ignore))
    return (dtm > 0) & ~dt_ig, dt_ig, dt_scores, npig


class COCOEvaluator:
    """Accumulates GT/DT lists and computes COCO stats."""

    def __init__(self, num_classes: Optional[int] = None,
                 iou_type: str = "bbox"):
        """iou_type: "bbox" or "segm". For "segm", anns and dets must carry a
        "mask" key with a binary np.ndarray (any common per-image resolution);
        GT area comes from the mask (instance-segmentation mAP)."""
        self.num_classes = num_classes
        self.iou_type = iou_type

    def evaluate(self, coco_images: List[dict], coco_anns: List[dict],
                 coco_dets: List[dict]) -> Dict[str, float]:
        zeros = {"AP": 0.0, "AP50": 0.0, "AP75": 0.0, "APS": 0.0, "APM": 0.0,
                 "APL": 0.0, "AR": 0.0, "ARS": 0.0, "ARM": 0.0, "ARL": 0.0}
        if not coco_dets or not coco_anns:
            return zeros

        cats = sorted({int(a["category_id"]) for a in coco_anns})
        img_ids = sorted({int(im["id"]) for im in coco_images}) if coco_images \
            else sorted({int(a["image_id"]) for a in coco_anns} |
                        {int(d["image_id"]) for d in coco_dets})

        gt_by = defaultdict(list)
        for a in coco_anns:
            gt_by[(int(a["image_id"]), int(a["category_id"]))].append(a)
        dt_by = defaultdict(list)
        for d in coco_dets:
            dt_by[(int(d["image_id"]), int(d["category_id"]))].append(d)

        T, R = len(IOU_THRS), len(REC_THRS)
        K, A = len(cats), len(AREA_RNG)
        precision = -np.ones((T, R, K, A))
        recall = -np.ones((T, K, A))

        area_items = list(AREA_RNG.items())
        for ki, cat in enumerate(cats):
            # gather per-image match results once per area range
            for ai, (aname, arng) in enumerate(area_items):
                all_scores, all_tp, all_ig = [], [], []
                npig_total = 0
                for img in img_ids:
                    gts = gt_by.get((img, cat), [])
                    dts = dt_by.get((img, cat), [])
                    if not gts and not dts:
                        continue
                    gt_boxes = np.asarray([g["bbox"] for g in gts], np.float64).reshape(-1, 4)
                    gt_areas = np.asarray([g.get("area", g["bbox"][2] * g["bbox"][3])
                                           for g in gts], np.float64)
                    dt_boxes = np.asarray([d["bbox"] for d in dts], np.float64).reshape(-1, 4)
                    dt_scores = np.asarray([d["score"] for d in dts], np.float64)
                    iou_m = None
                    if self.iou_type == "segm":
                        gm = _dense_masks(gts)
                        dm = _dense_masks(dts)
                        iou_m = mask_iou_matrix(dm, gm)
                        if len(gts):
                            # area ranges bin by SEGMENTATION area, scaled from
                            # mask resolution to image pixels (full-res RLE
                            # masks need no scaling: scale == 1)
                            im_w = im_h = None
                            for im in coco_images:
                                if int(im["id"]) == img:
                                    im_w, im_h = im.get("width"), im.get("height")
                                    break
                            scale = 1.0
                            if im_w and gm.shape[1] > 0:
                                scale = (float(im_w) / gm.shape[2]) * \
                                        (float(im_h) / gm.shape[1])
                            gt_areas = gm.reshape(len(gm), -1).sum(1) * scale
                    tp, ig, scores, npig = _evaluate_img(dt_boxes, dt_scores,
                                                         gt_boxes, gt_areas,
                                                         arng, MAX_DETS, iou_m)
                    all_scores.append(scores)
                    all_tp.append(tp)
                    all_ig.append(ig)
                    npig_total += npig
                if npig_total == 0:
                    continue
                if all_scores:
                    scores = np.concatenate(all_scores)
                    order = np.argsort(-scores, kind="mergesort")
                    tp = np.concatenate(all_tp, axis=1)[:, order]
                    ig = np.concatenate(all_ig, axis=1)[:, order]
                else:
                    tp = np.zeros((T, 0), bool)
                    ig = np.zeros((T, 0), bool)
                fp = (~tp) & (~ig)
                tp_cum = np.cumsum(tp, axis=1).astype(np.float64)
                fp_cum = np.cumsum(fp, axis=1).astype(np.float64)
                for ti in range(T):
                    tps, fps = tp_cum[ti], fp_cum[ti]
                    nd = len(tps)
                    rc = tps / npig_total
                    pr = tps / np.maximum(tps + fps, np.spacing(1))
                    recall[ti, ki, ai] = rc[-1] if nd else 0.0
                    # make precision monotonically decreasing (backwards max)
                    q = np.zeros(R)
                    if nd:
                        pr = pr.copy()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        valid = inds < nd
                        q[valid] = pr[inds[valid]]
                    precision[ti, :, ki, ai] = q

        def _ap(t_slice=slice(None), area="all"):
            ai = list(AREA_RNG.keys()).index(area)
            p = precision[t_slice, :, :, ai]
            p = p[p > -1]
            # pycocotools summarize() returns -1 when no GT falls in the range
            return float(np.mean(p)) if p.size else -1.0

        def _ar(area="all"):
            ai = list(AREA_RNG.keys()).index(area)
            r = recall[:, :, ai]
            r = r[r > -1]
            return float(np.mean(r)) if r.size else -1.0

        i50 = int(np.argmin(np.abs(IOU_THRS - 0.5)))
        i75 = int(np.argmin(np.abs(IOU_THRS - 0.75)))
        return {
            "AP": _ap(), "AP50": _ap(slice(i50, i50 + 1)), "AP75": _ap(slice(i75, i75 + 1)),
            "APS": _ap(area="small"), "APM": _ap(area="medium"), "APL": _ap(area="large"),
            "AR": _ar(), "ARS": _ar("small"), "ARM": _ar("medium"), "ARL": _ar("large"),
        }


def coco_eval_from_lists(coco_images, coco_anns, coco_dets, iouType="bbox",
                         num_classes=None) -> Dict[str, float]:
    """Drop-in equivalent of the reference `_coco_eval_from_lists`
    (helpers.py:155-227). Prefers pycocotools when importable for bit-exact
    parity; otherwise uses the native evaluator above."""
    try:  # pragma: no cover - exercised only where pycocotools exists
        from pycocotools.coco import COCO  # noqa: F401
        return _pycoco_eval(coco_images, coco_anns, coco_dets, iouType, num_classes)
    except ImportError:
        return COCOEvaluator(num_classes).evaluate(coco_images, coco_anns, coco_dets)


def _pycoco_eval(coco_images, coco_anns, coco_dets, iouType, num_classes):  # pragma: no cover
    import json
    import os
    import tempfile
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    if not coco_dets:
        return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0, "APS": 0.0, "APM": 0.0,
                "APL": 0.0, "AR": 0.0, "ARS": 0.0, "ARM": 0.0, "ARL": 0.0}
    if num_classes is None:
        num_classes = max((a["category_id"] for a in coco_anns), default=1)
    categories = [{"id": i, "name": str(i)} for i in range(1, int(num_classes) + 1)]
    gt_fd, gt_path = tempfile.mkstemp(suffix=".json")
    dt_fd, dt_path = tempfile.mkstemp(suffix=".json")
    try:
        with os.fdopen(gt_fd, "w") as fg:
            json.dump({"info": {}, "licenses": [], "images": coco_images,
                       "annotations": coco_anns, "categories": categories}, fg)
        with os.fdopen(dt_fd, "w") as fr:
            json.dump(coco_dets, fr)
        coco_gt = COCO(gt_path)
        coco_dt = coco_gt.loadRes(dt_path)
        E = COCOeval(coco_gt, coco_dt, iouType=iouType)
        E.evaluate(); E.accumulate(); E.summarize()
        return {"AP": float(E.stats[0]), "AP50": float(E.stats[1]),
                "AP75": float(E.stats[2]), "APS": float(E.stats[3]),
                "APM": float(E.stats[4]), "APL": float(E.stats[5]),
                "AR": float(E.stats[8]), "ARS": float(E.stats[9]),
                "ARM": float(E.stats[10]), "ARL": float(E.stats[11])}
    finally:
        for p in (gt_path, dt_path):
            try:
                os.remove(p)
            except OSError:
                pass
