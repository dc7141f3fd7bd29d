#!/usr/bin/env python
"""Inference from an exported artifact (no model code needed).

Parity with the reference's deployed ONNX inference CLIs
(export/infer_onnx.py, export/infer_onnx_decoded.py): loads the exported
artifact (.stablehlo, .tflite, or .onnx) + its meta.json sidecar, runs
letterbox preprocessing, executes the artifact, applies host-side
postprocessing for the "decoded" format (sigmoid + score + per-class NMS via
the native C++ kernel) or unpacks the baked-in NMS for the "nms" format,
back-maps boxes, draws, and reports per-stage timings.

    python tools/infer_exported.py --artifact model_decoded.stablehlo --img x.jpg
    python tools/infer_exported.py --artifact model_decoded.onnx --img x.jpg
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def postprocess_decoded(out, conf, iou, max_det):
    """Host postproc for the 'decoded' format (boxes + logits, NMS outside).
    Returns (boxes, scores, classes, kept_indices) — indices into the
    pre-NMS anchor axis, used to select mask coefficients for seg models."""
    from yololite_tpu.ops.nms import nms_numpy
    boxes = np.asarray(out["boxes_xyxy"])[0]
    obj = 1.0 / (1.0 + np.exp(-np.asarray(out["obj_logits"])[0, :, 0]))
    cls = 1.0 / (1.0 + np.exp(-np.asarray(out["cls_logits"])[0]))
    if cls.shape[-1] > 0:
        confs = cls.max(-1)
        clsi = cls.argmax(-1)
        scores = obj * confs
    else:
        scores = obj
        clsi = np.zeros_like(obj, np.int64)
    m = scores > conf
    orig = np.nonzero(m)[0]
    boxes, scores, clsi = boxes[m], scores[m], clsi[m]
    fb, fs, fc, fi = [], [], [], []
    for c in np.unique(clsi):
        cm = clsi == c
        keep = nms_numpy(boxes[cm], scores[cm], iou)
        fb.append(boxes[cm][keep])
        fs.append(scores[cm][keep])
        fc.append(np.full(len(keep), c))
        fi.append(orig[cm][keep])
    if not fb:
        return (np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
                np.zeros(0, np.int64), np.zeros(0, np.int64))
    boxes = np.concatenate(fb)
    scores = np.concatenate(fs)
    clsi = np.concatenate(fc)
    idx = np.concatenate(fi)
    order = np.argsort(-scores)[:max_det]
    return boxes[order], scores[order], clsi[order], idx[order]


def masks_to_original(pm, px, py, img_size, w, h):
    """Proto-res mask probs [D,Hp,Wp] in letterbox space -> binary masks at
    original resolution (crop pad, resize, threshold 0.5)."""
    import cv2
    if not len(pm):
        return np.zeros((0, h, w), np.uint8)
    hp = pm.shape[1]
    r = hp / float(img_size)
    ya, xa = int(round(py * r)), int(round(px * r))
    yb = int(round((img_size - py) * r))
    xb = int(round((img_size - px) * r))
    crop = pm[:, ya:max(ya + 1, yb), xa:max(xa + 1, xb)]
    return np.stack([
        (cv2.resize(cm, (w, h), interpolation=cv2.INTER_LINEAR) > 0.5)
        .astype(np.uint8) for cm in crop])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True, help="*.stablehlo path")
    ap.add_argument("--img", required=True)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.45)
    ap.add_argument("--max_det", type=int, default=300)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import cv2
    from yololite_tpu.deploy.export import load_exported
    from yololite_tpu.ops.letterbox import letterbox_image, unletterbox_boxes
    from yololite_tpu.utils.viz import draw_detections

    call, meta = load_exported(args.artifact)
    fmt = meta.get("format", "decoded")
    img_size = int(meta.get("img_size", 640))

    img_bgr = cv2.imread(args.img)
    if img_bgr is None:
        raise SystemExit(f"cannot read {args.img}")
    h, w = img_bgr.shape[:2]

    t0 = time.perf_counter()
    rgb = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
    canvas, scale, px, py = letterbox_image(rgb, img_size)
    t1 = time.perf_counter()
    out = call(canvas[None])
    import jax
    jax.block_until_ready(out)
    t2 = time.perf_counter()

    masks = None
    if fmt == "nms":
        # iou/max_det were baked into the artifact at export time; --conf is
        # still honored with a host-side score filter on the unpacked outputs.
        seq = list(out)  # all runners return nms outputs as an ordered tuple
        b, s, c, v = (np.asarray(x) for x in seq[:4])
        m = v[0].astype(bool) & (s[0] >= args.conf)
        boxes, scores, classes = b[0][m], s[0][m], c[0][m]
        if len(seq) > 4:  # segmentation artifact: in-graph assembled masks
            masks = masks_to_original(np.asarray(seq[4])[0][m], px, py,
                                      img_size, w, h)
        if args.iou != ap.get_default("iou"):
            print(f"[warn] --iou is fixed at export time for 'nms' artifacts "
                  f"(artifact iou={meta.get('iou_th')})")
    elif fmt == "decoded":
        boxes, scores, classes, kept = postprocess_decoded(
            out, args.conf, args.iou, args.max_det)
        if "mask_coef" in out:  # segmentation: host-side YOLACT assembly
            from yololite_tpu.ops.masks import assemble_masks_np
            coef = np.asarray(out["mask_coef"])[0][kept]
            protos = np.asarray(out["protos"])[0]
            pm = assemble_masks_np(protos, coef, boxes, float(img_size))
            masks = masks_to_original(pm, px, py, img_size, w, h)
    else:
        raise SystemExit(f"format {fmt!r} has no generic postproc "
                         "(use 'decoded' or 'nms')")
    boxes = unletterbox_boxes(boxes, scale, px, py, w, h)
    t3 = time.perf_counter()

    nmask = f" | {len(masks)} masks" if masks is not None else ""
    print(f"{len(boxes)} detections{nmask} | pre {1e3*(t1-t0):.1f} ms | "
          f"infer {1e3*(t2-t1):.1f} ms | post {1e3*(t3-t2):.1f} ms")
    for box, sc, cl in zip(boxes, scores, classes):
        print(f"  cls {int(cl)} {sc:.3f} {box.round(1).tolist()}")
    if args.out:
        vis = draw_detections(rgb, boxes, scores, classes, meta.get("names"))
        cv2.imwrite(args.out, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
