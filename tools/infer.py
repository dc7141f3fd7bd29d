#!/usr/bin/env python
"""Inference CLI (parity with reference tools/infer.py:395-557).

Loads a checkpoint (model rebuilt from its self-describing meta), runs
letterbox -> jitted forward+decode+NMS -> back-maps boxes to original pixels,
draws predictions and saves JPG + optional YOLO-txt + JSON per image into
runs/infer/<n>.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--img", required=True, help="image file or directory")
    ap.add_argument("--img_size", type=int, default=None)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.45)
    ap.add_argument("--max_det", type=int, default=300)
    ap.add_argument("--use_resize", action="store_true",
                    help="plain resize instead of letterbox")
    ap.add_argument("--save_txt", action="store_true", help="save YOLO-txt labels")
    ap.add_argument("--save_json", action="store_true")
    ap.add_argument("--out_dir", default=None)
    args = ap.parse_args()

    import cv2
    from yololite_tpu.config.config import next_run_dir
    from yololite_tpu.deploy.predictor import Predictor
    from yololite_tpu.utils.viz import draw_detections

    out_dir = args.out_dir or next_run_dir("runs/infer")
    os.makedirs(out_dir, exist_ok=True)
    pred = Predictor(args.weights, use_letterbox=not args.use_resize)

    if os.path.isdir(args.img):
        files = sorted(
            os.path.join(args.img, f) for f in os.listdir(args.img)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    else:
        files = [args.img]

    for path in files:
        img_bgr = cv2.imread(path)
        if img_bgr is None:
            print(f"[skip] cannot read {path}")
            continue
        r = pred.infer_image_profiled(img_bgr, args.img_size, args.conf,
                                      args.iou, args.max_det)
        stem = os.path.splitext(os.path.basename(path))[0]
        vis = draw_detections(cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB),
                              r["boxes"], r["scores"], r["classes"], pred.names)
        cv2.imwrite(os.path.join(out_dir, f"{stem}_pred.jpg"),
                    cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        h, w = img_bgr.shape[:2]
        if args.save_txt:
            with open(os.path.join(out_dir, f"{stem}.txt"), "w") as f:
                for box, cl in zip(r["boxes"], r["classes"]):
                    x1, y1, x2, y2 = box
                    cx, cy = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
                    bw, bh = (x2 - x1) / w, (y2 - y1) / h
                    f.write(f"{int(cl)} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n")
        if args.save_json:
            with open(os.path.join(out_dir, f"{stem}.json"), "w") as f:
                json.dump({"source": path,
                           "boxes": r["boxes"].tolist(),
                           "scores": r["scores"].tolist(),
                           "classes": r["classes"].tolist(),
                           "speed": r["speed"]}, f, indent=2)
        n = len(r["boxes"])
        print(f"{path}: {n} dets | {r['speed']['total_ms']:.1f} ms "
              f"(infer {r['speed']['inference_ms']:.1f})")
    print(f"Saved to {out_dir}")


if __name__ == "__main__":
    main()
