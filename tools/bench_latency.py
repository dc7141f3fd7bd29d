#!/usr/bin/env python
"""Inference latency bench with per-stage statistics.

Parity with the reference ONNX latency bench (export/infer_onnx.py:85-308):
warmup + multi-run timing over a folder of images (or synthetic frames),
per-stage preprocess/inference/postprocess stats (mean/std/p50/p90/p95) and
throughput, written to timings.json + timings.csv (:290-303 report format).

    python tools/bench_latency.py --weights best.ckpt [--images dir] [--runs 100]
"""

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _stats(values):
    a = np.asarray(values, np.float64)
    return {"mean": float(a.mean()), "std": float(a.std()),
            "p50": float(np.percentile(a, 50)),
            "p90": float(np.percentile(a, 90)),
            "p95": float(np.percentile(a, 95)),
            "min": float(a.min()), "max": float(a.max())}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--images", default=None, help="image dir (default: synthetic)")
    ap.add_argument("--img_size", type=int, default=None)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iou", type=float, default=0.45)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--runs", type=int, default=100)
    ap.add_argument("--out_dir", default=None)
    args = ap.parse_args()

    import cv2
    from yololite_tpu.config.config import next_run_dir
    from yololite_tpu.deploy.predictor import Predictor

    out_dir = args.out_dir or next_run_dir("runs/bench")
    os.makedirs(out_dir, exist_ok=True)
    pred = Predictor(args.weights)
    img_size = int(args.img_size or pred.img_size)

    frames = []
    if args.images:
        files = sorted(os.listdir(args.images))[: args.runs]
        for f in files:
            im = cv2.imread(os.path.join(args.images, f))
            if im is not None:
                frames.append(im)
    if not frames:
        rng = np.random.RandomState(0)
        frames = [(rng.rand(img_size, img_size, 3) * 255).astype(np.uint8)
                  for _ in range(min(args.runs, 16))]

    for i in range(args.warmup):
        pred.infer_image_profiled(frames[i % len(frames)], img_size,
                                  args.conf, args.iou)

    pre, inf, post, total = [], [], [], []
    for i in range(args.runs):
        r = pred.infer_image_profiled(frames[i % len(frames)], img_size,
                                      args.conf, args.iou)
        s = r["speed"]
        pre.append(s["preprocess_ms"])
        inf.append(s["inference_ms"])
        post.append(s["postprocess_ms"])
        total.append(s["total_ms"])

    report = {
        "weights": os.path.abspath(args.weights),
        "img_size": img_size, "runs": args.runs,
        "device": "tpu",
        "preprocess_ms": _stats(pre),
        "inference_ms": _stats(inf),
        "postprocess_ms": _stats(post),
        "total_ms": _stats(total),
        "throughput_img_s": 1000.0 / float(np.mean(total)),
    }
    with open(os.path.join(out_dir, "timings.json"), "w") as f:
        json.dump(report, f, indent=2)
    with open(os.path.join(out_dir, "timings.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["stage", "mean", "std", "p50", "p90", "p95", "min", "max"])
        for stage in ("preprocess_ms", "inference_ms", "postprocess_ms", "total_ms"):
            s = report[stage]
            w.writerow([stage] + [f"{s[k]:.4f}" for k in
                                  ("mean", "std", "p50", "p90", "p95", "min", "max")])
    print(json.dumps({k: report[k] for k in
                      ("total_ms", "throughput_img_s")}, indent=2))
    print(f"Report -> {out_dir}")


if __name__ == "__main__":
    main()
