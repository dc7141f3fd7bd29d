#!/usr/bin/env python
"""Generate a synthetic multi-class detection dataset (YOLO layout).

Offline dataset generator for framework validation and benchmarking without
network access: 4 shape classes (rect, triangle, circle, ellipse) over textured
noise backgrounds with distractor strokes, 1-6 instances per image with scale
variety and partial overlap. Labels are YOLO-txt; polygons are written for the
triangle class so the file also exercises the segmentation parser.

    python tools/make_synth_dataset.py --out /tmp/synth --n_train 240 --img 320
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import cv2
import yaml

CLASSES = ["rect", "triangle", "circle", "ellipse"]
COLORS = [(220, 40, 40), (40, 220, 40), (60, 80, 230), (230, 220, 40)]


def draw_instance(canvas, cls, rng, img):
    size = int(rng.randint(14, max(16, img // 3)))
    x1 = int(rng.randint(0, img - size))
    y1 = int(rng.randint(0, img - size))
    color = tuple(int(c + rng.randint(-25, 26)) for c in COLORS[cls])
    if cls == 0:
        w, h = size, int(size * rng.uniform(0.5, 1.5))
        h = min(h, img - 1 - y1)
        cv2.rectangle(canvas, (x1, y1), (x1 + w, y1 + h), color, -1)
        return (x1, y1, x1 + w, y1 + h), None
    if cls == 1:
        pts = np.array([(x1, y1 + size), (x1 + size, y1 + size),
                        (x1 + size // 2, y1)], np.int32)
        cv2.fillPoly(canvas, [pts], color)
        return (x1, y1, x1 + size, y1 + size), pts
    if cls == 2:
        r = size // 2
        cv2.circle(canvas, (x1 + r, y1 + r), r, color, -1)
        return (x1, y1, x1 + 2 * r, y1 + 2 * r), None
    a, b = size // 2, int(size * rng.uniform(0.25, 0.5))
    cv2.ellipse(canvas, (x1 + a, y1 + b), (a, b), 0, 0, 360, color, -1)
    return (x1, y1, x1 + 2 * a, y1 + 2 * b), None


def make_split(root, split, n, img, rng, seg_polygons=False):
    idir = os.path.join(root, split, "images")
    ldir = os.path.join(root, split, "labels")
    os.makedirs(idir, exist_ok=True)
    os.makedirs(ldir, exist_ok=True)
    for i in range(n):
        canvas = (rng.rand(img, img, 3) * 60 + rng.randint(0, 40)).astype(np.uint8)
        # distractor strokes
        for _ in range(rng.randint(0, 5)):
            p1 = tuple(rng.randint(0, img, 2).tolist())
            p2 = tuple(rng.randint(0, img, 2).tolist())
            cv2.line(canvas, p1, p2, tuple(int(v) for v in rng.randint(60, 140, 3)), 1)
        lines = []
        for _ in range(rng.randint(1, 7)):
            cls = int(rng.randint(len(CLASSES)))
            (x1, y1, x2, y2), poly = draw_instance(canvas, cls, rng, img)
            if seg_polygons and poly is not None:
                coords = " ".join(f"{px / img:.6f} {py / img:.6f}" for px, py in poly)
                lines.append(f"{cls} {coords}")
            else:
                cx, cy = (x1 + x2) / 2 / img, (y1 + y2) / 2 / img
                w, h = (x2 - x1) / img, (y2 - y1) / img
                lines.append(f"{cls} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
        cv2.imwrite(os.path.join(idir, f"{i:05d}.jpg"),
                    cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
        with open(os.path.join(ldir, f"{i:05d}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_train", type=int, default=240)
    ap.add_argument("--n_val", type=int, default=60)
    ap.add_argument("--img", type=int, default=320)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seg_polygons", action="store_true")
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    make_split(args.out, "train", args.n_train, args.img, rng, args.seg_polygons)
    make_split(args.out, "valid", args.n_val, args.img, rng, args.seg_polygons)
    data_yaml = os.path.join(args.out, "data.yaml")
    with open(data_yaml, "w") as f:
        yaml.safe_dump({"train": f"{args.out}/train/images",
                        "val": f"{args.out}/valid/images",
                        "nc": len(CLASSES), "names": CLASSES}, f)
    print(data_yaml)


if __name__ == "__main__":
    main()
