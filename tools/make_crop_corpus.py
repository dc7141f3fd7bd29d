#!/usr/bin/env python
"""Build a classification imagefolder corpus from a YOLO detection dataset.

Feeds `tools/pretrain_backbone.py` when no downloadable classification corpus
exists (offline environments): every GT box becomes one crop (with context
margin) under out/train/<class>/ or out/val/<class>/, mirroring the
torchvision ImageFolder layout. This is the in-repo stand-in for the
ImageNet-pretraining regime the reference inherits from timm
(reference scripts/model/model_v2.py:84 `pretrained=True`).

    python tools/make_crop_corpus.py --data /tmp/hardsynth20 --out /tmp/crops \
        --margin 0.25 --min_px 10 --max_per_class 2000
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def extract_split(img_dir, lab_dir, out_root, names, margin, min_px,
                  max_per_class, rng):
    import cv2
    counts = np.zeros(len(names), np.int64)
    files = sorted(f for f in os.listdir(img_dir)
                   if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    rng.shuffle(files)
    for fn in files:
        lab = os.path.join(lab_dir, os.path.splitext(fn)[0] + ".txt")
        if not os.path.exists(lab):
            continue
        img = cv2.imread(os.path.join(img_dir, fn))
        if img is None:
            continue
        h, w = img.shape[:2]
        with open(lab) as f:
            rows = [ln.split() for ln in f.read().splitlines() if ln.strip()]
        for ri, r in enumerate(rows):
            ci = int(float(r[0]))
            if ci < 0 or ci >= len(names):
                print(f"[WARN] {lab}: row {ri} class id {ci} outside "
                      f"names[0..{len(names) - 1}], skipped")
                continue
            if counts[ci] >= max_per_class:
                continue
            # seg rows are `cls x1 y1 x2 y2 ...` polygons; box rows are
            # `cls cx cy bw bh` — take the bbox of whatever coords follow
            vals = np.asarray([float(v) for v in r[1:]], np.float32)
            if vals.size == 4:
                cx, cy, bw, bh = vals
                x1, y1 = (cx - bw / 2) * w, (cy - bh / 2) * h
                x2, y2 = (cx + bw / 2) * w, (cy + bh / 2) * h
            else:
                xs, ys = vals[0::2] * w, vals[1::2] * h
                x1, y1, x2, y2 = xs.min(), ys.min(), xs.max(), ys.max()
            mx, my = margin * (x2 - x1), margin * (y2 - y1)
            xa = max(0, int(x1 - mx)); ya = max(0, int(y1 - my))
            xb = min(w, int(x2 + mx) + 1); yb = min(h, int(y2 + my) + 1)
            if xb - xa < min_px or yb - ya < min_px:
                continue
            cdir = os.path.join(out_root, names[ci])
            os.makedirs(cdir, exist_ok=True)
            cv2.imwrite(os.path.join(
                cdir, f"{os.path.splitext(fn)[0]}_{ri}.jpg"), img[ya:yb, xa:xb])
            counts[ci] += 1
    return counts


def main():
    import yaml
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="YOLO dataset root (data.yaml with train/val/names)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--margin", type=float, default=0.25,
                    help="context margin as a fraction of box size")
    ap.add_argument("--min_px", type=int, default=10,
                    help="skip crops smaller than this on either side")
    ap.add_argument("--max_per_class", type=int, default=2000,
                    help="cap per class per split (class-imbalance guard)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    with open(os.path.join(args.data, "data.yaml")) as f:
        dy = yaml.safe_load(f)
    from yololite_tpu.config.config import _labels_or_fallback

    names = [str(n) for n in dy["names"]]
    rng = np.random.RandomState(args.seed)
    data_yaml = os.path.join(args.data, "data.yaml")
    for split, key in (("train", "train"), ("val", "val")):
        if key not in dy:
            print(f"[WARN] data.yaml has no '{key}' split, skipped")
            continue
        img_dir = dy[key]
        if not os.path.isabs(img_dir):
            img_dir = os.path.join(args.data, img_dir)
        # same label-dir resolution as the trainer (config/config.py)
        lab_dir = _labels_or_fallback("", img_dir, key, data_yaml)
        if not os.path.isdir(img_dir) or not os.path.isdir(lab_dir):
            print(f"[WARN] {split}: missing images/labels dir "
                  f"({img_dir} / {lab_dir}), skipped")
            continue
        counts = extract_split(img_dir, lab_dir,
                               os.path.join(args.out, split), names,
                               args.margin, args.min_px, args.max_per_class,
                               rng)
        print(f"{split}: {int(counts.sum())} crops, "
              f"per-class min/max {int(counts.min())}/{int(counts.max())}")


if __name__ == "__main__":
    main()
