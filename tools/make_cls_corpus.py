"""Synthetic classification imagefolder for first-party backbone pretraining.

The reference's published accuracy rides on ImageNet-pretrained timm
backbones (`/root/reference/scripts/model/model_v2.py:84` passes
`pretrained=True` unconditionally). No torch checkpoints are downloadable in
this offline environment, so the pretrain->fine-tune regime is exercised
end-to-end with a first-party corpus instead: single-instance classification
images over the SAME 20 shape x texture classes as HardSynth-20, rendered
with the same drawing primitives but an independent seed stream, fresh
backgrounds and free scale/placement. `tools/pretrain_backbone.py` consumes
the torchvision-ImageFolder layout this writes
(root/train/<class>/*.jpg, root/val/<class>/*.jpg).

Usage:
  python tools/make_cls_corpus.py --out /tmp/cls20 --per_class 400 --img 160
"""

from __future__ import annotations

import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_hard_synth import (CLASSES, _clutter_background, _shape_mask,
                             _texture_patch)


def render_one(rng: np.random.RandomState, cls_id: int, img_px: int):
    img = _clutter_background(rng, img_px, img_px)
    shape, texture = CLASSES[cls_id].split("_")
    # object fills 30-90% of the frame, anywhere fully inside it
    size = int(img_px * rng.uniform(0.3, 0.9))
    x1 = rng.randint(0, img_px - size)
    y1 = rng.randint(0, img_px - size)
    hue = rng.rand(3) * 200 + 30
    hue2 = np.clip(hue + (rng.rand(3) * 160 - 80), 0, 255)
    patch = _texture_patch(rng, size, texture, hue, hue2)
    mask = _shape_mask(rng, size, shape)
    region = img[y1:y1 + size, x1:x1 + size]
    region[mask > 0] = patch[mask > 0]
    # photometric nuisance matching the detection suite
    img = img * rng.uniform(0.7, 1.3) + rng.uniform(-25, 25)
    img += rng.randn(img_px, img_px, 3) * rng.uniform(0, 8)
    img = np.clip(img, 0, 255).astype(np.uint8)
    if rng.rand() < 0.25:
        img = cv2.GaussianBlur(img, (3, 3), 0)
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--per_class", type=int, default=400)
    ap.add_argument("--val_per_class", type=int, default=50)
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--seed", type=int, default=77)
    a = ap.parse_args()

    rng = np.random.RandomState(a.seed)
    for split, n in (("train", a.per_class), ("val", a.val_per_class)):
        for ci, cname in enumerate(CLASSES):
            d = os.path.join(a.out, split, cname)
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                img = render_one(rng, ci, a.img)
                cv2.imwrite(os.path.join(d, f"{i:05d}.jpg"), img)
        print(f"{split}: {n} images x {len(CLASSES)} classes")
    print("done ->", a.out)


if __name__ == "__main__":
    main()
