#!/usr/bin/env python
"""Offline weather augmentation CLI (parity with reference
augmentation/augment_weather.py:278-298).

    python tools/augment_weather.py --images ds/train/images --labels ds/train/labels \
        --out ds_weather --effects rain fog --per_image 2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yololite_tpu.data.weather import EFFECTS, augment_coco, augment_yolo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--labels", default=None, help="YOLO label dir")
    ap.add_argument("--coco_json", default=None, help="COCO annotations json")
    ap.add_argument("--out", required=True)
    ap.add_argument("--effects", nargs="+", default=list(EFFECTS),
                    choices=list(EFFECTS))
    ap.add_argument("--per_image", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.coco_json:
        n = augment_coco(args.images, args.coco_json, args.out, args.effects,
                         args.per_image, args.seed)
    else:
        labels = args.labels or os.path.join(os.path.dirname(args.images), "labels")
        n = augment_yolo(args.images, labels, args.out, args.effects,
                         args.per_image, args.seed)
    print(f"Wrote {n} augmented images to {args.out}")


if __name__ == "__main__":
    main()
