"""COCO-json dataset ingestion (data/coco_ingest.py + config wiring)."""

import json
import os

import cv2
import numpy as np
import yaml

from yololite_tpu.data.coco_ingest import coco_to_yolo_labels


def _make_coco_ds(root, n=4, size=64):
    img_dir = os.path.join(root, "images", "train")
    os.makedirs(img_dir, exist_ok=True)
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    images, anns = [], []
    aid = 1
    for i in range(n):
        img = np.full((size, size, 3), 30, np.uint8)
        img[10:30, 10:40] = (200, 40, 40)
        cv2.imwrite(os.path.join(img_dir, f"im{i}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"im{i}.jpg",
                       "width": size, "height": size})
        # bbox annotation (category 7 -> remapped 0)
        anns.append({"id": aid, "image_id": i + 1, "category_id": 7,
                     "bbox": [10, 10, 30, 20], "area": 600,
                     "iscrowd": 0, "segmentation": []})
        aid += 1
        # polygon annotation (category 9 -> remapped 1): a triangle
        anns.append({"id": aid, "image_id": i + 1, "category_id": 9,
                     "bbox": [40, 40, 16, 16], "area": 128, "iscrowd": 0,
                     "segmentation": [[40, 40, 56, 40, 48, 56]]})
        aid += 1
    coco = {"images": images, "annotations": anns,
            "categories": [{"id": 9, "name": "tri"}, {"id": 7, "name": "box"}]}
    jp = os.path.join(ann_dir, "instances_train.json")
    with open(jp, "w") as f:
        json.dump(coco, f)
    return img_dir, jp


def test_coco_to_yolo_conversion_and_cache(tmp_path):
    root = str(tmp_path)
    img_dir, jp = _make_coco_ds(root)
    lbl_dir, names = coco_to_yolo_labels(jp)
    assert names == ["box", "tri"]  # remapped by ascending original id
    lines = open(os.path.join(lbl_dir, "im0.txt")).read().strip().split("\n")
    assert len(lines) == 2
    # bbox line: class 0, cx=(10+15)/64
    parts = [float(v) for v in lines[0].split()]
    assert parts[0] == 0 and abs(parts[1] - 25 / 64) < 1e-5 \
        and abs(parts[3] - 30 / 64) < 1e-5
    # polygon line: class 1, 3 points
    pparts = [float(v) for v in lines[1].split()]
    assert pparts[0] == 1 and len(pparts) == 7
    # cached second call: no re-write (compare mtime)
    m0 = os.path.getmtime(os.path.join(lbl_dir, "im0.txt"))
    lbl2, _ = coco_to_yolo_labels(jp)
    assert lbl2 == lbl_dir
    assert os.path.getmtime(os.path.join(lbl_dir, "im0.txt")) == m0


def test_load_configs_with_coco_json(tmp_path):
    from yololite_tpu.config import load_configs
    from yololite_tpu.data.dataset import YoloDataset

    root = str(tmp_path)
    img_dir, jp = _make_coco_ds(root)
    dy = os.path.join(root, "data.yaml")
    with open(dy, "w") as f:
        yaml.safe_dump({"train": "images/train", "val": "images/train",
                        "train_json": "annotations/instances_train.json",
                        "val_json": "annotations/instances_train.json"}, f)
    cfg = load_configs(None, None, dy, make_run_dir=False)
    assert cfg["dataset"]["names"] == ["box", "tri"]
    assert cfg["model"]["num_classes"] == 2
    ds = YoloDataset(cfg["dataset"]["train_images"],
                     cfg["dataset"]["train_labels"], img_size=64,
                     is_train=False, augment=False, max_boxes=10)
    s = ds.get(0)
    m = s["mask"]
    assert m.sum() == 2  # both annotations survive (polygon collapsed to bbox)
    boxes = s["boxes"][m]
    assert np.all(boxes[:, 2] > boxes[:, 0]) and np.all(boxes[:, 3] > boxes[:, 1])
