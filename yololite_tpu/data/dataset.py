"""YOLO-format dataset with RAM label cache, Mosaic and CutMix.

Parity with the reference `YoloDataset` (scripts/data/dataset.py:10-272):
  - scans the image dir for {jpg,jpeg,png,bmp,tif,tiff}, sorted (:17-32)
  - caches ALL YOLO-txt labels into RAM as [N,5] float arrays at init (:42-81);
    polygon (segmentation) rows are collapsed to bboxes (:62-67)
  - xywhn -> xyxy pixel conversion at load (:94-112)
  - Mosaic 2x2 at p=0.2 on a 2s x 2s canvas of square-resized tiles (:124-175)
  - CutMix-smallest-object paste at p in [0.2, 0.4) with alpha=0.7 (:179-230)
  - corrupt-image fallback returns an empty target instead of crashing (:268-272)

TPU-first difference: `__getitem__` returns FIXED-SHAPE padded targets
(image uint8 [S,S,3], boxes f32 [maxN,4], labels i32 [maxN], mask bool [maxN])
so batches stack into static-shape device arrays — no ragged tensors on TPU.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

import cv2

from yololite_tpu.data.augment import TrainTransform, ValTransform

VALID_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff"}


def list_images(img_dir: str) -> List[str]:
    files = []
    if os.path.exists(img_dir):
        with os.scandir(str(img_dir)) as entries:
            for e in entries:
                if e.is_file() and os.path.splitext(e.name)[1].lower() in VALID_EXTS:
                    files.append(e.path)
    files.sort()
    return files


def parse_yolo_seg_file(path: str):
    """Parse a YOLO txt keeping polygons: list of (cls, pts [P,2] normalized).
    Plain box rows become their rectangle polygon (segmentation task support)."""
    out = []
    try:
        with open(path, "r") as f:
            lines = f.readlines()
        for line in lines:
            parts = line.strip().split()
            if len(parts) >= 5:
                cls = int(float(parts[0]))
                coords = np.array([float(x) for x in parts[1:]], dtype=np.float32)
                if len(coords) > 4:
                    pts = coords.reshape(-1, 2)
                else:
                    xc, yc, w, h = coords[:4]
                    pts = np.array([[xc - w / 2, yc - h / 2], [xc + w / 2, yc - h / 2],
                                    [xc + w / 2, yc + h / 2], [xc - w / 2, yc + h / 2]],
                                   np.float32)
                out.append((cls, pts))
    except Exception:
        pass
    return out


def parse_yolo_label_file(path: str) -> np.ndarray:
    """Parse one YOLO txt file -> [N,5] (cls, xc, yc, w, h) normalized.
    Polygon rows (cls + 2k coords, k>2) collapse to their bbox."""
    boxes = []
    try:
        with open(path, "r") as f:
            lines = f.readlines()
        for line in lines:
            parts = line.strip().split()
            if len(parts) >= 5:
                cls = int(float(parts[0]))
                coords = np.array([float(x) for x in parts[1:]], dtype=np.float32)
                if len(coords) > 4:  # segmentation polygon
                    pts = coords.reshape(-1, 2)
                    xmin, ymin = pts.min(axis=0)
                    xmax, ymax = pts.max(axis=0)
                    xc, yc = (xmin + xmax) / 2, (ymin + ymax) / 2
                    w, h = (xmax - xmin), (ymax - ymin)
                else:
                    xc, yc, w, h = coords[:4]
                boxes.append([cls, xc, yc, w, h])
    except Exception:
        pass
    if boxes:
        return np.asarray(boxes, dtype=np.float32)
    return np.zeros((0, 5), dtype=np.float32)


def max_instances_per_image(lab_dir: str) -> int:
    """Largest number of label rows (one row = one instance, box or polygon)
    in any txt under `lab_dir`. Powers `training.max_boxes: auto` — the
    SimOTA assignment's [M,N] one-hot matmuls scale with the GT padding
    capacity M (38% of the train step at M=200, BENCHMARK_TPU.md "where the
    time goes"), so sizing M to the dataset instead of a universal default
    is a pure, exact speedup."""
    from pathlib import Path
    best = 0
    p = Path(lab_dir)
    if not p.is_dir():
        return 0
    for f in p.glob("*.txt"):
        try:
            with open(f) as fh:
                n = sum(1 for ln in fh if ln.strip())
        except OSError:
            continue
        best = max(best, n)
    return best


class _LRUImageCache:
    """Bounded decoded-image cache (byte budget, LRU eviction, thread-safe).

    For datasets too large for a host's RAM: hot images stay decoded, cold
    ones stream from disk. Per-host byte budget — on a multi-host pod each
    process caches only its own shard's hot set."""

    def __init__(self, budget_bytes: int):
        import threading
        from collections import OrderedDict
        self.budget = int(budget_bytes)
        self._od: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, idx: int) -> Optional[np.ndarray]:
        with self._lock:
            img = self._od.get(idx)
            if img is not None:
                self._od.move_to_end(idx)
                self.hits += 1
            else:
                self.misses += 1
            return img

    def put(self, idx: int, img: np.ndarray) -> None:
        nb = img.nbytes
        if nb > self.budget:
            return  # a single image over budget: never cache it
        with self._lock:
            old = self._od.pop(idx, None)
            if old is not None:
                self._bytes -= old.nbytes
            self._od[idx] = img
            self._bytes += nb
            while self._bytes > self.budget and self._od:
                _, ev = self._od.popitem(last=False)
                self._bytes -= ev.nbytes

    @property
    def nbytes(self) -> int:
        return self._bytes


class YoloDataset:
    def __init__(self, img_dir: str, label_dir: str, img_size: int = 640,
                 is_train: bool = True, max_boxes: int = 100,
                 use_resize: bool = False, mosaic_p: float = 0.2,
                 cutmix_p: float = 0.2, augment: bool = True, seed: int = 0,
                 task: str = "detect", proto_down: int = 4,
                 cache_images: bool = False, photometric: bool = True,
                 aug_preset: str = "base", shard_index: int = 0,
                 shard_count: int = 1, cache_budget_mb: Optional[float] = None,
                 want_rles: bool = True):
        self.img_dir = Path(img_dir)
        self.label_dir = Path(label_dir)
        self.img_files = list_images(str(img_dir))
        if len(self.img_files) == 0:
            raise ValueError(f"No images found in {img_dir}")
        # per-host shard striping (multi-host pods: each process ingests only
        # its stripe of the sorted file list, so the label cache, any image
        # cache and disk reads all scale 1/N per host; reference has no
        # distributed ingestion at all, SURVEY.md §2)
        if not (0 <= int(shard_index) < int(shard_count)):
            raise ValueError(f"shard_index {shard_index} out of range for "
                             f"shard_count {shard_count}")
        self.shard_index = int(shard_index)
        self.shard_count = int(shard_count)
        if self.shard_count > 1:
            # Equalize per-host work (torch DistributedSampler-style): pad the
            # global list with wrap-around duplicates to a multiple of
            # shard_count BEFORE striping, so every host sees exactly
            # ceil(n/shard_count) files. Unequal stripes would make per-host
            # steps_per_epoch diverge and one host dispatch an SPMD collective
            # the others never join (pod hang) whenever a stripe boundary
            # crosses a batch-size multiple.
            total = len(self.img_files)
            pad = (-total) % self.shard_count
            reps = -(-pad // total)  # handles total < shard_count
            padded = self.img_files + (self.img_files * reps)[:pad]
            self.img_files = padded[self.shard_index::self.shard_count]
            if len(self.img_files) == 0:
                raise ValueError(
                    f"Shard {shard_index}/{shard_count} of {img_dir} is empty")
        self.img_size = int(img_size)
        self.is_train = bool(is_train)
        self.max_boxes = int(max_boxes)
        # finished-sample cache for deterministic (val) seg samples, keyed by
        # (idx, img_size) — see _get_segment docstring
        self._val_seg_cache: Dict = {}
        self.mosaic_p = float(mosaic_p) if (is_train and augment) else 0.0
        self.cutmix_p = float(cutmix_p) if (is_train and augment) else 0.0
        self.augment_enabled = bool(augment) and is_train
        # photometric=False: color/noise ops run on-device inside the train
        # step instead (training.device_augment, data/device_augment.py) —
        # the host pipeline keeps geometry only.
        self.photometric = bool(photometric)
        # "base" = reference get_base_transform; "strong" = get_strong_transform
        # (scripts/data/augment.py:103-152, opt-in — unused by ref train.py)
        self.aug_preset = str(aug_preset)
        self.transform = (self._make_train_transform(use_resize)
                          if self.augment_enabled else ValTransform(img_size, use_resize))
        self.val_transform = ValTransform(img_size, use_resize)
        self.seed = seed
        self.task = task
        self.proto_size = int(img_size) // int(proto_down)
        # full-resolution GT mask RLEs are consumed ONLY by segm COCO eval
        # (eval/evaluate.py). Rasterizing them costs one img_size^2 fillPoly +
        # RLE encode PER INSTANCE per sample — on dense suites (HardSynth-seg:
        # 8-48 objects/img) that dominated seg epoch time. The train split
        # passes want_rles=False and skips them.
        self.want_rles = bool(want_rles)
        self.labels_cache = self._cache_labels()
        self.poly_cache = self._cache_polygons() if task == "segment" else None
        # optional decoded-image RAM cache (original resolution, uint8 RGB).
        # Each epoch re-decodes every JPEG otherwise; for datasets that fit in
        # host RAM this removes imread from the hot loop entirely. With a
        # cache_budget_mb the cache is a bounded LRU instead (streaming
        # ingestion: hot set cached, cold images re-read from disk).
        self.lru_cache: Optional[_LRUImageCache] = None
        self.image_cache: Optional[List[Optional[np.ndarray]]] = None
        if cache_budget_mb is not None:
            self.lru_cache = _LRUImageCache(int(float(cache_budget_mb) * 2**20))
        elif cache_images:
            self.image_cache = [None] * len(self.img_files)

    def _make_train_transform(self, use_resize: bool) -> TrainTransform:
        if getattr(self, "aug_preset", "base") == "strong":
            from yololite_tpu.data.augment import StrongTrainTransform
            return StrongTrainTransform(self.img_size, use_resize,
                                        photometric=self.photometric)
        if self.photometric:
            return TrainTransform(self.img_size, use_resize)
        return TrainTransform(self.img_size, use_resize, p_color=0.0,
                              p_noise=0.0)

    def set_img_size(self, img_size: int):
        """Multi-scale training: switch the letterbox target size. Each size is
        its own cached XLA graph downstream (static shapes per size)."""
        self.img_size = int(img_size)
        self.proto_size = self.img_size // 4
        use_resize = getattr(self.val_transform, "use_resize", False)
        self.val_transform = ValTransform(self.img_size, use_resize)
        if isinstance(self.transform, TrainTransform):
            self.transform = self._make_train_transform(use_resize)
        else:
            self.transform = ValTransform(self.img_size, use_resize)

    # -- reference-style augmentation tapering (tools/train.py:326-331) ------ #
    def set_mosaic_cutmix(self, mosaic_p: float, cutmix_p: float):
        self.mosaic_p = mosaic_p
        self.cutmix_p = cutmix_p

    def set_augment(self, enabled: bool):
        self.augment_enabled = enabled and self.is_train
        self.transform = (self._make_train_transform(self.val_transform.use_resize)
                          if self.augment_enabled
                          else ValTransform(self.img_size, self.val_transform.use_resize))
        if not enabled:
            self.mosaic_p = 0.0
            self.cutmix_p = 0.0

    def _cache_labels(self) -> List[np.ndarray]:
        cache = []
        for img_path in self.img_files:
            label_path = self.label_dir / (Path(img_path).stem + ".txt")
            cache.append(parse_yolo_label_file(str(label_path))
                         if label_path.exists() else np.zeros((0, 5), np.float32))
        return cache

    def _cache_polygons(self):
        cache = []
        for img_path in self.img_files:
            label_path = self.label_dir / (Path(img_path).stem + ".txt")
            cache.append(parse_yolo_seg_file(str(label_path))
                         if label_path.exists() else [])
        return cache

    def __len__(self):
        return len(self.img_files)

    def load_image(self, idx: int) -> np.ndarray:
        if self.lru_cache is not None:
            cached = self.lru_cache.get(idx)
            if cached is not None:
                return cached
        elif self.image_cache is not None:
            cached = self.image_cache[idx]
            if cached is not None:
                return cached
        img = cv2.imread(self.img_files[idx])
        if img is None:
            raise ValueError(f"Image not found or corrupt: {self.img_files[idx]}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if self.lru_cache is not None:
            self.lru_cache.put(idx, img)
        elif self.image_cache is not None:
            self.image_cache[idx] = img  # per-slot write: thread-safe
        return img

    def load_label_processed(self, idx: int, img_h: int, img_w: int):
        data = self.labels_cache[idx]
        if data.shape[0] == 0:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.int64)
        cls = data[:, 0].astype(np.int64)
        xywh = data[:, 1:]
        x1 = (xywh[:, 0] - xywh[:, 2] / 2) * img_w
        y1 = (xywh[:, 1] - xywh[:, 3] / 2) * img_h
        x2 = (xywh[:, 0] + xywh[:, 2] / 2) * img_w
        y2 = (xywh[:, 1] + xywh[:, 3] / 2) * img_h
        return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32), cls

    # ------------------------------ Mosaic ---------------------------------- #
    def mosaic(self, index: int, rng: np.random.RandomState):
        indices = [index] + list(rng.randint(0, len(self), size=3))
        s = self.img_size
        canvas = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
        offsets = [(0, 0), (0, s), (s, 0), (s, s)]
        all_boxes, all_labels = [], []
        for i, idx in enumerate(indices):
            img = self.load_image(idx)
            h, w = img.shape[:2]
            boxes, labels = self.load_label_processed(idx, h, w)
            img = cv2.resize(img, (s, s))
            if len(boxes):
                boxes = boxes * np.array([s / w, s / h, s / w, s / h], np.float32)
            oy, ox = offsets[i]
            canvas[oy:oy + s, ox:ox + s] = img
            if len(boxes):
                boxes[:, [0, 2]] += ox
                boxes[:, [1, 3]] += oy
                all_boxes.append(boxes)
                all_labels.append(labels)
        if all_boxes:
            fb = np.vstack(all_boxes)
            fl = np.concatenate(all_labels)
            valid = (fb[:, 2] > fb[:, 0]) & (fb[:, 3] > fb[:, 1])
            return canvas, fb[valid], fl[valid]
        return canvas, np.zeros((0, 4), np.float32), np.zeros((0,), np.int64)

    # ------------------------------ CutMix ---------------------------------- #
    def cutmix_focus_small(self, img, boxes, labels, other_idx: int,
                           rng: np.random.RandomState, alpha: float = 0.7):
        img2 = self.load_image(other_idx)
        h2, w2 = img2.shape[:2]
        boxes2, labels2 = self.load_label_processed(other_idx, h2, w2)
        if len(boxes2) == 0:
            return img, boxes, labels
        areas = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
        si = int(np.argmin(areas))
        x1, y1, x2, y2 = boxes2[si].astype(int)
        x1, y1 = max(x1, 0), max(y1, 0)
        patch = img2[y1:y2, x1:x2]
        if patch.size == 0:
            return img, boxes, labels
        ph, pw = patch.shape[:2]
        h, w = img.shape[:2]
        if ph >= h or pw >= w:
            return img, boxes, labels
        cx = rng.randint(0, max(1, w - pw))
        cy = rng.randint(0, max(1, h - ph))
        roi = img[cy:cy + ph, cx:cx + pw]
        if roi.shape[:2] != patch.shape[:2]:
            return img, boxes, labels
        img = img.copy()
        img[cy:cy + ph, cx:cx + pw] = (alpha * patch + (1 - alpha) * roi).astype(np.uint8)
        new_box = np.array([[cx, cy, cx + pw, cy + ph]], np.float32)
        new_lbl = np.array([labels2[si]], np.int64)
        boxes = np.vstack([boxes, new_box]) if len(boxes) else new_box
        labels = np.concatenate([labels, new_lbl]) if len(labels) else new_lbl
        return img, boxes, labels

    # ------------------------------------------------------------------------ #
    def _pad_targets(self, boxes, labels):
        m = self.max_boxes
        out_b = np.zeros((m, 4), np.float32)
        out_l = np.zeros((m,), np.int32)
        out_m = np.zeros((m,), bool)
        n = min(len(boxes), m)
        if n:
            out_b[:n] = boxes[:n]
            out_l[:n] = labels[:n]
            out_m[:n] = True
        return out_b, out_l, out_m

    def mosaic_segment(self, index: int, rng: np.random.RandomState):
        """Polygon-aware Mosaic 2x2: same geometry as the box-path `mosaic`
        (each tile resized to img_size, composed on a 2S canvas that the
        caller letterboxes back down), with polygon points carried through
        the per-tile scale + offset instead of boxes."""
        indices = [index] + list(rng.randint(0, len(self), size=3))
        s = self.img_size
        canvas = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
        offsets = [(0, 0), (0, s), (s, 0), (s, s)]
        polys, labels = [], []
        for i, idx in enumerate(indices):
            img = self.load_image(idx)
            canvas_off = np.array(offsets[i][::-1], np.float32)  # (ox, oy)
            oy, ox = offsets[i]
            canvas[oy:oy + s, ox:ox + s] = cv2.resize(img, (s, s))
            for c, p in self.poly_cache[idx]:
                # poly_cache is normalized [0,1]; tile is exactly s x s
                polys.append(p * np.float32(s) + canvas_off)
                labels.append(c)
        return canvas, polys, np.asarray(labels, np.int64)

    def cutmix_segment(self, img, polys, labels, other_idx: int,
                       rng: np.random.RandomState, alpha: float = 0.7):
        """Mask-aware CutMix (copy-paste): the donor image's smallest instance
        is alpha-composited into this image *inside its polygon only* and the
        shifted polygon becomes a new GT instance — the seg-path analogue of
        `cutmix_focus_small` (reference scripts/data/dataset.py:179-230, which
        is box-only). Compositing only the polygon region keeps the pasted
        pixels and the supervising mask exactly aligned."""
        items = self.poly_cache[other_idx]
        if not items:
            return img, polys, labels
        img2 = self.load_image(other_idx)
        h2, w2 = img2.shape[:2]
        px2 = [p * np.array([w2, h2], np.float32) for _, p in items]
        areas = [max(float(p[:, 0].max() - p[:, 0].min()), 1.0) *
                 max(float(p[:, 1].max() - p[:, 1].min()), 1.0) for p in px2]
        si = int(np.argmin(areas))
        poly = px2[si]
        x1, y1 = np.floor(poly.min(0)).astype(int)
        x2, y2 = np.ceil(poly.max(0)).astype(int)
        x1, y1 = max(x1, 0), max(y1, 0)
        x2, y2 = min(x2, w2), min(y2, h2)
        patch = img2[y1:y2, x1:x2]
        ph, pw = patch.shape[:2]
        h, w = img.shape[:2]
        if ph < 4 or pw < 4 or ph >= h or pw >= w:
            return img, polys, labels
        cx = rng.randint(0, max(1, w - pw))
        cy = rng.randint(0, max(1, h - ph))
        local = poly - np.array([x1, y1], np.float32)
        pm = np.zeros((ph, pw), np.uint8)
        cv2.fillPoly(pm, [np.round(local).astype(np.int32)], 1)
        roi = img[cy:cy + ph, cx:cx + pw]
        blend = (alpha * patch + (1 - alpha) * roi).astype(np.uint8)
        img = img.copy()
        img[cy:cy + ph, cx:cx + pw] = np.where(pm[..., None] > 0, blend, roi)
        polys = list(polys) + [local + np.array([cx, cy], np.float32)]
        labels = np.concatenate([np.asarray(labels, np.int64),
                                 [np.int64(items[si][0])]])
        return img, polys, labels

    def _get_segment(self, idx: int, rng: np.random.RandomState) -> Dict[str, np.ndarray]:
        """Segmentation sample: the full geometric pipeline (mosaic, cutmix,
        flips, affine, letterbox) applied to polygon points, GT masks
        rasterized at prototype resolution (stride `proto_down`) + full-res
        RLE for eval. CutMix is the mask-aware copy-paste variant
        (`cutmix_segment`); photometric augs apply normally.

        Val datasets (is_train=False) are deterministic per index — mosaic,
        cutmix and all augs are off and `rng` goes unused — so the finished
        sample is cached: rebuilding the full-res GT RLEs cost ~13 min per
        eval pass of a 400-image @640 suite on a 1-core host (r5 HardSynth-
        seg study), repeated at every eval epoch.
        """
        if not self.is_train:
            cached = self._val_seg_cache.get((idx, self.img_size))
            if cached is not None:
                return cached
        from yololite_tpu.data.augment import (affine_matrix, channel_shuffle,
                                               color_jitter, gauss_noise,
                                               hsv_shift, motion_blur,
                                               random_brightness_contrast,
                                               rgb_shift)
        from yololite_tpu.ops.letterbox import letterbox_image
        s = self.img_size
        ps = self.proto_size
        p_mix = rng.rand() if self.augment_enabled else 1.0
        if p_mix < self.mosaic_p:
            img, polys, labels = self.mosaic_segment(idx, rng)
            h, w = img.shape[:2]
        else:
            img = self.load_image(idx)
            h, w = img.shape[:2]
            items = self.poly_cache[idx]
            polys = [p * np.array([w, h], np.float32) for _, p in items]
            labels = np.array([c for c, _ in items], np.int64)
            if p_mix < self.mosaic_p + self.cutmix_p:
                img, polys, labels = self.cutmix_segment(
                    img, polys, labels, int(rng.randint(0, len(self))), rng)

        if self.augment_enabled:
            if rng.rand() < 0.3:
                img = img[:, ::-1].copy()
                polys = [np.stack([w - p[:, 0], p[:, 1]], 1) for p in polys]
            if rng.rand() < 0.3:
                img = img[::-1].copy()
                polys = [np.stack([p[:, 0], h - p[:, 1]], 1) for p in polys]
            if rng.rand() < 0.2:
                m_aff = affine_matrix(h, w, rng)
                img = cv2.warpAffine(img, m_aff, (w, h),
                                     flags=cv2.INTER_LINEAR,
                                     borderMode=cv2.BORDER_CONSTANT,
                                     borderValue=(114, 114, 114))
                polys = [p @ m_aff[:, :2].T + m_aff[:, 2] for p in polys]
            # photometric=False: color/noise run on-device instead
            # (training.device_augment) — mirror the box path's gating
            if self.photometric and rng.rand() < 0.4:
                op = rng.randint(5)
                img = [random_brightness_contrast, color_jitter, hsv_shift,
                       rgb_shift, channel_shuffle][op](img, rng)
            if self.photometric and rng.rand() < 0.15:
                img = gauss_noise(img, rng) if rng.rand() < 0.5 else motion_blur(img, rng)

        canvas, scale, px, py = letterbox_image(img, s)
        polys = [p * scale + np.array([px, py], np.float32) for p in polys]

        from yololite_tpu.ops.masks import rle_encode_np
        m = self.max_boxes
        boxes = np.zeros((m, 4), np.float32)
        labs = np.zeros((m,), np.int32)
        valid = np.zeros((m,), bool)
        masks = np.zeros((m, ps, ps), np.uint8)
        gt_rles = []  # full-resolution GT masks as RLE (host-only, for eval)
        full = np.zeros((s, s), np.uint8)
        n = 0
        for poly, lab in zip(polys, labels):
            if n >= m:
                break
            poly = poly.clip([0, 0], [s - 1, s - 1])
            x1, y1 = poly.min(0)
            x2, y2 = poly.max(0)
            if x2 - x1 < 2 or y2 - y1 < 2:
                continue
            boxes[n] = (x1, y1, x2, y2)
            labs[n] = int(lab)
            valid[n] = True
            pts = np.round(poly * (ps / float(s))).astype(np.int32)
            cv2.fillPoly(masks[n], [pts], 1)
            if self.want_rles:
                full[:] = 0
                cv2.fillPoly(full, [np.round(poly).astype(np.int32)], 1)
                gt_rles.append(rle_encode_np(full))
            n += 1
        # bitpack the proto-res GT masks along W: [M,Hp,Wp] uint8 {0,1} ->
        # [M,Hp,ceil(Wp/8)] uint8. 8x less H2D per step (the [200,160,160]
        # raw layout is 5 MB/image and dominates the batch upload); the
        # jitted train step unpacks on device (jnp.unpackbits, free vs MXU).
        # Consumers derive the unpack count from Hp (shape[-2]), which is
        # only valid for square protos — enforce that invariant here.
        assert masks.shape[-1] == masks.shape[-2], (
            "masks_packed requires square proto masks (unpack count is "
            f"derived from Hp); got {masks.shape}")
        out = {"image": canvas, "boxes": boxes, "labels": labs, "mask": valid,
               "masks_packed": np.packbits(masks, axis=-1),
               "image_id": np.int64(idx)}
        if self.want_rles:
            out["gt_rles"] = gt_rles
        if not self.is_train:
            self._val_seg_cache[(idx, self.img_size)] = out
        return out

    def get(self, idx: int, rng: Optional[np.random.RandomState] = None) -> Dict[str, np.ndarray]:
        rng = rng or np.random.RandomState()
        if self.task == "segment":
            try:
                return self._get_segment(idx, rng)
            except Exception as e:
                print(f"[ERROR] {self.img_files[idx]}: {e}")
                ps = self.proto_size
                out = {"image": np.zeros((self.img_size, self.img_size, 3), np.uint8),
                       "boxes": np.zeros((self.max_boxes, 4), np.float32),
                       "labels": np.zeros((self.max_boxes,), np.int32),
                       "mask": np.zeros((self.max_boxes,), bool),
                       "masks_packed": np.zeros(
                           (self.max_boxes, ps, (ps + 7) // 8), np.uint8),
                       "image_id": np.int64(idx)}
                if self.want_rles:
                    out["gt_rles"] = []
                return out
        try:
            img = self.load_image(idx)
            h, w = img.shape[:2]
            boxes, labels = self.load_label_processed(idx, h, w)
            if self.is_train and self.augment_enabled:
                p = rng.rand()
                if p < self.mosaic_p:
                    img, boxes, labels = self.mosaic(idx, rng)
                elif p < self.mosaic_p + self.cutmix_p:
                    img, boxes, labels = self.cutmix_focus_small(
                        img, boxes, labels, rng.randint(0, len(self)), rng)
                h, w = img.shape[:2]
                if len(boxes):
                    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
                    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
            canvas, boxes, labels = self.transform(img, boxes, labels, rng)
        except Exception as e:  # corrupt image fallback (dataset.py:268-272)
            print(f"[ERROR] {self.img_files[idx]}: {e}")
            canvas = np.zeros((self.img_size, self.img_size, 3), np.uint8)
            boxes, labels = np.zeros((0, 4), np.float32), np.zeros((0,), np.int64)
        b, l, m = self._pad_targets(boxes, labels)
        return {"image": canvas, "boxes": b, "labels": l, "mask": m,
                "image_id": np.int64(idx)}

    def __getitem__(self, idx):
        return self.get(idx)
