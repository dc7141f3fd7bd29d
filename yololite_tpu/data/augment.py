"""Host-side augmentation pipeline (numpy/cv2) with bbox tracking.

Re-implements the reference's Albumentations pipelines (scripts/data/augment.py)
without the Albumentations dependency:

  get_base_transform (:54-101): HFlip/VFlip p=0.3, optional square Resize,
    Affine(rot ±20°, shear ±10°, scale .85-1.15, translate 5-10%) p=0.2 with
    border 114, color OneOf p=0.4 (brightness-contrast / color-jitter / HSV /
    RGB-shift / channel-shuffle), noise-or-motion-blur OneOf p=0.15,
    letterbox (LongestMaxSize + centered PadIfNeeded 114), bbox filtering with
    min_visibility=0.25 / min_area=16.
  get_val_transform (:153-171): letterbox only.

TPU-first split: these run on the host input pipeline and emit uint8 RGB
canvases; ImageNet normalization happens on-device inside the jitted graph so
host->HBM transfers stay uint8 (4x less PCIe/DMA traffic).
"""

from __future__ import annotations

import math


import numpy as np

import cv2

from yololite_tpu.ops.letterbox import letterbox_image

PAD = (114, 114, 114)


# --------------------------------------------------------------------------- #
# Geometry helpers
# --------------------------------------------------------------------------- #

def _transform_boxes_affine(boxes: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Apply a 2x3 affine to xyxy boxes -> AABB of the 4 transformed corners."""
    if len(boxes) == 0:
        return boxes
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    corners = np.stack([
        np.stack([x1, y1], -1), np.stack([x2, y1], -1),
        np.stack([x1, y2], -1), np.stack([x2, y2], -1),
    ], axis=1)  # [N,4,2]
    ones = np.ones((*corners.shape[:2], 1), np.float32)
    pts = np.concatenate([corners, ones], -1) @ m.T  # [N,4,2]
    out = np.concatenate([pts.min(1), pts.max(1)], -1).astype(np.float32)
    return out


def _filter_boxes(boxes, labels, w, h, orig_areas=None,
                  min_visibility=0.25, min_area=16.0):
    """Clip to the canvas and drop boxes by visibility/area (Albumentations
    BboxParams semantics, augment.py:91-98)."""
    if len(boxes) == 0:
        return boxes.reshape(0, 4), labels
    clipped = boxes.copy()
    clipped[:, [0, 2]] = clipped[:, [0, 2]].clip(0, w)
    clipped[:, [1, 3]] = clipped[:, [1, 3]].clip(0, h)
    areas = np.maximum(clipped[:, 2] - clipped[:, 0], 0) * \
        np.maximum(clipped[:, 3] - clipped[:, 1], 0)
    if orig_areas is None:
        orig_areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
            np.maximum(boxes[:, 3] - boxes[:, 1], 0)
    vis = areas / np.maximum(orig_areas, 1e-9)
    keep = (areas >= min_area) & (vis >= min_visibility) & \
           (clipped[:, 2] > clipped[:, 0]) & (clipped[:, 3] > clipped[:, 1])
    return clipped[keep], labels[keep]


# --------------------------------------------------------------------------- #
# Individual transforms
# --------------------------------------------------------------------------- #

def hflip(img, boxes):
    h, w = img.shape[:2]
    img = img[:, ::-1].copy()
    if len(boxes):
        boxes = boxes.copy()
        boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    return img, boxes


def vflip(img, boxes):
    h, w = img.shape[:2]
    img = img[::-1].copy()
    if len(boxes):
        boxes = boxes.copy()
        boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
    return img, boxes


def affine_matrix(h, w, rng: np.random.RandomState,
                  rotate=(-20, 20), shear=(-10, 10), scale=(0.85, 1.15),
                  translate=(0.05, 0.10)) -> np.ndarray:
    """Sample the train-time 2x3 affine (rot+scale about center, shear,
    translate) — shared by the box path (random_affine) and the segmentation
    path (which maps polygon points through it)."""
    ang = math.radians(rng.uniform(*rotate))
    shx = math.radians(rng.uniform(*shear))
    shy = math.radians(rng.uniform(*shear))
    sc = rng.uniform(*scale)
    t_mag = rng.uniform(*translate)
    tx = rng.choice([-1, 1]) * t_mag * w
    ty = rng.choice([-1, 1]) * t_mag * h

    cx, cy = w / 2.0, h / 2.0
    ca, sa = math.cos(ang) * sc, math.sin(ang) * sc
    # rotation+scale about center, then shear, then translate
    rot = np.array([[ca, -sa, cx - ca * cx + sa * cy],
                    [sa, ca, cy - sa * cx - ca * cy]], np.float32)
    sh = np.array([[1.0, math.tan(shx), 0.0],
                   [math.tan(shy), 1.0, 0.0]], np.float32)

    def compose(a, b):  # a∘b for 2x3 mats
        a3 = np.vstack([a, [0, 0, 1]])
        b3 = np.vstack([b, [0, 0, 1]])
        return (a3 @ b3)[:2]

    m = compose(rot, sh)
    m[:, 2] += (tx, ty)
    return m


def random_affine(img, boxes, rng: np.random.RandomState,
                  rotate=(-20, 20), shear=(-10, 10), scale=(0.85, 1.15),
                  translate=(0.05, 0.10)):
    h, w = img.shape[:2]
    m = affine_matrix(h, w, rng, rotate, shear, scale, translate)
    img = cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=PAD)
    boxes = _transform_boxes_affine(boxes, m)
    return img, boxes


def random_brightness_contrast(img, rng, brightness=0.2, contrast=0.2):
    alpha = 1.0 + rng.uniform(-contrast, contrast)
    beta = rng.uniform(-brightness, brightness) * 255.0
    return cv2.convertScaleAbs(img, alpha=alpha, beta=beta)


def _hsv_lut(hue_add: float, sat_scale: float, sat_add: float,
             val_add: float) -> np.ndarray:
    """256x1x3 uint8 LUT over HSV channels: one cv2.LUT call replaces the
    float-array hue/sat/val arithmetic (hot path: runs per training sample)."""
    idx = np.arange(256, dtype=np.float32)
    lut = np.empty((256, 1, 3), np.uint8)
    lut[:, 0, 0] = np.mod(idx + hue_add, 180.0).astype(np.uint8)
    lut[:, 0, 1] = np.clip(idx * sat_scale + sat_add, 0, 255).astype(np.uint8)
    lut[:, 0, 2] = np.clip(idx + val_add, 0, 255).astype(np.uint8)
    return lut


def color_jitter(img, rng, brightness=0.2, contrast=0.2, saturation=0.15, hue=0.05):
    img = random_brightness_contrast(img, rng, brightness, contrast)
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    lut = _hsv_lut(rng.uniform(-hue, hue) * 180.0,
                   1.0 + rng.uniform(-saturation, saturation), 0.0, 0.0)
    return cv2.cvtColor(cv2.LUT(hsv, lut), cv2.COLOR_HSV2RGB)


def hsv_shift(img, rng, hue_lim=5, sat_lim=15, val_lim=15):
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    lut = _hsv_lut(float(rng.randint(-hue_lim, hue_lim + 1)), 1.0,
                   float(rng.randint(-sat_lim, sat_lim + 1)),
                   float(rng.randint(-val_lim, val_lim + 1)))
    return cv2.cvtColor(cv2.LUT(hsv, lut), cv2.COLOR_HSV2RGB)


def rgb_shift(img, rng, lim=20):
    shift = rng.randint(-lim, lim + 1, size=3)
    # saturating per-channel scalar add in C (no int16 round-trip)
    return cv2.add(img, tuple(float(s) for s in shift) + (0.0,))


def channel_shuffle(img, rng):
    perm = rng.permutation(3)
    m = np.zeros((3, 3), np.float32)
    m[np.arange(3), perm] = 1.0
    return cv2.transform(img, m)


_NOISE_POOL = None
_NOISE_POOL_N = 1 << 23  # 8M floats (32 MB), read-only, shared across threads


def gauss_noise(img, rng, var=(5.0, 20.0)):
    """Additive white noise from a precomputed unit-normal pool: a random
    offset slice per call (seeded by the per-sample RandomState -> samples
    stay deterministic and thread-independent). Float64 `rng.normal` on the
    full canvas + .clip dominated the whole input pipeline before."""
    global _NOISE_POOL
    if _NOISE_POOL is None:
        _NOISE_POOL = np.random.default_rng(0xA0C5E).standard_normal(
            _NOISE_POOL_N, dtype=np.float32)
    sigma = math.sqrt(rng.uniform(*var))
    n = int(img.size)
    if n + 1 >= _NOISE_POOL_N:  # absurdly large image: fall back
        noise = np.random.default_rng(rng.randint(1 << 31)).standard_normal(
            img.shape, dtype=np.float32) * sigma
    else:
        off = rng.randint(_NOISE_POOL_N - n)
        noise = (_NOISE_POOL[off:off + n] * sigma).reshape(img.shape)
    return cv2.add(img, noise, dtype=cv2.CV_8UC3)


def motion_blur(img, rng, k=3):
    kernel = np.zeros((k, k), np.float32)
    if rng.rand() < 0.5:
        kernel[k // 2, :] = 1.0 / k
    else:
        kernel[:, k // 2] = 1.0 / k
    return cv2.filter2D(img, -1, kernel)


def elastic_transform(img, boxes, rng, alpha=1.0, sigma=50.0):
    """Elastic warp (ElasticTransform(alpha=1, sigma=50) in the reference's
    strong pipeline, augment.py:114). A Gaussian-smoothed random displacement
    field remaps pixels; boxes follow the AABB of their displaced corners.
    At alpha=1 the displacement is sub-pixel — a photometric-scale jiggle."""
    h, w = img.shape[:2]
    # coarse field blurred up: equivalent smoothing at a fraction of the cost
    # of a full-res GaussianBlur with a 4*sigma kernel
    gh, gw = max(h // 8, 2), max(w // 8, 2)
    dx = cv2.resize(rng.uniform(-1, 1, (gh, gw)).astype(np.float32), (w, h))
    dy = cv2.resize(rng.uniform(-1, 1, (gh, gw)).astype(np.float32), (w, h))
    s8 = max(sigma / 8.0, 0.5)
    k = int(s8 * 4) | 1
    dx = cv2.GaussianBlur(dx, (k, k), s8) * alpha
    dy = cv2.GaussianBlur(dy, (k, k), s8) * alpha
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    img = cv2.remap(img, xs + dx, ys + dy, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT, borderValue=PAD)
    if len(boxes):
        boxes = boxes.copy()
        xi = boxes[:, [0, 2]].clip(0, w - 1).astype(np.int32)
        yi = boxes[:, [1, 3]].clip(0, h - 1).astype(np.int32)
        # remap maps output<-input, so corners move by -d
        boxes[:, [0, 2]] -= dx[yi[:, [0, 1]], xi]
        boxes[:, [1, 3]] -= dy[yi, xi[:, [0, 1]]]
    return img, boxes


def coarse_dropout(img, rng, num_holes=(3, 10), hole_h=(0.01, 0.05),
                   hole_w=(0.01, 0.05)):
    """CoarseDropout (reference strong pipeline augment.py:129-130): fill a few
    small random rectangles with black. Labels unchanged (holes are small)."""
    h, w = img.shape[:2]
    img = img.copy()
    for _ in range(rng.randint(num_holes[0], num_holes[1] + 1)):
        hh = max(1, int(rng.uniform(*hole_h) * h))
        hw = max(1, int(rng.uniform(*hole_w) * w))
        y = rng.randint(0, max(1, h - hh))
        x = rng.randint(0, max(1, w - hw))
        img[y:y + hh, x:x + hw] = 0
    return img


# --------------------------------------------------------------------------- #
# Composed pipelines
# --------------------------------------------------------------------------- #

class TrainTransform:
    """Reference get_base_transform equivalent; emits uint8 letterboxed canvas."""

    def __init__(self, img_size: int, use_resize: bool = False,
                 p_flip: float = 0.3, p_affine: float = 0.2,
                 p_color: float = 0.4, p_noise: float = 0.15,
                 min_visibility: float = 0.25, min_area: float = 16.0):
        self.img_size = img_size
        self.use_resize = use_resize
        self.p_flip = p_flip
        self.p_affine = p_affine
        self.p_color = p_color
        self.p_noise = p_noise
        self.min_visibility = min_visibility
        self.min_area = min_area

    def __call__(self, img, boxes, labels, rng: np.random.RandomState):
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        labels = np.asarray(labels, np.int64).reshape(-1)
        orig_areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
            np.maximum(boxes[:, 3] - boxes[:, 1], 0) if len(boxes) else None

        if rng.rand() < self.p_flip:
            img, boxes = hflip(img, boxes)
        if rng.rand() < self.p_flip:
            img, boxes = vflip(img, boxes)
        if self.use_resize:
            h, w = img.shape[:2]
            img = cv2.resize(img, (self.img_size, self.img_size), interpolation=cv2.INTER_LINEAR)
            if len(boxes):
                boxes = boxes * np.array([self.img_size / w, self.img_size / h] * 2, np.float32)
        if rng.rand() < self.p_affine:
            img, boxes = random_affine(img, boxes, rng)
        if rng.rand() < self.p_color:
            op = rng.randint(5)
            img = [random_brightness_contrast, color_jitter, hsv_shift,
                   rgb_shift, channel_shuffle][op](img, rng)
        if rng.rand() < self.p_noise:
            img = gauss_noise(img, rng) if rng.rand() < 0.5 else motion_blur(img, rng)

        canvas, scale, px, py = letterbox_image(img, self.img_size)
        if len(boxes):
            boxes = boxes * scale
            boxes[:, [0, 2]] += px
            boxes[:, [1, 3]] += py
            if orig_areas is not None:
                orig_areas = orig_areas * (scale ** 2)
        boxes, labels = _filter_boxes(boxes, labels, self.img_size, self.img_size,
                                      orig_areas, self.min_visibility, self.min_area)
        return canvas, boxes, labels


class StrongTrainTransform:
    """Reference get_strong_transform equivalent (scripts/data/augment.py:103-152):
    HFlip p=0.5 (no VFlip), Affine p=0.3, Elastic(alpha=1,sigma=50) p=0.1,
    color OneOf p=0.1, shadow-or-sunflare OneOf p=0.2, CoarseDropout p=0.2,
    noise-or-blur OneOf p=0.3, letterbox, min_visibility=0.3 / min_area=0.
    Unused by the reference's train.py; provided as an opt-in preset
    (training.aug_preset: strong)."""

    def __init__(self, img_size: int, use_resize: bool = False,
                 photometric: bool = True):
        self.img_size = img_size
        self.use_resize = use_resize
        self.photometric = photometric

    def __call__(self, img, boxes, labels, rng: np.random.RandomState):
        from yololite_tpu.data.weather import add_shadow, add_sunflare
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        labels = np.asarray(labels, np.int64).reshape(-1)
        orig_areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
            np.maximum(boxes[:, 3] - boxes[:, 1], 0) if len(boxes) else None

        if rng.rand() < 0.5:
            img, boxes = hflip(img, boxes)
        if self.use_resize:
            h, w = img.shape[:2]
            img = cv2.resize(img, (self.img_size, self.img_size),
                             interpolation=cv2.INTER_LINEAR)
            if len(boxes):
                boxes = boxes * np.array([self.img_size / w, self.img_size / h] * 2,
                                         np.float32)
        if rng.rand() < 0.3:
            img, boxes = random_affine(img, boxes, rng)
        if rng.rand() < 0.1:
            img, boxes = elastic_transform(img, boxes, rng)
        if self.photometric and rng.rand() < 0.1:
            op = rng.randint(5)
            img = [random_brightness_contrast, color_jitter, hsv_shift,
                   rgb_shift, channel_shuffle][op](img, rng)
        if self.photometric and rng.rand() < 0.2:
            img = add_shadow(img, rng) if rng.rand() < 0.5 else add_sunflare(img, rng)
        if rng.rand() < 0.2:
            img = coarse_dropout(img, rng)
        if self.photometric and rng.rand() < 0.3:
            img = gauss_noise(img, rng) if rng.rand() < 0.5 else motion_blur(img, rng)

        canvas, scale, px, py = letterbox_image(img, self.img_size)
        if len(boxes):
            boxes = boxes * scale
            boxes[:, [0, 2]] += px
            boxes[:, [1, 3]] += py
            if orig_areas is not None:
                orig_areas = orig_areas * (scale ** 2)
        boxes, labels = _filter_boxes(boxes, labels, self.img_size, self.img_size,
                                      orig_areas, min_visibility=0.3, min_area=0.0)
        return canvas, boxes, labels


class ValTransform:
    """Reference get_val_transform equivalent: letterbox (or resize) only."""

    def __init__(self, img_size: int, use_resize: bool = False):
        self.img_size = img_size
        self.use_resize = use_resize

    def __call__(self, img, boxes, labels, rng=None):
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        labels = np.asarray(labels, np.int64).reshape(-1)
        if self.use_resize:
            h, w = img.shape[:2]
            canvas = cv2.resize(img, (self.img_size, self.img_size),
                                interpolation=cv2.INTER_LINEAR)
            if len(boxes):
                boxes = boxes * np.array([self.img_size / w, self.img_size / h] * 2,
                                         np.float32)
            scale, px, py = (self.img_size / w, 0, 0)
        else:
            canvas, scale, px, py = letterbox_image(img, self.img_size)
            if len(boxes):
                boxes = boxes * scale
                boxes[:, [0, 2]] += px
                boxes[:, [1, 3]] += py
        if len(boxes):
            boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, self.img_size)
            boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, self.img_size)
            keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            boxes, labels = boxes[keep], labels[keep]
        return canvas, boxes, labels
