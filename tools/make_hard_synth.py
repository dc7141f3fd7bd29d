"""HardSynth-20: a deliberately hard synthetic detection benchmark.

The round-1 accuracy studies used large colored rectangles — too easy to
defend mAP parity (VERDICT.md "Substantiate accuracy parity" (c)). This
generator produces a genuinely hard suite:

  * 20 classes = 5 shapes x 4 textures, with visually confusable pairs
    (ring vs circle, cross vs star; striped vs dotted at small scales)
  * dense scenes: 8-48 objects per image, sizes 10-120 px at 640 (the bulk
    under 32 px -> the APS regime dominates)
  * occlusion: objects may overlap up to ~50%; later objects draw on top
  * class imbalance: Zipf(1.3) over the 20 classes
  * non-square images: aspect ratios from 4:3 to 16:9, both orientations
    (exercises letterbox + back-mapping end to end)
  * background clutter: gradient fields, blotches, and distractor line art
    that belongs to no class
  * photometric nuisance: per-image brightness/contrast jitter, Gaussian
    noise, mild blur

Labels are YOLO-txt (class cx cy w h, normalized), boxes tight on the drawn
shape. Deterministic under --seed.

Usage:
  python tools/make_hard_synth.py --out /tmp/hardsynth --n_train 1600 --n_val 400
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np
import yaml

SHAPES = ["circle", "square", "triangle", "star", "ring"]
TEXTURES = ["solid", "striped", "dotted", "gradient"]
CLASSES = [f"{s}_{t}" for s in SHAPES for t in TEXTURES]  # 20
ASPECTS = [(4, 3), (3, 4), (16, 9), (9, 16), (3, 2), (2, 3), (1, 1)]


def _zipf_probs(n: int, a: float = 1.3) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** a
    return p / p.sum()


def _texture_patch(rng, size: int, texture: str, color, color2):
    """Square texture patch later masked by the shape."""
    patch = np.zeros((size, size, 3), np.float32)
    if texture == "solid":
        patch[:] = color
    elif texture == "striped":
        period = max(3, size // 5)
        yy = np.arange(size)
        stripe = ((yy // max(1, period // 2)) % 2).astype(np.float32)
        patch[:] = color
        patch[stripe > 0.5, :] = color2
    elif texture == "dotted":
        patch[:] = color
        step = max(4, size // 4)
        r = max(1, step // 3)
        for y in range(step // 2, size, step):
            for x in range(step // 2, size, step):
                cv2.circle(patch, (x, y), r, tuple(map(float, color2)), -1)
    elif texture == "gradient":
        t = np.linspace(0.0, 1.0, size, dtype=np.float32)[None, :, None]
        patch = np.asarray(color, np.float32) * (1 - t) + \
            np.asarray(color2, np.float32) * t
        patch = np.broadcast_to(patch, (size, size, 3)).copy()
    return patch


def _shape_mask(rng, size: int, shape: str) -> np.ndarray:
    m = np.zeros((size, size), np.uint8)
    c = size // 2
    r = size // 2 - 1
    if shape == "circle":
        cv2.circle(m, (c, c), r, 1, -1)
    elif shape == "square":
        cv2.rectangle(m, (1, 1), (size - 2, size - 2), 1, -1)
    elif shape == "triangle":
        pts = np.array([[c, 1], [1, size - 2], [size - 2, size - 2]], np.int32)
        cv2.fillPoly(m, [pts], 1)
    elif shape == "star":
        ang = np.linspace(-np.pi / 2, 1.5 * np.pi, 11)[:-1]
        rad = np.where(np.arange(10) % 2 == 0, r, r * 0.45)
        pts = np.stack([c + rad * np.cos(ang), c + rad * np.sin(ang)], 1)
        cv2.fillPoly(m, [pts.astype(np.int32)], 1)
    elif shape == "ring":
        cv2.circle(m, (c, c), r, 1, -1)
        cv2.circle(m, (c, c), max(1, int(r * 0.55)), 0, -1)
    return m


def _clutter_background(rng, h: int, w: int) -> np.ndarray:
    # gradient field
    a = rng.rand(3) * 120 + 40
    b = rng.rand(3) * 120 + 40
    t = np.linspace(0, 1, w, dtype=np.float32)[None, :, None]
    if rng.rand() < 0.5:
        t = np.linspace(0, 1, h, dtype=np.float32)[:, None, None]
    img = (a * (1 - t) + b * t) * np.ones((h, w, 3), np.float32)
    # low-frequency blotches
    small = rng.rand(h // 32 + 1, w // 32 + 1, 3).astype(np.float32) * 70 - 35
    img += cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
    # distractor line art (belongs to no class)
    for _ in range(rng.randint(4, 14)):
        p1 = (rng.randint(0, w), rng.randint(0, h))
        p2 = (rng.randint(0, w), rng.randint(0, h))
        col = tuple(float(v) for v in rng.rand(3) * 255)
        cv2.line(img, p1, p2, col, rng.randint(1, 3))
    return img


def _place(rng, img, used_boxes, size, cls_id, max_overlap=0.5, tries=12,
           full_mask=None):
    """Try to place one instance; allows partial occlusion up to max_overlap.
    With full_mask=(h,w), also returns the instance's full-image binary mask
    (segmentation mode)."""
    h, w = img.shape[:2]
    if size >= min(h, w) - 2:
        return None
    shape, texture = CLASSES[cls_id].split("_")
    for _ in range(tries):
        x1 = rng.randint(0, w - size)
        y1 = rng.randint(0, h - size)
        box = np.array([x1, y1, x1 + size, y1 + size], np.float32)
        ok = True
        for ub in used_boxes:
            ix = max(0.0, min(box[2], ub[2]) - max(box[0], ub[0]))
            iy = max(0.0, min(box[3], ub[3]) - max(box[1], ub[1]))
            inter = ix * iy
            if inter / (size * size) > max_overlap:
                ok = False
                break
        if not ok:
            continue
        hue = rng.rand(3) * 200 + 30
        hue2 = np.clip(hue + (rng.rand(3) * 160 - 80), 0, 255)
        patch = _texture_patch(rng, size, texture, hue, hue2)
        mask = _shape_mask(rng, size, shape)
        region = img[y1:y1 + size, x1:x1 + size]
        region[mask > 0] = patch[mask > 0]
        ys, xs = np.nonzero(mask)
        tight = np.array([x1 + xs.min(), y1 + ys.min(),
                          x1 + xs.max() + 1, y1 + ys.max() + 1], np.float32)
        if full_mask is not None:
            fm = np.zeros(full_mask, np.uint8)
            fm[y1:y1 + size, x1:x1 + size] = mask
            return tight, fm
        return tight
    return None


def _visible_polygon(vis_mask: np.ndarray):
    """Largest visible component of an instance mask -> one simple polygon.

    Holes (the ring class, or occluders punching through the middle) are
    carried via the standard slit trick: outer contour + reversed hole
    contour joined at their nearest points form one simple polygon whose
    rasterization reproduces the mask with the hole.
    """
    cnts, hier = cv2.findContours(vis_mask, cv2.RETR_CCOMP,
                                  cv2.CHAIN_APPROX_TC89_L1)
    if not cnts or hier is None:
        return None
    hier = hier[0]
    # largest outer contour
    outers = [i for i in range(len(cnts)) if hier[i][3] < 0]
    if not outers:
        return None
    oi = max(outers, key=lambda i: cv2.contourArea(cnts[i]))
    outer = cnts[oi][:, 0, :].astype(np.float32)
    if len(outer) < 3:
        return None
    # largest hole of that contour (one slit is enough for this suite)
    holes = [i for i in range(len(cnts)) if hier[i][3] == oi]
    if holes:
        hi = max(holes, key=lambda i: cv2.contourArea(cnts[i]))
        hole = cnts[hi][:, 0, :].astype(np.float32)
        if len(hole) >= 3 and cv2.contourArea(cnts[hi]) > 4:
            d = np.linalg.norm(outer[:, None, :] - hole[None, :, :], axis=-1)
            a, b = np.unravel_index(np.argmin(d), d.shape)
            outer = np.concatenate([
                outer[:a + 1], hole[b:], hole[:b + 1], outer[a:]], axis=0)
    return outer


def make_image(rng, base: int = 640, seg: bool = False):
    aw, ah = ASPECTS[rng.randint(len(ASPECTS))]
    if aw >= ah:
        w, h = base, int(round(base * ah / aw))
    else:
        h, w = base, int(round(base * aw / ah))
    img = _clutter_background(rng, h, w)
    probs = _zipf_probs(len(CLASSES))
    n_obj = rng.randint(8, 49)
    boxes, labels, inst_masks = [], [], []
    for _ in range(n_obj):
        cls_id = int(rng.choice(len(CLASSES), p=probs))
        # log-uniform sizes, biased small: 10..120 px (at base 640)
        size = int(np.exp(rng.uniform(np.log(10), np.log(120))))
        placed = _place(rng, img, boxes, size, cls_id, full_mask=(h, w))
        if placed is None:
            continue
        tight, fmask = placed
        boxes.append(tight)
        labels.append(cls_id)
        inst_masks.append(fmask)
    # ONE annotation policy for both modes: an instance whose visible area
    # (own mask minus everything drawn later — draw order is paint order)
    # falls under 25% is dropped from the labels in detect AND seg mode, so
    # box-vs-seg comparisons on the same seed see the same instance set and
    # detect labels never train on near-fully-occluded foreground. (Masks are
    # computed in both modes now; they consume no RNG, so images for a given
    # seed are bit-identical to the pre-policy-unification generator.)
    polys = None if not seg else []
    kboxes, klabels = [], []
    for i, m in enumerate(inst_masks):
        vis = m.copy()
        for later in inst_masks[i + 1:]:
            vis[later > 0] = 0
        if vis.sum() < 0.25 * m.sum():
            continue  # mostly occluded: drop instance entirely
        if seg:
            poly = _visible_polygon(vis)
            if poly is None:
                continue
            x1, y1 = poly.min(axis=0)
            x2, y2 = poly.max(axis=0)
            if (x2 - x1) < 3 or (y2 - y1) < 3:
                continue
            polys.append(poly)
            kboxes.append(np.array([x1, y1, x2 + 1, y2 + 1], np.float32))
        else:
            kboxes.append(boxes[i])
        klabels.append(labels[i])
    boxes, labels = kboxes, klabels
    # photometric nuisance
    img = img * rng.uniform(0.75, 1.25) + rng.uniform(-20, 20)
    img += rng.randn(h, w, 3) * rng.uniform(0, 8)
    if rng.rand() < 0.3:
        img = cv2.GaussianBlur(img, (3, 3), 0)
    img = np.clip(img, 0, 255).astype(np.uint8)
    return (img, np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(labels), polys)


def write_split(root, split, n, seed, base, seg=False):
    idir = os.path.join(root, split, "images")
    ldir = os.path.join(root, split, "labels")
    os.makedirs(idir, exist_ok=True)
    os.makedirs(ldir, exist_ok=True)
    rng = np.random.RandomState(seed)
    counts = np.zeros(len(CLASSES), np.int64)
    for i in range(n):
        img, boxes, labels, polys = make_image(rng, base, seg=seg)
        h, w = img.shape[:2]
        cv2.imwrite(os.path.join(idir, f"{i:05d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
        lines = []
        for j, ((x1, y1, x2, y2), c) in enumerate(zip(boxes, labels)):
            if seg:
                pts = polys[j] / np.array([w, h], np.float32)
                pts = np.clip(pts, 0.0, 1.0)
                coords = " ".join(f"{v:.5f}" for v in pts.reshape(-1))
                lines.append(f"{int(c)} {coords}")
            else:
                cx, cy = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
                bw, bh = (x2 - x1) / w, (y2 - y1) / h
                lines.append(f"{int(c)} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
            counts[int(c)] += 1
        with open(os.path.join(ldir, f"{i:05d}.txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_train", type=int, default=1600)
    ap.add_argument("--n_val", type=int, default=400)
    ap.add_argument("--base", type=int, default=640)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--seg", action="store_true",
                    help="emit YOLO-seg polygon labels (occlusion-aware "
                         "visible regions; ring holes via slit polygons)")
    args = ap.parse_args()

    tc = write_split(args.out, "train", args.n_train, args.seed, args.base,
                     seg=args.seg)
    vc = write_split(args.out, "valid", args.n_val, args.seed + 1, args.base,
                     seg=args.seg)
    with open(os.path.join(args.out, "data.yaml"), "w") as f:
        yaml.safe_dump({"train": f"{args.out}/train/images",
                        "val": f"{args.out}/valid/images",
                        "nc": len(CLASSES), "names": CLASSES}, f)
    print(f"train instances per class: {tc.tolist()}")
    print(f"val   instances per class: {vc.tolist()}")
    print(f"total train {tc.sum()} val {vc.sum()} "
          f"imbalance max/min {tc.max() / max(1, tc.min()):.1f}x")


if __name__ == "__main__":
    main()
