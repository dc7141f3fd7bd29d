"""Instance-mask assembly: prototypes x coefficients, per-box crop (YOLACT-style).

This implements the V2 instance-segmentation capability (reference README.md:13
"Instance Segmentation: Native support"; results['masks'] in README.md:39; the
V1 repo has no mask source — BASELINE.json config #4 names "mask prototypes +
per-box crop" as the mechanism, re-designed TPU-first here):

  - protonet emits prototypes P [Hp, Wp, K] at stride 4
  - every anchor predicts K mask coefficients c
  - instance mask = sigmoid(P @ c), cropped to the detection box
  - everything static-shape: masks are assembled only for the fixed max_det
    (or max_pos for the loss) slots, crop is a soft rectangular mask, upsample
    to full resolution happens once at the end (or on host for deploy).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def crop_mask_to_box(masks: jnp.ndarray, boxes: jnp.ndarray,
                     img_size: float) -> jnp.ndarray:
    """Zero out mask pixels outside each box.

    masks [D, Hp, Wp] (probabilities), boxes [D, 4] xyxy in IMAGE pixels.
    """
    d, hp, wp = masks.shape
    ys = (jnp.arange(hp, dtype=jnp.float32) + 0.5) * (img_size / hp)
    xs = (jnp.arange(wp, dtype=jnp.float32) + 0.5) * (img_size / wp)
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    in_x = (xs[None, None, :] >= x1[:, None, None]) & (xs[None, None, :] <= x2[:, None, None])
    in_y = (ys[None, :, None] >= y1[:, None, None]) & (ys[None, :, None] <= y2[:, None, None])
    return masks * (in_x & in_y).astype(masks.dtype)


def assemble_masks(protos: jnp.ndarray, coeffs: jnp.ndarray, boxes: jnp.ndarray,
                   img_size: float, crop: bool = True,
                   logits: bool = False) -> jnp.ndarray:
    """protos [Hp, Wp, K] x coeffs [D, K] -> masks [D, Hp, Wp].

    The matmul is the MXU-friendly hot op: (Hp*Wp, K) @ (K, D).
    """
    hp, wp, k = protos.shape
    m = jnp.einsum("hwk,dk->dhw", protos.astype(jnp.float32),
                   coeffs.astype(jnp.float32))
    if not logits:
        m = jax.nn.sigmoid(m)
    if crop:
        m = crop_mask_to_box(m, boxes, img_size)
    return m


def assemble_masks_batch(protos: jnp.ndarray, coeffs: jnp.ndarray,
                         boxes: jnp.ndarray, img_size: float,
                         crop: bool = True) -> jnp.ndarray:
    """[B,Hp,Wp,K] x [B,D,K] x [B,D,4] -> [B,D,Hp,Wp]."""
    return jax.vmap(lambda p, c, b: assemble_masks(p, c, b, img_size, crop))(
        protos, coeffs, boxes)


def upsample_masks(masks: jnp.ndarray, out_hw: Tuple[int, int],
                   threshold: Optional[float] = 0.5) -> jnp.ndarray:
    """[.., Hp, Wp] -> [.., H, W]; optionally binarize at `threshold`."""
    out_shape = (*masks.shape[:-2], *out_hw)
    up = jax.image.resize(masks, out_shape, method="bilinear")
    if threshold is not None:
        return (up > threshold).astype(jnp.uint8)
    return up


def rle_encode_np(mask) -> dict:
    """Binary [H, W] mask -> COCO-style uncompressed RLE.

    Column-major (Fortran) scan, alternating run lengths starting with the
    count of zeros — the exact convention of pycocotools' `frPyObjects`
    uncompressed dict, so these interop with pycocotools when present. Full-
    resolution instance masks are stored this way during evaluation (reference
    V2 returns image-resolution masks, README.md:41): a few hundred bytes per
    instance instead of H*W booleans.
    """
    import numpy as np
    mask = np.asarray(mask)
    h, w = mask.shape
    flat = (mask > 0).flatten(order="F")
    # run-length: positions where the value changes
    change = np.nonzero(np.diff(flat))[0] + 1
    idx = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(idx)
    if flat.size and flat[0]:  # counts must start with a zero-run
        counts = np.concatenate([[0], counts])
    return {"size": [int(h), int(w)], "counts": counts.astype(np.uint32)}


def rle_decode_np(rle: dict):
    """COCO uncompressed RLE -> binary [H, W] uint8 mask."""
    import numpy as np
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], np.int64)
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    if flat.size < h * w:
        flat = np.concatenate([flat, np.zeros(h * w - flat.size, np.uint8)])
    return flat[: h * w].reshape((h, w), order="F")


def rle_area(rle: dict) -> int:
    """Foreground pixel count straight from the run lengths (no decode)."""
    import numpy as np
    counts = np.asarray(rle["counts"], np.int64)
    return int(counts[1::2].sum())


def rasterize_box_masks_np(boxes, img_size: int, proto_size: int):
    """Host helper: GT boxes -> rectangular masks [M, proto, proto] (used when
    only box labels exist; polygon labels rasterize via cv2.fillPoly)."""
    import numpy as np
    m = len(boxes)
    out = np.zeros((m, proto_size, proto_size), np.float32)
    scale = proto_size / float(img_size)
    for i, (x1, y1, x2, y2) in enumerate(np.asarray(boxes, np.float32)):
        xa, ya = int(round(x1 * scale)), int(round(y1 * scale))
        xb, yb = int(round(x2 * scale)), int(round(y2 * scale))
        out[i, max(0, ya):max(0, yb), max(0, xa):max(0, xb)] = 1.0
    return out

def assemble_masks_np(protos, coeffs, boxes, img_size: float,
                      crop: bool = True):
    """Pure-numpy twin of assemble_masks for host-only deploy runners
    (tools/infer_exported.py consuming `decoded` seg artifacts):
    protos [Hp,Wp,K] x coeffs [D,K] -> [D,Hp,Wp] probabilities, cropped to
    boxes (letterbox pixels)."""
    import numpy as _np
    protos = _np.asarray(protos, _np.float32)
    coeffs = _np.asarray(coeffs, _np.float32)
    hp, wp, _ = protos.shape
    m = 1.0 / (1.0 + _np.exp(-_np.einsum("hwk,dk->dhw", protos, coeffs)))
    if crop and len(boxes):
        ys = (_np.arange(hp, dtype=_np.float32) + 0.5) * (img_size / hp)
        xs = (_np.arange(wp, dtype=_np.float32) + 0.5) * (img_size / wp)
        b = _np.asarray(boxes, _np.float32)
        in_x = (xs[None, None, :] >= b[:, 0, None, None]) & \
               (xs[None, None, :] <= b[:, 2, None, None])
        in_y = (ys[None, :, None] >= b[:, 1, None, None]) & \
               (ys[None, :, None] <= b[:, 3, None, None])
        m = m * (in_x & in_y)
    return m
