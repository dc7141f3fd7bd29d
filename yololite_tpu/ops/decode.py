"""Anchor-free decode: raw head maps -> (boxes xyxy px, obj logits, cls logits).

This is the ONE decode implementation, shared by train-val, inference, export and
the loss (the reference keeps 4 near-identical copies:
  scripts/helpers/utils_ms.py:26-123, scripts/helpers/helpers.py:253-435,
  tools/infer.py:247-389, export/export_onnx.py:111-175 — collapsed here).

Center modes (utils_ms.py:82-88):
  v8:     px = (sigmoid(tx) * 2 - 0.5 + gx) * stride
  simple: px = (sigmoid(tx) + gx) * stride
WH modes (utils_ms.py:90-99):
  v8:       pw = (sigmoid(tw) * 2)^2 * stride
  softplus: pw = softplus(tw) * stride
  exp:      pw = exp(clamp(tw)) * stride   (clamp (-4,4) infer / (-10,8) loss)

Fully static shapes; everything fuses into the surrounding jit graph.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from yololite_tpu.ops.anchors import make_anchors


def flatten_levels(preds_levels: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, Tuple[Tuple[int, int], ...]]:
    """List of per-level maps [B,A,S,S,E] or [B,S,S,E] -> ([B,N,E], level shapes).

    Row-major flatten over (A,S,S) matches the anchor grid order (A==1 in the
    anchor-free formulation, reference tools/train.py passes anchors_per_level=1).
    """
    flat, shapes = [], []
    for p in preds_levels:
        if p.ndim == 4:  # [B,S,S,E]
            b, h, w, e = p.shape
            flat.append(p.reshape(b, h * w, e))
            shapes.append((h, w))
        elif p.ndim == 5:  # [B,A,S,S,E]
            b, a, h, w, e = p.shape
            flat.append(p.reshape(b, a * h * w, e))
            shapes.append((h, w))
        else:
            raise ValueError(f"bad pred level shape {p.shape}")
    return jnp.concatenate(flat, axis=1), tuple(shapes)


def decode_flat(
    preds_flat: jnp.ndarray,        # [B, N, 5+C(+K)] raw logits
    anchor_points: jnp.ndarray,     # [N, 2] (gx, gy)
    strides: jnp.ndarray,           # [N]
    *,
    center_mode: str = "v8",
    wh_mode: str = "softplus",
    exp_clamp: Tuple[float, float] = (-4.0, 4.0),
    img_size: Optional[int] = None,  # clamp boxes to [0, img_size-1] if given
    num_classes: Optional[int] = None,  # set when trailing mask coeffs exist
):
    """Decode flattened raw predictions.

    Returns dict: box [B,N,4] xyxy px; obj [B,N] logits; cls [B,N,C] logits;
    ctr [B,N,2] centers px; wh [B,N,2] sizes px (ctr/wh are used by the loss);
    coef [B,N,K] mask coefficients (tanh already applied by the head) when
    `num_classes` is given and the tail is non-empty.
    """
    s = strides[None, :, None]      # [1,N,1]
    a = anchor_points[None, :, :]   # [1,N,2]
    txy = preds_flat[..., 0:2]
    twh = preds_flat[..., 2:4]

    if center_mode == "v8":
        xy = (jax.nn.sigmoid(txy) * 2.0 - 0.5 + a) * s
    elif center_mode == "simple":
        xy = (jax.nn.sigmoid(txy) + a) * s
    else:
        raise ValueError(f"center_mode {center_mode!r}")

    if wh_mode == "v8":
        wh = jnp.square(jax.nn.sigmoid(twh) * 2.0) * s
    elif wh_mode == "softplus":
        wh = jax.nn.softplus(twh) * s
    elif wh_mode == "exp":
        wh = jnp.exp(jnp.clip(twh, exp_clamp[0], exp_clamp[1])) * s
    else:
        raise ValueError(f"wh_mode {wh_mode!r}")

    x1y1 = xy - 0.5 * wh
    x2y2 = xy + 0.5 * wh
    box = jnp.concatenate([x1y1, x2y2], axis=-1)
    if img_size is not None:
        box = jnp.clip(box, 0.0, float(img_size) - 1.0)

    if num_classes is None:
        cls = preds_flat[..., 5:]
        coef = preds_flat[..., :0]
    else:
        cls = preds_flat[..., 5:5 + num_classes]
        coef = preds_flat[..., 5 + num_classes:]
    return {
        "box": box,
        "obj": preds_flat[..., 4],
        "cls": cls,
        "ctr": xy,
        "wh": wh,
        "coef": coef,
    }


def decode_anchorfree(
    preds_levels: Sequence[jnp.ndarray],
    img_size: int,
    *,
    center_mode: str = "v8",
    wh_mode: str = "softplus",
    clamp: bool = True,
    num_classes: Optional[int] = None,
):
    """Decode per-level raw maps (parity with decode_preds_anchorfree utils_ms.py:26-123).

    Returns {"box": [B,N,4] xyxy px (clamped), "obj": [B,N,1], "cls": [B,N,C]}
    plus "coef" [B,N,K] when num_classes is given (segmentation heads).
    """
    flat, shapes = flatten_levels(preds_levels)
    pts, strides = make_anchors(shapes, img_size)
    d = decode_flat(flat, pts, strides, center_mode=center_mode, wh_mode=wh_mode,
                    exp_clamp=(-4.0, 4.0), img_size=img_size if clamp else None,
                    num_classes=num_classes)
    return {"box": d["box"], "obj": d["obj"][..., None], "cls": d["cls"],
            "coef": d["coef"]}
