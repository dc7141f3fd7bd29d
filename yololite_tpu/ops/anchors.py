"""Anchor-point grids for the anchor-free heads.

Parity: reference `LossAF._make_anchors` (scripts/loss/loss.py:244-256):
  - per level of grid (H, W): anchor points are cell indices (gx, gy), row-major
    over (y, x); stride = img_size / max(H, W).
  - levels are concatenated in head order (P2?, P3, P4, P5, P6?).

Grids are computed once per (img_size, level-shape tuple) on the host and become
jit-time constants — there is no dynamic shape anywhere.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=64)
def _make_anchors_np(level_hw: Tuple[Tuple[int, int], ...], img_size: int):
    pts, strides = [], []
    for (h, w) in level_hw:
        stride = img_size / float(max(h, w))
        gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(np.float32))
        strides.append(np.full((h * w,), stride, dtype=np.float32))
    return np.concatenate(pts, 0), np.concatenate(strides, 0)


def make_anchors(level_hw: Sequence[Tuple[int, int]], img_size: int):
    """Return (anchor_points [N,2] float32 (gx,gy) cell coords, strides [N] float32)."""
    pts, strides = _make_anchors_np(tuple(tuple(s) for s in level_hw), int(img_size))
    return jnp.asarray(pts), jnp.asarray(strides)


def level_shapes_for(img_size: int, fpn_strides: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    """Grid (H, W) per FPN level for a square input of side ``img_size``."""
    return tuple((int(np.ceil(img_size / s)), int(np.ceil(img_size / s))) for s in fpn_strides)


def num_anchors_total(img_size: int, fpn_strides: Sequence[int]) -> int:
    return int(sum(h * w for h, w in level_shapes_for(img_size, fpn_strides)))
