"""Fuse the decoupled head's 1x1 convs into one conv (deploy-time, exact).

The reference's decoupled head runs three (four with masks) separate 1x1
convolutions — box/obj/cls(/mcoef) — over the same trunk activation
(scripts/model/model_v2.py:42-53). Each tiny-output conv is HBM-bound on its
INPUT read, so the trunk tensor is pulled from HBM 3-4 times per level
(~0.55 ms/batch on edge_n @640 b128). A 1x1 conv is a matmul over channels,
so concatenating the kernels along the output axis yields ONE conv whose
output is the channel-concat of the originals — exact, same contraction per
output channel.

Checkpoints keep the reference's split parameter layout; this transform is
applied at load time by the Predictor / bench when the model is built with
`fused_head=True` (models/detector.py DetectHead.fused).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


_PARTS = ("box", "obj", "cls", "mcoef")  # concat order == DetectHead.fused


def _fuse_one(head: Dict) -> Dict:
    """Rewrite one head's param subtree: split 1x1 convs -> fused_out."""
    out = {k: v for k, v in head.items() if k not in _PARTS}
    parts = [head[p] for p in _PARTS if p in head]
    kernel = np.concatenate([np.asarray(p["kernel"]) for p in parts], axis=-1)
    fused = {"kernel": kernel}
    if "bias" in parts[0]:
        fused["bias"] = np.concatenate(
            [np.asarray(p["bias"]) for p in parts], axis=-1)
    out["fused_out"] = fused
    return out


def fuse_head_params(params: Dict) -> Tuple[Dict, bool]:
    """Return (params', ok) with every head{2..6} subtree fused.

    `ok` is False (params returned unchanged) when no head subtree with the
    expected split convs is present (e.g. already-fused params).
    """
    heads = [k for k in params
             if k.startswith("head") and isinstance(params[k], dict)
             and "box" in params[k]]
    if not heads:
        return params, False
    out = {k: (_fuse_one(v) if k in heads else v) for k, v in params.items()}
    return out, True
