"""Space-to-depth stem rewrite (deploy-time, exact): feed the detector a
2x2-block-packed uint8 image and run the stem conv with a 2x2/s1 kernel.

The zoo's stem is a 3x3 stride-2 conv with 3 input channels. On TPU the MXU
contracts 128-wide; an im2col contraction of 3x3x3=27 taps over a 3-channel
minor-dim image utilizes a fraction of the lanes and keeps the stem at
~150 GiB/s HBM (the single most expensive op of the deployed edge_n graph,
~1.6 ms of 10.6 ms per batch-128 @640). Packing non-overlapping 2x2 pixel
blocks into channels ([B,H,W,3]u8 -> [B,H/2,W/2,12]u8, a pure byte shuffle)
turns the same convolution into a 2x2 stride-1 conv over 12 channels
(contraction 48) producing bit-identical-in-f32 outputs. The zoo's ConvBNAct
pads symmetrically (1,1) (models/layers.py:64), so output position p reads
input rows 2p-1..2p+1: tap ki maps to kernel block position pi and phase di
via ki = 2*pi + di - 1 ((pi,di)=(0,0) falls outside the 3x3 kernel and stays
zero), and the rewritten conv pads (1,0) at block granularity — preserving
the zero-pad border semantics exactly (and the folded-normalization
correction conv runs through the same rewritten kernel, see
deploy/fold_norm.py).

Measured on v5e (edge_n @640 b128, full deploy graph): 10.7 -> 10.1 ms
(+8% img/s device-side). The pack must happen on the HOST: on-device
packing (6D transpose or strided slices + concat) costs more than the conv
saving — uint8 shuffles don't fuse and run on the VPU. Host cost is a
strided memcpy (~2 ms/img single-core, ~tens of us/img on a real serving
host's cores) folded into the letterbox step; enable via
Predictor(s2d_stem=True) when host cores are available.

Box outputs differ from the unpacked graph by bf16 accumulation-order noise
only (same detection selections; <2px at 640 — tests/test_s2d.py checks
f32 exactness and bf16 selection parity).

Reference: the stem this rewrites is the reference's timm conv_stem
(/root/reference/scripts/model/model_v2.py:94-101 backbone probing); the
reference has no TPU analogue of this transform.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .fold_norm import A, B, _find_stem, _tree_copy

# The stem conv pads (1,1) (models/layers.py ConvBNAct); at block granularity
# the rewritten 2x2/s1 conv pads (1,0) per axis.
_PAD = ((1, 0), (1, 0))


def rewrite_stem_kernel(w) -> np.ndarray:
    """[3,3,3,O] (or [3,3,3k,O]) -> [2,2,12k,O], exact tap remapping."""
    w = np.asarray(w, np.float32)
    kh, kw, cin, cout = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"s2d stem rewrite expects a 3x3 kernel, got {w.shape}")
    w2 = np.zeros((2, 2, 4 * cin, cout), np.float32)
    for pi in range(2):
        for di in range(2):
            ki = 2 * pi + di - 1
            if not 0 <= ki <= 2:
                continue
            for pj in range(2):
                for dj in range(2):
                    kj = 2 * pj + dj - 1
                    if not 0 <= kj <= 2:
                        continue
                    ph = di * 2 + dj
                    w2[pi, pj, ph * cin:(ph + 1) * cin, :] = w[ki, kj, :, :]
    return w2


def rewrite_stem_to_s2d(params) -> Tuple[Dict, bool]:
    """Return params with the stem conv kernel rewritten to 2x2x12.

    Apply AFTER fold_normalization (the per-channel normalize slope is baked
    into the 3-channel kernel first; the rewrite only permutes taps).
    Returns (params', ok) — ok=False when no 3-channel 3x3/s2 stem is found.
    """
    path, cin = _find_stem(params)
    if path is None or cin != 3:
        return params, False
    p = _tree_copy(params)
    node = p
    for k in path[:-1]:
        node = node[k]
    kern = np.asarray(node[path[-1]]["kernel"])
    if kern.shape[:2] != (3, 3):
        return params, False
    node[path[-1]] = dict(node[path[-1]],
                          kernel=jnp.asarray(rewrite_stem_kernel(kern)))
    return p, True


def pack_s2d(images: np.ndarray) -> np.ndarray:
    """Host-side pack [B,H,W,C] (or [H,W,C]) uint8 -> [...,H/2,W/2,4C].

    Phase order (di,dj)-major matches rewrite_stem_kernel. Uses the native
    C++ kernel (yl_pack_s2d, ~8x the numpy strided assignment) when the
    toolchain is available; numpy fallback otherwise.
    """
    squeeze = images.ndim == 3
    if squeeze:
        images = images[None]
    b, h, w, c = images.shape
    if h % 2 or w % 2:
        raise ValueError(f"s2d pack needs even H,W, got {(h, w)}")
    if images.dtype == np.uint8:
        from yololite_tpu.native import pack_s2d_native
        out = pack_s2d_native(np.asarray(images))
        if out is not None:
            return out[0] if squeeze else out
    out = np.empty((b, h // 2, w // 2, 4 * c), images.dtype)
    for di in range(2):
        for dj in range(2):
            ph = di * 2 + dj
            out[..., ph * c:(ph + 1) * c] = images[:, di::2, dj::2, :]
    return out[0] if squeeze else out


def _s2d_interceptor(next_fn, args, kwargs, context):
    """Run the rewritten stem conv (2x2/s1, pad (0,1)) + the folded-normalize
    correction term. Matches the stem by its rewritten 12-channel kernel."""
    mod = context.module
    if isinstance(mod, nn.Conv) and context.method_name == "__call__":
        x = args[0]
        if x.ndim == 4 and x.shape[-1] == 12:
            w = jnp.asarray(mod.variables["params"]["kernel"],
                            mod.dtype or jnp.float32)
            if w.shape[:3] == (2, 2, 12):
                y = jax.lax.conv_general_dilated(
                    x, w, window_strides=(1, 1), padding=_PAD,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                c = jnp.asarray(np.tile(B / A, 4), jnp.float32)
                corr_in = jnp.broadcast_to(c, (1,) + x.shape[1:]).astype(
                    mod.dtype or jnp.float32)
                corr = jax.lax.conv_general_dilated(
                    corr_in, w, window_strides=(1, 1), padding=_PAD,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return y + corr
    return next_fn(*args, **kwargs)


@contextlib.contextmanager
def s2d_stem():
    """`with s2d_stem(): model.apply(s2d_params, raw_cast(packed_u8, dtype))`
    — packed_u8 from pack_s2d; params from fold_normalization then
    rewrite_stem_to_s2d. Subsumes folded_stem() (the correction term is
    applied here; do not nest both)."""
    with nn.intercept_methods(_s2d_interceptor):
        yield
