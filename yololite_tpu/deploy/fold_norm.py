"""Fold ImageNet input normalization into the stem conv (deploy-time, exact).

The deployed graph's first materialized tensor is the normalized image:
uint8 -> (x/255 - mean)/std -> bf16, a [B,640,640,3] write + read that costs
~1.1 ms per batch-128 on v5e (~10% of the forward — the graph is
HBM-bandwidth-bound and XLA does not fuse elementwise producers into
convolutions). Normalization is affine per channel, x_n = a*x + b, and the
convolution is linear, so

    conv(w)(a*x + b*inside) = conv(w*a)(x) + conv(w*a)((b/a)*ones)

exactly — including the zero-padding semantics (the conv's implicit zero pad
is zero in NORMALIZED space; both right-hand terms zero-pad too, so border
pixels match bit-for-bit up to float rounding). The framework implements the
left term by scaling the stem kernel (`fold_normalization`) and the right
term by running a single constant image through the same conv
(`folded_stem` interceptor) — batch size 1, so it costs 1/B of the stem conv
and its add fuses into the conv epilogue. The model then consumes the RAW
uint8 image cast to compute dtype (integers 0..255 are exact in bf16).

Net effect on edge_n @640 b128: the full deploy graph drops from ~13.7 ms to
~12.4 ms per batch (bytes accessed 10.1 -> 8.8 GB). Used by the Predictor
(fold_normalize=True default) and bench.py; parity tested in
tests/test_fold_norm.py.

The stem conv is identified by its input channel count (3, or 12 after the
Focus space-to-depth stem) — no other conv in the zoo has a 3/12-channel
input.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (x/255 - mean)/std == x * a + b, channel-wise (steps.py IMAGENET constants)
_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_STD = np.asarray([0.229, 0.224, 0.225], np.float32)
A = (1.0 / (255.0 * _STD)).astype(np.float32)
B = (-_MEAN / _STD).astype(np.float32)


def _tree_copy(t):
    if hasattr(t, "items"):
        return {k: _tree_copy(v) for k, v in t.items()}
    return t


def _find_stem(params) -> Tuple[Tuple[str, ...], int]:
    """Locate the backbone stem conv; returns (path, cin) or (None, 0)."""
    bb = params.get("backbone", params)
    for stem in ("ConvBNAct_0", "Focus_0"):
        if stem not in bb:
            continue
        node = bb[stem]
        if stem == "Focus_0":
            node = node.get("ConvBNAct_0", {})
        kern = node.get("Conv_0", {}).get("kernel")
        if kern is None:
            continue
        cin = np.asarray(kern).shape[2]
        if cin in (3, 12):
            path = (("backbone",) if "backbone" in params else ()) + \
                ((stem, "ConvBNAct_0") if stem == "Focus_0" else (stem,))
            return path + ("Conv_0",), cin
    return None, 0


def fold_normalization(params, batch_stats) -> Tuple[Dict, Dict, bool]:
    """Scale the stem conv kernel by the per-channel normalize slope `a`.
    batch_stats pass through unchanged (the bias term is added at apply time
    by the `folded_stem` interceptor). Returns (params', batch_stats, ok)."""
    path, cin = _find_stem(params)
    if path is None:
        return params, batch_stats, False
    p = _tree_copy(params)
    node = p
    for k in path:
        node = node[k]
    kern = np.asarray(node["kernel"], np.float32)
    a = np.tile(A, cin // 3)
    node["kernel"] = (kern * a[None, None, :, None]).astype(
        np.asarray(node["kernel"]).dtype)
    return p, batch_stats, True


def _stem_interceptor(next_fn, args, kwargs, context):
    mod = context.module
    if isinstance(mod, nn.Conv) and context.method_name == "__call__":
        x = args[0]
        cin = x.shape[-1]
        if x.ndim == 4 and cin in (3, 12):
            c = jnp.asarray(np.tile(B / A, cin // 3), jnp.float32)
            corr_in = jnp.broadcast_to(c, (1,) + x.shape[1:]).astype(
                mod.dtype or jnp.float32)
            # conv of the constant image through the SAME (scaled) kernel —
            # can't call next_fn twice (param re-registration), so replicate
            # the conv with lax on the module's variables. Batch 1: costs
            # 1/B of the stem conv; the add fuses into the conv epilogue.
            w = jnp.asarray(mod.variables["params"]["kernel"],
                            mod.dtype or jnp.float32)
            strides = mod.strides if isinstance(mod.strides, (tuple, list)) \
                else (mod.strides, mod.strides)
            import jax as _jax
            corr = _jax.lax.conv_general_dilated(
                corr_in, w, window_strides=tuple(strides),
                padding=mod.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=mod.feature_group_count)
            return next_fn(x) + corr
    return next_fn(*args, **kwargs)


@contextlib.contextmanager
def folded_stem():
    """`with folded_stem(): model.apply(folded_params, raw_cast(u8, dtype))`
    — adds the normalize-bias contribution through the (scaled) stem conv."""
    with nn.intercept_methods(_stem_interceptor):
        yield


def raw_cast(images_u8, dtype):
    """Input transform matching folded parameters."""
    return images_u8.astype(dtype)
