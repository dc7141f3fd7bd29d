"""Int8 quantized inference path (opt-in, post-training dynamic quantization).

The edge-model forward pass is HBM-bandwidth-bound (~8% MXU utilization,
BENCHMARK_TPU.md): inter-layer activation traffic dominates. This module
quantizes every conv's INPUT activations to int8 (dynamic per-tensor scale)
and its weights to int8 (per-output-channel scale), computing the convolution
as s8 x s8 -> s32 on the MXU — int8 tensors between layers halve traffic vs
bf16 and the MXU's int8 path doubles peak throughput.

Implementation: a flax `intercept_methods` interceptor — NO model changes.
Every `nn.Conv` call inside the intercepted apply is replaced by
quantize -> int8 conv -> rescale; BN/activations stay bf16/f32 and fuse into
the conv epilogue as usual. XLA fuses the quantize into the producing op, so
the materialized inter-layer tensor IS the int8 one.

Accuracy: dynamic per-tensor activation quantization after ReLU-family
activations typically costs well under 1 mAP on detection; measure with
`Predictor(..., quantize="int8")` + tools/evaluate.py before deploying.
Tiny convs (first layer on 3-channel input, SE squeeze convs) stay in bf16 —
their traffic is negligible and 3-channel quant hurts accuracy most.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from flax import linen as nn


def _int8_conv(mod: nn.Conv, x: jnp.ndarray) -> jnp.ndarray:
    """Replicate nn.Conv's forward with int8 inputs/weights + f32 rescale."""
    w = mod.variables["params"]["kernel"]          # [kh,kw,cin/g,cout]
    b = mod.variables["params"].get("bias") if mod.use_bias else None

    # per-output-channel symmetric weight scale
    wf = jnp.asarray(w, jnp.float32)
    s_w = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0          # [cout]
    w_q = jnp.clip(jnp.round(wf / jnp.maximum(s_w, 1e-12)), -127, 127
                   ).astype(jnp.int8)

    # dynamic per-tensor activation scale
    xf = jnp.asarray(x, jnp.float32)
    s_x = jnp.max(jnp.abs(xf)) / 127.0
    x_q = jnp.clip(jnp.round(xf / jnp.maximum(s_x, 1e-12)), -127, 127
                   ).astype(jnp.int8)

    strides = mod.strides if isinstance(mod.strides, (tuple, list)) else \
        (mod.strides, mod.strides)
    padding = mod.padding
    groups = mod.feature_group_count
    out = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=tuple(strides), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * (s_x * s_w)
    if b is not None:
        out = out + jnp.asarray(b, jnp.float32)
    return out.astype(mod.dtype or jnp.float32)


def _should_quantize(mod: nn.Conv, x) -> bool:
    cin = x.shape[-1]
    kh, kw = (mod.kernel_size if isinstance(mod.kernel_size, (tuple, list))
              else (mod.kernel_size, mod.kernel_size))
    # skip the image-input conv and 1x1 SE squeeze/excite convs on pooled
    # [B,1,1,C] tensors — negligible traffic, highest accuracy cost
    if cin <= 4:
        return False
    if x.ndim == 4 and x.shape[1] == 1 and x.shape[2] == 1:
        return False
    return True


def quant_interceptor(next_fn, args, kwargs, context):
    mod = context.module
    if (isinstance(mod, nn.Conv) and context.method_name == "__call__"
            and _should_quantize(mod, args[0])):
        return _int8_conv(mod, args[0])
    return next_fn(*args, **kwargs)


@contextlib.contextmanager
def int8_inference():
    """Context manager: `with int8_inference(): model.apply(...)` runs every
    conv in the int8 path."""
    with nn.intercept_methods(quant_interceptor):
        yield


# --------------------------------------------------------------------------- #
# Quantization-aware training (QAT)
# --------------------------------------------------------------------------- #

def _ste(x: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Straight-through estimator: forward = q, gradient = identity on x."""
    return x + jax.lax.stop_gradient(q - x)


def _fake_quant_conv(mod: nn.Conv, x: jnp.ndarray) -> jnp.ndarray:
    """Conv with fake-quantized (quantize->dequantize, STE) inputs + weights.

    Mirrors `_int8_conv`'s arithmetic — per-output-channel symmetric weight
    scale, dynamic per-tensor activation scale — but stays in float so
    gradients flow: the network learns weights/activations that live on the
    int8 grid, recovering the (small) PTQ accuracy gap for int8 deploys.

    Caveat (documented scope): deploy-time BN folding (deploy/fold_norm.py)
    changes the effective conv weights before their scales are taken, so QAT
    here trains against unfolded-weight scales. The dominant PTQ error source
    — activation clipping/rounding — is simulated exactly; weight-grid error
    is second-order at 8 bits.
    """
    w = mod.variables["params"]["kernel"]
    b = mod.variables["params"].get("bias") if mod.use_bias else None

    wf = jnp.asarray(w, jnp.float32)
    s_w = jax.lax.stop_gradient(jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0)
    s_w = jnp.maximum(s_w, 1e-12)
    w_fq = _ste(wf, jnp.clip(jnp.round(wf / s_w), -127, 127) * s_w)

    xf = jnp.asarray(x, jnp.float32)
    s_x = jax.lax.stop_gradient(jnp.max(jnp.abs(xf)) / 127.0)
    s_x = jnp.maximum(s_x, 1e-12)
    x_fq = _ste(xf, jnp.clip(jnp.round(xf / s_x), -127, 127) * s_x)

    strides = mod.strides if isinstance(mod.strides, (tuple, list)) else \
        (mod.strides, mod.strides)
    out = jax.lax.conv_general_dilated(
        x_fq, w_fq, window_strides=tuple(strides), padding=mod.padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mod.feature_group_count)
    if b is not None:
        out = out + jnp.asarray(b, jnp.float32)
    return out.astype(mod.dtype or jnp.float32)


def qat_interceptor(next_fn, args, kwargs, context):
    mod = context.module
    if (isinstance(mod, nn.Conv) and context.method_name == "__call__"
            and _should_quantize(mod, args[0])):
        return _fake_quant_conv(mod, args[0])
    return next_fn(*args, **kwargs)


@contextlib.contextmanager
def fake_quant_training():
    """Context manager: wrap `model.apply` (train or eval) so every quantized
    conv runs the fake-quant QAT path. Enable with `training.qat: true`."""
    with nn.intercept_methods(qat_interceptor):
        yield
