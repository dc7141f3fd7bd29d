"""TPU-friendly building blocks (flax.linen, NHWC, bf16-compute/f32-param).

Block vocabulary covering the reference's model layer (scripts/model/model_v2.py)
plus the backbone zoo (the reference consumes timm; we implement the blocks):
  - ConvBNAct      = reference conv_block unit (model_v2.py:15-22)
  - DWConvBlock    = depthwise-separable + ReLU (model_v2.py:23-39)
  - MBConv / FusedMBConv (EfficientNet-Lite / EfficientNetV2 families)
  - UIB            (MobileNetV4 universal inverted bottleneck)
  - ResNet BasicBlock, ConvNeXtV2 block (with GRN), CSP bottleneck, HG block

All convs are bias-free followed by BatchNorm unless noted — XLA fuses the
BN affine + activation into the conv epilogue, which is the TPU equivalent of
the "fold BN at inference" deploy trick.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Reference-parity weight init: torch Conv2d default kaiming_uniform(a=sqrt(5))
# = U(-1/sqrt(fan_in), 1/sqrt(fan_in)) = variance_scaling(1/3, fan_in, uniform)
# (model_v2.py uses torch defaults; flax's lecun_normal converged measurably
# slower in the r3 head-to-head training comparison).
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                   "uniform")
TConv = partial(nn.Conv, kernel_init=torch_conv_init)

ACTS = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "relu6": lambda x: jnp.minimum(jax.nn.relu(x), 6.0),
    "gelu": jax.nn.gelu,
    "hardswish": jax.nn.hard_swish,
    None: lambda x: x,
    "none": lambda x: x,
}


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return int(new_v)


def constant_bias_init(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)
    return init


class ConvBNAct(nn.Module):
    """Conv2D (no bias) -> BatchNorm -> activation. NHWC."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: Optional[str] = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = TConv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return ACTS[self.act](x)


class ConvBlock(nn.Module):
    """n x (Conv3x3-BN-SiLU): the reference FPN smooth block (model_v2.py:15-22)."""
    features: int
    n: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.n):
            x = ConvBNAct(self.features, 3, 1, act=self.act, dtype=self.dtype)(x, train)
        return x


class DWConvBlock(nn.Module):
    """n x (DWConv3x3 -> Conv1x1 -> BN -> ReLU): reference model_v2.py:23-39.

    Note: the reference applies BN only after the pointwise conv; we keep that.
    """
    features: int
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.n):
            c_in = x.shape[-1]
            x = TConv(c_in, (3, 3), padding=[(1, 1), (1, 1)],
                        feature_group_count=c_in, use_bias=False, dtype=self.dtype)(x)
            x = TConv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = jax.nn.relu(x)
        return x


class SqueezeExcite(nn.Module):
    se_features: int
    gate: Callable = jax.nn.sigmoid
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = TConv(self.se_features, (1, 1), dtype=self.dtype)(s)
        s = ACTS[self.act](s)
        s = TConv(x.shape[-1], (1, 1), dtype=self.dtype)(s)
        return x * self.gate(s)


class MBConv(nn.Module):
    """Inverted residual (MobileNetV2/EfficientNet). se_ratio=0 disables SE (Lite)."""
    features: int
    expand: float = 6.0
    kernel: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    act: str = "relu6"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        h = x
        mid = make_divisible(c_in * self.expand)
        if self.expand != 1.0:
            h = ConvBNAct(mid, 1, 1, act=self.act, dtype=self.dtype)(h, train)
        h = ConvBNAct(mid, self.kernel, self.stride, groups=mid, act=self.act,
                      dtype=self.dtype)(h, train)
        if self.se_ratio > 0:
            h = SqueezeExcite(max(1, int(c_in * self.se_ratio)), act=self.act,
                              dtype=self.dtype)(h)
        h = ConvBNAct(self.features, 1, 1, act=None, dtype=self.dtype)(h, train)
        if self.stride == 1 and c_in == self.features:
            h = h + x
        return h


class FusedMBConv(nn.Module):
    """Fused inverted residual (EfficientNetV2): 3x3 expand conv + 1x1 project."""
    features: int
    expand: float = 4.0
    kernel: int = 3
    stride: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        mid = make_divisible(c_in * self.expand)
        if self.expand != 1.0:
            h = ConvBNAct(mid, self.kernel, self.stride, act=self.act, dtype=self.dtype)(x, train)
            h = ConvBNAct(self.features, 1, 1, act=None, dtype=self.dtype)(h, train)
        else:
            h = ConvBNAct(self.features, self.kernel, self.stride, act=self.act,
                          dtype=self.dtype)(x, train)
        if self.stride == 1 and c_in == self.features:
            h = h + x
        return h


class UIB(nn.Module):
    """Universal Inverted Bottleneck (MobileNetV4):
    optional start-DW -> 1x1 expand -> optional mid-DW -> 1x1 project."""
    features: int
    expand: float = 4.0
    dw_start: int = 0   # kernel size, 0 = absent
    dw_mid: int = 3     # kernel size, 0 = absent
    stride: int = 1
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        h = x
        stride_on_mid = self.dw_mid > 0
        if self.dw_start > 0:
            h = ConvBNAct(c_in, self.dw_start, 1 if stride_on_mid else self.stride,
                          groups=c_in, act=None, dtype=self.dtype)(h, train)
        mid = make_divisible(c_in * self.expand)
        h = ConvBNAct(mid, 1, 1, act=self.act, dtype=self.dtype)(h, train)
        if self.dw_mid > 0:
            h = ConvBNAct(mid, self.dw_mid, self.stride, groups=mid, act=self.act,
                          dtype=self.dtype)(h, train)
        h = ConvBNAct(self.features, 1, 1, act=None, dtype=self.dtype)(h, train)
        if self.stride == 1 and c_in == self.features:
            h = h + x
        return h


class BasicBlock(nn.Module):
    """ResNet-18/34 basic block."""
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBNAct(self.features, 3, self.stride, act="relu", dtype=self.dtype)(x, train)
        h = ConvBNAct(self.features, 3, 1, act=None, dtype=self.dtype)(h, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = ConvBNAct(self.features, 1, self.stride, act=None, dtype=self.dtype)(x, train)
        return jax.nn.relu(h + x)


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXtV2)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        gx = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x * nx.astype(x.dtype)) + beta + x.astype(jnp.float32)).astype(x.dtype)


class ConvNeXtV2Block(nn.Module):
    """ConvNeXtV2 block: DW7x7 -> LN -> 1x1 (4x) -> GELU -> GRN -> 1x1."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = TConv(self.features, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.features, dtype=self.dtype)(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(h)
        h = nn.Dense(self.features * 4, dtype=self.dtype)(h)
        h = jax.nn.gelu(h)
        h = GRN(dtype=self.dtype)(h)
        h = nn.Dense(self.features, dtype=self.dtype)(h)
        return x + h


class CSPBottleneck(nn.Module):
    """Darknet bottleneck: 1x1 reduce -> 3x3, residual."""
    features: int
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBNAct(self.features, 1, 1, act="silu", dtype=self.dtype)(x, train)
        h = ConvBNAct(self.features, 3, 1, act="silu", dtype=self.dtype)(h, train)
        if self.shortcut and x.shape[-1] == self.features:
            h = h + x
        return h


class CS3Stage(nn.Module):
    """Cross-stage-partial stage (cs3 style): split, n bottlenecks, merge."""
    features: int
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        a = ConvBNAct(c, 1, 1, act="silu", dtype=self.dtype)(x, train)
        b = ConvBNAct(c, 1, 1, act="silu", dtype=self.dtype)(x, train)
        for _ in range(self.n):
            b = CSPBottleneck(c, dtype=self.dtype)(b, train)
        h = jnp.concatenate([a, b], axis=-1)
        return ConvBNAct(self.features, 1, 1, act="silu", dtype=self.dtype)(h, train)


class Focus(nn.Module):
    """Focus stem: space-to-depth (2x2) + conv (cs3darknet_focus)."""
    features: int
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # [B,H,W,C] -> [B,H/2,W/2,4C]
        x = jnp.concatenate([x[:, ::2, ::2], x[:, 1::2, ::2],
                             x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        return ConvBNAct(self.features, self.kernel, 1, act="silu", dtype=self.dtype)(x, train)


class HGBlock(nn.Module):
    """HGNetV2-style block: chain of 3x3 convs, concat all taps, 1x1 aggregate."""
    mid: int
    features: int
    layers: int = 6
    kernel: int = 3
    residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = [x]
        h = x
        for _ in range(self.layers):
            h = ConvBNAct(self.mid, self.kernel, 1, act="relu", dtype=self.dtype)(h, train)
            taps.append(h)
        out = jnp.concatenate(taps, axis=-1)
        out = ConvBNAct(self.features // 2, 1, 1, act="relu", dtype=self.dtype)(out, train)
        out = ConvBNAct(self.features, 1, 1, act="relu", dtype=self.dtype)(out, train)
        if self.residual and x.shape[-1] == self.features:
            out = out + x
        return out


def upsample_nearest_to(x: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor upsample to target (H, W). Exact-x2 uses cheap repeats."""
    h, w = x.shape[1], x.shape[2]
    th, tw = target_hw
    if th == 2 * h and tw == 2 * w:
        x = jnp.repeat(x, 2, axis=1)
        return jnp.repeat(x, 2, axis=2)
    return jax.image.resize(x, (x.shape[0], th, tw, x.shape[3]), method="nearest")
