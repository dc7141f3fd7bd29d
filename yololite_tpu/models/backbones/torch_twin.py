"""Torch "twin" networks of the flax backbone zoo.

Same math as `zoo.py`'s blocks, registered in execution order exactly as the
timm families lay out their state_dicts. Two uses:

  * tests/test_torch_import.py round-trips twin weights through
    `convert_backbone` and asserts per-stage feature parity (~1e-4 f32);
  * tools/ref_train_compare.py installs a twin as the stub-`timm` backbone so
    the REFERENCE model (/root/reference/scripts/model/model_v2.py) can train
    end-to-end on CPU for the head-to-head accuracy study — architecturally
    identical to this repo's backbone, since both derive from `_specs()`.

Requires torch (CPU build is baked into this image).
"""

from __future__ import annotations

import torch
import torch.nn as tnn
import torch.nn.functional as F

from yololite_tpu.models.backbones.zoo import _specs
from yololite_tpu.models.layers import make_divisible

_T_ACT = {
    "relu": F.relu,
    "relu6": F.relu6,
    "silu": F.silu,
    "hardswish": F.hardswish,
    "gelu": F.gelu,
    None: lambda x: x,
    "none": lambda x: x,
}


class TConvBNAct(tnn.Module):
    def __init__(self, c_in, features, kernel=3, stride=1, groups=1, act="silu"):
        super().__init__()
        self.conv = tnn.Conv2d(c_in, features, kernel, stride, kernel // 2,
                               groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(features, eps=1e-5)
        self.act = _T_ACT[act]
        self.c_out = features

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TSE(tnn.Module):
    def __init__(self, chs, se_features, act):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(chs, se_features, 1, bias=True)
        self.conv_expand = tnn.Conv2d(se_features, chs, 1, bias=True)
        self.act = _T_ACT[act]

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(self.act(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class TMBConv(tnn.Module):
    def __init__(self, c_in, features, expand=6.0, kernel=3, stride=1,
                 se_ratio=0.0, act="relu6"):
        super().__init__()
        mid = make_divisible(c_in * expand)
        self.pw = TConvBNAct(c_in, mid, 1, 1, act=act) if expand != 1.0 else None
        self.dw = TConvBNAct(mid if self.pw else c_in,
                             mid if self.pw else make_divisible(c_in * expand),
                             kernel, stride, groups=mid, act=act)
        self.se = TSE(mid, max(1, int(c_in * se_ratio)), act) if se_ratio > 0 else None
        self.proj = TConvBNAct(mid, features, 1, 1, act=None)
        self.res = stride == 1 and c_in == features
        self.c_out = features

    def forward(self, x):
        h = self.pw(x) if self.pw else x
        h = self.dw(h)
        if self.se:
            h = self.se(h)
        h = self.proj(h)
        return h + x if self.res else h


class TFusedMBConv(tnn.Module):
    def __init__(self, c_in, features, expand=4.0, kernel=3, stride=1, act="silu"):
        super().__init__()
        mid = make_divisible(c_in * expand)
        if expand != 1.0:
            self.exp = TConvBNAct(c_in, mid, kernel, stride, act=act)
            self.proj = TConvBNAct(mid, features, 1, 1, act=None)
        else:
            self.exp = TConvBNAct(c_in, features, kernel, stride, act=act)
            self.proj = None
        self.res = stride == 1 and c_in == features
        self.c_out = features

    def forward(self, x):
        h = self.exp(x)
        if self.proj:
            h = self.proj(h)
        return h + x if self.res else h


class TUIB(tnn.Module):
    def __init__(self, c_in, features, expand=4.0, dw_start=0, dw_mid=3,
                 stride=1, act="relu"):
        super().__init__()
        stride_on_mid = dw_mid > 0
        self.dws = TConvBNAct(c_in, c_in, dw_start,
                              1 if stride_on_mid else stride,
                              groups=c_in, act=None) if dw_start > 0 else None
        mid = make_divisible(c_in * expand)
        self.exp = TConvBNAct(c_in, mid, 1, 1, act=act)
        self.dwm = TConvBNAct(mid, mid, dw_mid, stride, groups=mid,
                              act=act) if dw_mid > 0 else None
        self.proj = TConvBNAct(mid, features, 1, 1, act=None)
        self.res = stride == 1 and c_in == features
        self.c_out = features

    def forward(self, x):
        h = x
        if self.dws:
            h = self.dws(h)
        h = self.exp(h)
        if self.dwm:
            h = self.dwm(h)
        h = self.proj(h)
        return h + x if self.res else h


def _t_block(kind, kw, c_in):
    kw = dict(kw)
    if kind == "conv":
        return TConvBNAct(c_in, kw["features"], kw.get("kernel", 3),
                          kw.get("stride", 1), kw.get("groups", 1),
                          kw.get("act", "silu"))
    if kind == "mb":
        return TMBConv(c_in, kw["features"], kw.get("expand", 6.0),
                       kw.get("kernel", 3), kw.get("stride", 1),
                       kw.get("se_ratio", 0.0), kw.get("act", "relu6"))
    if kind == "fused":
        return TFusedMBConv(c_in, kw["features"], kw.get("expand", 4.0),
                            kw.get("kernel", 3), kw.get("stride", 1),
                            kw.get("act", "silu"))
    if kind == "uib":
        return TUIB(c_in, kw["features"], kw.get("expand", 4.0),
                    kw.get("dw_start", 0), kw.get("dw_mid", 3),
                    kw.get("stride", 1), kw.get("act", "relu"))
    raise NotImplementedError(kind)


class TorchTwin(tnn.Module):
    """Torch network with identical math + timm-like registration order."""

    def __init__(self, name):
        super().__init__()
        stem, stages, info = _specs()[name]
        c = 3
        mods = []
        for kind, kw in stem:
            m = _t_block(kind, dict(kw), c)
            mods.append(m)
            c = m.c_out
        self.stem = tnn.Sequential(*mods)
        self.stages = tnn.ModuleList()
        for stage in stages:
            mods = []
            for kind, kw in stage:
                m = _t_block(kind, dict(kw), c)
                mods.append(m)
                c = m.c_out
            self.stages.append(tnn.Sequential(*mods))
        # timm feature_info equivalent (reduction, channels per stage)
        self.info = info

    def forward(self, x):
        x = self.stem(x)
        feats = []
        for s in self.stages:
            x = s(x)
            feats.append(x)
        return feats


class TimmStyleTwin(tnn.Module):
    """`timm.create_model(name, features_only=True, out_indices=...)` facade
    over TorchTwin: exposes `feature_info` dicts and returns only the selected
    stages — the interface the reference model probes
    (model_v2.py:94-101, :266-273)."""

    def __init__(self, name, out_indices=None):
        super().__init__()
        self.twin = TorchTwin(name)
        fi = [{"reduction": r, "num_chs": c} for r, c in self.twin.info]
        self.out_indices = list(out_indices) if out_indices is not None \
            else list(range(len(fi)))
        self.feature_info = [fi[i] for i in self.out_indices]

    def forward(self, x):
        feats = self.twin(x)
        return [feats[i] for i in self.out_indices]
