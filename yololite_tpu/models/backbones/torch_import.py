"""Import torch/timm backbone weights into the flax zoo.

The reference rides on ImageNet-pretrained timm backbones
(/root/reference/scripts/model/model_v2.py:84,257 `pretrained=True`); this
module closes that gap for the TPU zoo: given a torch `state_dict` saved from
the matching timm model (`torch.save(timm.create_model(name,
pretrained=True).state_dict(), path)` on any machine with timm), it maps the
weights onto our flax `StagedBackbone` parameters.

Design: **execution-order slot matching**, not per-architecture key tables.
Both sides enumerate their parameters in execution order —

  * torch: `state_dict` insertion order (module registration order, which for
    the supported timm families equals execution order);
  * flax: a slot plan simulated from the same `_specs()` block lists that
    build the `StagedBackbone` (flax auto-names children `ClassName_i` per
    call order, which the plan reproduces exactly).

Slots are typed (conv / bn / linear / ln / scale) and every assignment is
shape-checked after the torch->flax layout transform (conv OIHW->HWIO,
depthwise (C,1,kh,kw)->(kh,kw,1,C), linear (O,I)->(I,O)). A mismatch raises
with both paths in the message instead of silently mis-wiring.

Supported: the architectures whose internal block structure matches timm's
registration order 1:1 (MobileNetV4-Conv-S, EfficientNet-Lite 0-4,
EfficientNetV2-B0-2, ResNet18*). Others raise `UnsupportedBackbone`.
(*) resnet18: our TPU-friendly stem replaces timm's maxpool with a strided
3x3 conv that has no torch counterpart — that one conv+bn keeps its fresh
initialization and is listed in the report's `skipped_flax`.

Numerics are verified end to end in tests/test_torch_import.py against
hand-built torch twin networks (identical features to ~1e-4 in f32).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from yololite_tpu.models.layers import make_divisible

__all__ = ["UnsupportedBackbone", "plan_flax_slots", "group_torch_slots",
           "convert_backbone", "SUPPORTED_IMPORTS"]

SUPPORTED_IMPORTS = (
    "mobilenetv4_conv_small", "mobilenetv4_conv_small_050",
    "tf_efficientnet_lite0", "tf_efficientnet_lite1", "tf_efficientnet_lite2",
    "tf_efficientnet_lite3", "tf_efficientnet_lite4",
    "tf_efficientnetv2_b0", "tf_efficientnetv2_b1", "tf_efficientnetv2_b2",
    "resnet18",
)

# flax slots that have no torch counterpart (kept at fresh init):
# resnet18 stem conv#2 replaces timm's parameterless maxpool.
_SKIP_FLAX: Dict[str, Tuple[Tuple[str, ...], ...]] = {
    "resnet18": (("ConvBNAct_1",),),
}


class UnsupportedBackbone(ValueError):
    pass


@dataclass
class Slot:
    kind: str                      # conv | bn | linear | ln | scale
    path: Tuple[str, ...] = ()     # flax module path (flax side only)
    has_bias: bool = False         # conv/linear bias present
    tensors: Dict[str, np.ndarray] = field(default_factory=dict)  # torch side
    torch_prefix: str = ""


# --------------------------------------------------------------------------- #
# Flax side: simulate StagedBackbone's auto-naming in execution order.
# --------------------------------------------------------------------------- #

class _Namer:
    """Reproduces flax.linen auto-naming: ClassName_{per-class call index}."""

    def __init__(self):
        self.counts: Dict[str, int] = {}

    def next(self, cls: str) -> str:
        i = self.counts.get(cls, 0)
        self.counts[cls] = i + 1
        return f"{cls}_{i}"


def _convbnact(namer: _Namer, base: Tuple[str, ...]) -> List[Slot]:
    name = namer.next("ConvBNAct")
    sub = _Namer()
    return [Slot("conv", base + (name, sub.next("Conv"))),
            Slot("bn", base + (name, sub.next("BatchNorm")))]


def _expand_block(kind: str, kw: Dict[str, Any], c_in: int,
                  namer: _Namer, base: Tuple[str, ...]) -> Tuple[List[Slot], int]:
    """Emit the ordered slots of one zoo block; returns (slots, c_out)."""
    out: List[Slot] = []
    if kind == "conv":
        out += _convbnact(namer, base)
        return out, int(kw["features"])

    if kind == "uib":
        name = namer.next("UIB")
        sub = _Namer()
        if int(kw.get("dw_start", 0)) > 0:
            out += _convbnact(sub, base + (name,))
        out += _convbnact(sub, base + (name,))          # 1x1 expand
        if int(kw.get("dw_mid", 3)) > 0:
            out += _convbnact(sub, base + (name,))      # dw mid
        out += _convbnact(sub, base + (name,))          # 1x1 project
        return out, int(kw["features"])

    if kind == "mb":
        name = namer.next("MBConv")
        sub = _Namer()
        if float(kw.get("expand", 6.0)) != 1.0:
            out += _convbnact(sub, base + (name,))      # 1x1 expand
        out += _convbnact(sub, base + (name,))          # dw kxk
        if float(kw.get("se_ratio", 0.0)) > 0:
            se = sub.next("SqueezeExcite")
            se_sub = _Namer()
            out += [Slot("conv", base + (name, se, se_sub.next("Conv")), has_bias=True),
                    Slot("conv", base + (name, se, se_sub.next("Conv")), has_bias=True)]
        out += _convbnact(sub, base + (name,))          # 1x1 project
        return out, int(kw["features"])

    if kind == "fused":
        name = namer.next("FusedMBConv")
        sub = _Namer()
        out += _convbnact(sub, base + (name,))
        if float(kw.get("expand", 4.0)) != 1.0:
            out += _convbnact(sub, base + (name,))
        return out, int(kw["features"])

    if kind == "basic":
        name = namer.next("BasicBlock")
        sub = _Namer()
        out += _convbnact(sub, base + (name,))
        out += _convbnact(sub, base + (name,))
        if int(kw.get("stride", 1)) != 1 or c_in != int(kw["features"]):
            out += _convbnact(sub, base + (name,))      # downsample
        return out, int(kw["features"])

    if kind == "focus":
        name = namer.next("Focus")
        sub = _Namer()
        out += _convbnact(sub, base + (name,))
        return out, int(kw["features"])

    raise UnsupportedBackbone(
        f"block kind {kind!r} has no torch-import slot mapping")


def plan_flax_slots(name: str) -> List[Slot]:
    """Ordered (execution-order) typed slot list for a zoo backbone."""
    from yololite_tpu.models.backbones.zoo import _specs
    if name not in SUPPORTED_IMPORTS:
        raise UnsupportedBackbone(
            f"torch import not supported for {name!r}; supported: "
            f"{SUPPORTED_IMPORTS}")
    stem, stages, info = _specs()[name]
    namer = _Namer()
    slots: List[Slot] = []
    c = 3
    for kind, kw in stem:
        s, c = _expand_block(kind, dict(kw), c, namer, ())
        slots += s
    for stage in stages:
        for kind, kw in stage:
            s, c = _expand_block(kind, dict(kw), c, namer, ())
            slots += s
    return slots


# --------------------------------------------------------------------------- #
# Torch side: group an ordered state_dict into typed slots.
# --------------------------------------------------------------------------- #

def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def group_torch_slots(state_dict) -> List[Slot]:
    """Group state_dict items (in insertion order) into typed slots."""
    items = [(k, _np(v)) for k, v in state_dict.items()
             if not k.endswith("num_batches_tracked")]
    slots: List[Slot] = []
    i = 0
    while i < len(items):
        k, v = items[i]
        prefix = k.rsplit(".", 1)[0] if "." in k else ""
        leaf = k.rsplit(".", 1)[-1]
        rest = dict((kk.rsplit(".", 1)[-1], vv) for kk, vv in items[i + 1:i + 4]
                    if kk.rsplit(".", 1)[0] == prefix)
        if leaf == "weight" and v.ndim == 4:
            s = Slot("conv", tensors={"weight": v}, torch_prefix=prefix)
            if "bias" in rest:
                s.has_bias = True
                s.tensors["bias"] = rest["bias"]
                i += 1
            slots.append(s)
            i += 1
        elif leaf == "weight" and v.ndim == 2:
            s = Slot("linear", tensors={"weight": v}, torch_prefix=prefix,
                     has_bias="bias" in rest)
            if "bias" in rest:
                s.tensors["bias"] = rest["bias"]
                i += 1
            slots.append(s)
            i += 1
        elif leaf == "weight" and v.ndim == 1:
            if "running_mean" in rest:   # BatchNorm
                slots.append(Slot("bn", tensors={
                    "weight": v, "bias": rest["bias"],
                    "running_mean": rest["running_mean"],
                    "running_var": rest["running_var"]}, torch_prefix=prefix))
                i += 4
            elif "bias" in rest:         # LayerNorm / affine pair
                slots.append(Slot("ln", tensors={"weight": v,
                                                 "bias": rest["bias"]},
                                  torch_prefix=prefix))
                i += 2
            else:                        # lone per-channel scale (layer_scale)
                slots.append(Slot("scale", tensors={"weight": v},
                                  torch_prefix=prefix))
                i += 1
        elif leaf in ("gamma",):
            slots.append(Slot("scale", tensors={"weight": v.reshape(-1)},
                              torch_prefix=prefix))
            i += 1
        else:
            # unknown standalone tensor (e.g. classifier bias already consumed,
            # attention tables...) — keep as opaque; matching will stop on it.
            slots.append(Slot("other", tensors={leaf: v}, torch_prefix=prefix))
            i += 1
    return slots


# --------------------------------------------------------------------------- #
# Conversion
# --------------------------------------------------------------------------- #

def _set(tree: Dict, path: Sequence[str], leaf: str, value: np.ndarray,
         expect_shape=True):
    node = tree
    for p in path:
        if p not in node:
            raise KeyError(f"flax tree missing {'/'.join(path)}")
        node = node[p]
    if leaf not in node:
        raise KeyError(f"flax tree missing {'/'.join(path)}/{leaf}")
    old = np.asarray(node[leaf])
    if expect_shape and tuple(old.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}/{leaf}: "
                         f"flax {old.shape} vs torch {value.shape}")
    node[leaf] = value.astype(old.dtype)


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    if hasattr(tree, "items"):  # FrozenDict
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def convert_backbone(name: str, state_dict, params, batch_stats):
    """Map a torch state_dict onto flax (params, batch_stats) for backbone
    `name`. `params`/`batch_stats` are the backbone-subtree dicts (i.e.
    detector `params["backbone"]`). Returns (params, batch_stats, report).

    report = {"assigned": int, "skipped_flax": [paths], "leftover_torch":
    [prefixes], "folded_scales": int}
    """
    plan = plan_flax_slots(name)
    tslots = group_torch_slots(state_dict)
    skip_prefixes = _SKIP_FLAX.get(name, ())

    p = _to_mutable(params)
    bs = _to_mutable(batch_stats)
    report = {"assigned": 0, "skipped_flax": [], "leftover_torch": [],
              "folded_scales": 0}
    ti = 0
    last_bn_path = None
    for slot in plan:
        if any(slot.path[:len(sp)] == sp for sp in skip_prefixes):
            report["skipped_flax"].append("/".join(slot.path))
            continue
        # fold any pending layer_scale into the previous BN affine:
        # out = gamma * BN(x) == BN with (scale*gamma, bias*gamma).
        while ti < len(tslots) and tslots[ti].kind == "scale":
            if last_bn_path is None:
                raise ValueError(f"layer_scale at {tslots[ti].torch_prefix} "
                                 f"with no preceding BN to fold into")
            g = tslots[ti].tensors["weight"]
            _set(p, last_bn_path, "scale",
                 np.asarray(_get(p, last_bn_path, "scale")) * g)
            _set(p, last_bn_path, "bias",
                 np.asarray(_get(p, last_bn_path, "bias")) * g)
            report["folded_scales"] += 1
            ti += 1
        if ti >= len(tslots):
            raise ValueError(f"torch state_dict exhausted at flax slot "
                             f"{'/'.join(slot.path)} ({slot.kind})")
        t = tslots[ti]
        ti += 1
        if t.kind != slot.kind:
            raise ValueError(
                f"slot kind mismatch: flax {'/'.join(slot.path)} wants "
                f"{slot.kind}, torch {t.torch_prefix!r} is {t.kind}")
        if slot.kind == "conv":
            w = np.transpose(t.tensors["weight"], (2, 3, 1, 0))  # OIHW->HWIO
            _set(p, slot.path, "kernel", w)
            if slot.has_bias != t.has_bias:
                raise ValueError(f"conv bias mismatch at {'/'.join(slot.path)}"
                                 f" (flax bias={slot.has_bias}, torch "
                                 f"bias={t.has_bias} at {t.torch_prefix!r})")
            if t.has_bias:
                _set(p, slot.path, "bias", t.tensors["bias"])
        elif slot.kind == "bn":
            _set(p, slot.path, "scale", t.tensors["weight"])
            _set(p, slot.path, "bias", t.tensors["bias"])
            _set(bs, slot.path, "mean", t.tensors["running_mean"])
            _set(bs, slot.path, "var", t.tensors["running_var"])
            last_bn_path = slot.path
        elif slot.kind == "linear":
            _set(p, slot.path, "kernel", t.tensors["weight"].T)
            if t.has_bias:
                _set(p, slot.path, "bias", t.tensors["bias"])
        elif slot.kind == "ln":
            _set(p, slot.path, "scale", t.tensors["weight"])
            _set(p, slot.path, "bias", t.tensors["bias"])
        else:
            raise ValueError(f"unhandled flax slot kind {slot.kind}")
        report["assigned"] += 1
    report["leftover_torch"] = [t.torch_prefix for t in tslots[ti:]]
    return p, bs, report


def _get(tree, path, leaf):
    node = tree
    for pth in path:
        node = node[pth]
    return node[leaf]
