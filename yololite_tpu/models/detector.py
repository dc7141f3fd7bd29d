"""YOLOLiteMS detector: backbone -> top-down FPN -> decoupled anchor-free heads.

Topology parity with the reference (scripts/model/model_v2.py):
  - `YOLOLiteMS`      (:77-247): FPN smooth blocks = n x (Conv3x3-BN-SiLU)
  - `YOLOLiteMS_CPU`  (:250-399): FPN smooth blocks = DW-separable + ReLU
    (here one module with `cpu_variant=True`, since the only difference is the
    smooth-block flavor and the P6 activation)
  - 1x1 laterals + nearest-upsample-add (:179-180, :201-203)
  - optional P2 (stride 4) and P6 (strided conv from P5) levels (:89, :130-133)
  - decoupled heads: DW-conv trunk x head_depth, 1x1 box/obj/cls (:42-53)
  - bias init: obj -log((1-p)/p) p=.01, cls -log(C), box 0 (:7-14)
  - width/depth multiples: fpn_ch = int(fpn_ch * width), d = max(1, round(2*depth))
  - per-level output [B, A, S, S, 5+C], A=1 (anchor-free)
  - self-describing `get_strides()` / `get_num_anchors_per_level()` (:227-231)

TPU-first differences: NHWC layout, bf16 compute / f32 params via `dtype`,
nearest-x2 upsample as repeats (fusible), static shapes everywhere.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yololite_tpu.models.backbones import build_backbone, backbone_feature_info
from yololite_tpu.models.layers import (
    ConvBNAct, ConvBlock, DWConvBlock, TConv, constant_bias_init,
    torch_conv_init, upsample_nearest_to,
)

Dtype = Any


def pick_out_indices(feature_info: List[Dict[str, int]], take: int = 3):
    """Last `take` stages (reference _pick_out_indices model_v2.py:69-74)."""
    n = len(feature_info)
    out_idx = list(range(n - take, n))
    reductions = [feature_info[i]["reduction"] for i in out_idx]
    chs = [feature_info[i]["num_chs"] for i in out_idx]
    return out_idx, reductions, chs


class DetectHead(nn.Module):
    """Decoupled head: DW trunk + 1x1 box/obj/cls (reference make_head :42-53).

    With num_prototypes > 0 the head also emits tanh mask coefficients
    (YOLACT-style instance segmentation, the V2 capability — README.md:13,39);
    the per-level output layout becomes [B, A, S, S, 5 + C + K].
    """
    num_anchors: int
    num_classes: int
    fpn_channels: int
    head_depth: int = 1
    p_obj: float = 0.01
    num_prototypes: int = 0
    fused: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, p, train: bool = False):
        for _ in range(self.head_depth):
            p = DWConvBlock(self.fpn_channels, n=1, dtype=self.dtype)(p, train)
        A, C, K = self.num_anchors, self.num_classes, self.num_prototypes
        obj_bias = -math.log((1.0 - self.p_obj) / self.p_obj)
        cls_bias = (-math.log(C)) if C > 1 else 0.0
        if self.fused:
            # Deploy-time variant: ONE 1x1 conv emits box|obj|cls|coef so the
            # trunk activation is read from HBM once instead of 3-4 times
            # (~0.55 ms/batch on edge_n @640 b128 — each separate head conv is
            # bandwidth-bound on its input). Params come from
            # deploy/fuse_head.fuse_head_params (exact concat of the trained
            # kernels; checkpoints keep the reference's split layout).
            tot = A * (5 + C + K)
            out = TConv(tot, (1, 1), dtype=self.dtype, name="fused_out")(p)
            box = out[..., :A * 4]
            obj = out[..., A * 4:A * 5]
            cls = out[..., A * 5:A * (5 + C)]
            coef = out[..., A * (5 + C):] if K > 0 else None
        else:
            box = TConv(A * 4, (1, 1), dtype=self.dtype, name="box",
                          bias_init=constant_bias_init(0.0))(p)
            obj = TConv(A * 1, (1, 1), dtype=self.dtype, name="obj",
                          bias_init=constant_bias_init(obj_bias))(p)
            cls = TConv(A * C, (1, 1), dtype=self.dtype, name="cls",
                          bias_init=constant_bias_init(cls_bias))(p)
            coef = (TConv(A * K, (1, 1), dtype=self.dtype, name="mcoef")(p)
                    if K > 0 else None)
        B, S1, S2, _ = box.shape
        parts = [box.reshape(B, S1, S2, A, 4),
                 obj.reshape(B, S1, S2, A, 1),
                 cls.reshape(B, S1, S2, A, C)]
        if K > 0:
            parts.append(jnp.tanh(coef.reshape(B, S1, S2, A, K)))
        out = jnp.concatenate(parts, axis=-1)                 # [B,S,S,A,5+C+K]
        return jnp.transpose(out, (0, 3, 1, 2, 4))            # [B,A,S,S,5+C+K]


class ProtoNet(nn.Module):
    """Mask prototype head from P3: convs + x2 upsample -> [B, S3*2, S3*2, K]
    (prototypes at stride 4)."""
    fpn_channels: int
    num_prototypes: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, p3, train: bool = False):
        h = ConvBNAct(self.fpn_channels, 3, 1, act="silu", dtype=self.dtype)(p3, train)
        h = upsample_nearest_to(h, (p3.shape[1] * 2, p3.shape[2] * 2))
        h = ConvBNAct(self.fpn_channels, 3, 1, act="silu", dtype=self.dtype)(h, train)
        return TConv(self.num_prototypes, (1, 1), dtype=self.dtype,
                       name="proto_out")(h)


class YOLOLiteMS(nn.Module):
    """Multi-scale anchor-free detector (both reference variants)."""
    backbone: str = "resnet18"
    num_classes: int = 3
    fpn_channels: int = 128
    num_anchors_per_level: Tuple[int, ...] = (1, 1, 1, 1)
    depth_multiple: float = 1.0
    width_multiple: float = 1.0
    head_depth: int = 1
    use_p6: bool = False
    use_p2: bool = False
    cpu_variant: bool = False  # True == reference YOLOLiteMS_CPU
    with_masks: bool = False   # instance segmentation (V2 capability)
    num_prototypes: int = 32
    fused_head: bool = False   # deploy-time single-conv heads (fuse_head.py)
    dtype: Dtype = jnp.float32

    # ---- static self-description (reference get_strides :227-231) ---------- #
    @property
    def feature_info(self):
        return backbone_feature_info(self.backbone)

    @property
    def fpn_strides(self) -> List[int]:
        take = 4 if self.use_p2 else 3
        _, reductions, _ = pick_out_indices(self.feature_info, take)
        return list(reductions) + ([reductions[-1] * 2] if self.use_p6 else [])

    @property
    def level_names(self) -> List[str]:
        return ((["p2"] if self.use_p2 else []) + ["p3", "p4", "p5"]
                + (["p6"] if self.use_p6 else []))

    def get_strides(self) -> List[int]:
        return list(self.fpn_strides)

    def get_num_anchors_per_level(self) -> Tuple[int, ...]:
        # normalize provided tuple to level count, mirroring P3->P2 / P5->P6
        ns = self.num_anchors_per_level
        if len(ns) >= 3:
            a3, a4, a5 = int(ns[0]), int(ns[1]), int(ns[2])
        else:
            a3 = a4 = a5 = int(ns[0]) if len(ns) else 1
        amap = {"p2": a3, "p3": a3, "p4": a4, "p5": a5, "p6": a5}
        return tuple(amap[n] for n in self.level_names)

    @property
    def scaled_fpn_channels(self) -> int:
        return int(self.fpn_channels * self.width_multiple)

    @property
    def smooth_depth(self) -> int:
        return max(1, round(2 * self.depth_multiple))

    # ------------------------------------------------------------------------ #
    def _smooth(self, name: str):
        ch, d = self.scaled_fpn_channels, self.smooth_depth
        if self.cpu_variant:
            return DWConvBlock(ch, n=d, dtype=self.dtype, name=name)
        return ConvBlock(ch, n=d, act="silu", dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        take = 4 if self.use_p2 else 3
        bb, info = build_backbone(self.backbone, dtype=self.dtype,
                                  module_name="backbone")
        out_idx, _, _ = pick_out_indices(info, take)
        feats = bb(x, train)
        feats = [feats[i] for i in out_idx]
        if self.use_p2:
            c2, c3, c4, c5 = feats
        else:
            c3, c4, c5 = feats

        ch = self.scaled_fpn_channels
        lat = lambda nm: TConv(ch, (1, 1), dtype=self.dtype, name=nm)
        up_add = lambda x, y: upsample_nearest_to(x, (y.shape[1], y.shape[2])) + y

        p5 = self._smooth("smooth5")(lat("lateral5")(c5), train)
        p4 = self._smooth("smooth4")(up_add(p5, lat("lateral4")(c4)), train)
        p3 = self._smooth("smooth3")(up_add(p4, lat("lateral3")(c3)), train)

        anchors = self.get_num_anchors_per_level()
        C = self.num_classes
        K = self.num_prototypes if self.with_masks else 0
        head = lambda a, nm: DetectHead(a, C, ch, self.head_depth,
                                        num_prototypes=K,
                                        fused=self.fused_head,
                                        dtype=self.dtype, name=nm)
        outs = []
        li = 0
        if self.use_p2:
            p2 = self._smooth("smooth2")(up_add(p3, lat("lateral2")(c2)), train)
            outs.append(head(anchors[li], "head2")(p2, train))
            li += 1
        outs.append(head(anchors[li], "head3")(p3, train))
        outs.append(head(anchors[li + 1], "head4")(p4, train))
        outs.append(head(anchors[li + 2], "head5")(p5, train))
        p6 = ConvBNAct(ch, 3, 2, act=("relu" if self.cpu_variant else "silu"),
                       dtype=self.dtype, name="p6_down")(p5, train)
        p6 = self._smooth("smooth6")(p6, train)
        if self.use_p6:
            outs.append(head(anchors[li + 3], "head6")(p6, train))
        # else: p6 is discarded. The reference registers p6_down/p6_bn/smooth6
        # parameters unconditionally (model_v2.py:130-133 constructs them in
        # __init__ even when use_p6=False; only head6 is gated), so param
        # counts and checkpoint layouts match it exactly. XLA dead-code
        # eliminates the unused branch from the compiled forward graph.
        if self.with_masks:
            protos = ProtoNet(ch, self.num_prototypes, dtype=self.dtype,
                              name="protonet")(p3, train)
            return outs, protos
        return outs


def build_model_from_config(cfg: Dict[str, Any], dtype=jnp.float32) -> YOLOLiteMS:
    """Construct the detector from a merged config dict (model + training blocks)."""
    m = cfg.get("model", {})
    tr = cfg.get("training", {})
    arch = str(m.get("arch", "YOLOLiteMS"))
    napl = m.get("num_anchors_per_level", 1)
    if isinstance(napl, int):
        napl = (napl,) * 4
    with_masks = bool(m.get("with_masks", False)) or \
        str(m.get("task", tr.get("task", "detect"))).lower() in ("segment", "seg")
    return YOLOLiteMS(
        backbone=str(m.get("backbone", "resnet18")).strip(),
        num_classes=int(m.get("num_classes", 3)),
        fpn_channels=int(m.get("fpn_channels", 128)),
        num_anchors_per_level=tuple(int(a) for a in napl),
        depth_multiple=float(m.get("depth_multiple", 1.0)),
        width_multiple=float(m.get("width_multiple", 1.0)),
        head_depth=int(m.get("head_depth", 1)),
        use_p6=bool(tr.get("use_p6", m.get("use_p6", False))),
        use_p2=bool(tr.get("use_p2", m.get("use_p2", False))),
        cpu_variant=(arch.upper().endswith("_CPU")),
        with_masks=with_masks,
        num_prototypes=int(m.get("num_prototypes", 32)),
        dtype=dtype,
    )


def init_model(model: YOLOLiteMS, img_size: int, seed: int = 0, batch: int = 1,
               host_init: bool = None):
    """Initialize variables with a dummy batch. Returns (params, batch_stats).

    `host_init` runs the (unjitted, op-by-op) flax init on the CPU backend and
    device_puts the weights to the default device afterwards. Default: on for
    the tunneled `axon` dev backend, where each of the init's ~50 individually
    dispatched conv compiles costs ~30 s of tunnel round-trip (r5 measurement:
    init_model alone >15 min on-device vs seconds on host); off elsewhere
    (direct-attached TPUs compile the init ops in milliseconds).
    """
    if host_init is None:
        try:
            import jax.extend
            host_init = "axon" in getattr(jax.extend.backend.get_backend(),
                                          "platform_version", "")
        except Exception:
            host_init = False
    x = jnp.zeros((batch, img_size, img_size, 3), model.dtype)
    if host_init:
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            with jax.default_device(cpu):
                variables = model.init({"params": jax.random.PRNGKey(seed)},
                                       jnp.zeros_like(x), train=False)
            variables = jax.device_put(
                jax.tree.map(np.asarray, variables))
            return variables["params"], variables.get("batch_stats", {})
    variables = model.init({"params": jax.random.PRNGKey(seed)}, x, train=False)
    return variables["params"], variables.get("batch_stats", {})


def count_params(params) -> int:
    return int(sum(p.size for p in jax.tree.leaves(params)))
