"""Model layer tests: shapes, strides, bias init, P2/P6 options, param counts."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yololite_tpu.models import (
    YOLOLiteMS, init_model, count_params, build_backbone, BACKBONES,
)


def _forward(model, img=64, batch=1):
    params, bstats = init_model(model, img, batch=batch)
    x = jnp.zeros((batch, img, img, 3), jnp.float32)
    outs = model.apply({"params": params, "batch_stats": bstats}, x, train=False)
    return params, outs


def test_edge_n_shape_and_strides():
    # edge_n: YOLOLiteMS_CPU + mobilenetv4_conv_small_050, fpn 160, w=.60, d=.65
    m = YOLOLiteMS(backbone="mobilenetv4_conv_small_050", num_classes=3,
                   fpn_channels=160, width_multiple=0.60, depth_multiple=0.65,
                   head_depth=1, cpu_variant=True)
    assert m.fpn_strides == [8, 16, 32]
    assert m.get_num_anchors_per_level() == (1, 1, 1)
    params, outs = _forward(m, img=64)
    assert len(outs) == 3
    for o, s in zip(outs, (8, 16, 32)):
        assert o.shape == (1, 1, 64 // s, 64 // s, 5 + 3)
    n = count_params(params)
    # reference edge_n = 0.553M params (BENCHMARK.md:353); ours should be close
    assert 0.2e6 < n < 1.2e6, n


def test_p2_p6_levels():
    m = YOLOLiteMS(backbone="mobilenetv4_conv_small_050", num_classes=2,
                   fpn_channels=64, use_p2=True, use_p6=True, cpu_variant=True)
    assert m.fpn_strides == [4, 8, 16, 32, 64]
    _, outs = _forward(m, img=64)
    assert [o.shape[2] for o in outs] == [16, 8, 4, 2, 1]


def test_obj_bias_init():
    import math
    m = YOLOLiteMS(backbone="mobilenetv4_conv_small_050", num_classes=5,
                   fpn_channels=64, cpu_variant=True)
    params, _ = _forward(m, img=32)
    obj_b = np.asarray(params["head3"]["obj"]["bias"])
    cls_b = np.asarray(params["head3"]["cls"]["bias"])
    np.testing.assert_allclose(obj_b, -math.log(0.99 / 0.01), atol=1e-5)
    np.testing.assert_allclose(cls_b, -math.log(5), atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["head3"]["box"]["bias"]), 0.0)


@pytest.mark.parametrize("name", ["mobilenetv4_conv_small", "tf_efficientnet_lite0",
                                  "resnet18", "tf_efficientnetv2_b0",
                                  "cs3darknet_focus_s", "hgnetv2_b0"])
def test_backbone_feature_shapes(name):
    bb, info = build_backbone(name)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), x, False)
    feats = bb.apply(variables, x, False)
    assert len(feats) == len(info)
    for f, fi in zip(feats, info):
        assert f.shape[1] == 64 // fi["reduction"], (name, f.shape, fi)
        assert f.shape[-1] == fi["num_chs"], (name, f.shape, fi)


def test_backbone_registry_complete():
    # every backbone named in the reference config zoo must exist
    needed = [
        "mobilenetv4_conv_small", "mobilenetv4_conv_small_050",
        "tf_efficientnet_lite0", "tf_efficientnet_lite1", "tf_efficientnet_lite2",
        "tf_efficientnet_lite3", "tf_efficientnet_lite4",
        "tf_efficientnetv2_b0", "tf_efficientnetv2_b1", "tf_efficientnetv2_b2",
        "convnextv2_tiny", "cs3darknet_focus_s", "hgnetv2_b0",
        "mobilenetv3_large_100", "resnet18",
    ]
    for n in needed:
        assert n in BACKBONES, n


def test_train_mode_updates_batch_stats():
    m = YOLOLiteMS(backbone="mobilenetv4_conv_small_050", num_classes=2,
                   fpn_channels=64, cpu_variant=True)
    params, bstats = init_model(m, 32)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    outs, mutated = m.apply({"params": params, "batch_stats": bstats}, x,
                            train=True, mutable=["batch_stats"])
    leaves_before = jax.tree.leaves(bstats)
    leaves_after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(not np.allclose(a, b) for a, b in zip(leaves_before, leaves_after))
    assert changed


@pytest.mark.slow
def test_entire_config_zoo_builds_and_forwards():
    """Every shipped model YAML builds and runs a forward pass (config typos,
    channel mismatches, and P2/P6 interactions surface here)."""
    import glob
    import yaml
    import jax.numpy as jnp
    from yololite_tpu.models.detector import build_model_from_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    yamls = sorted(glob.glob(os.path.join(root, "configs", "models", "*.yaml")) +
                   glob.glob(os.path.join(root, "configs", "v2_models", "*.yaml")) +
                   glob.glob(os.path.join(root, "configs", "custom", "custom.yaml")))
    assert len(yamls) >= 15
    for path in yamls:
        with open(path) as f:
            cfg = yaml.safe_load(f)
        cfg.setdefault("model", {})["num_classes"] = 2
        cfg.setdefault("training", {})["img_size"] = 64
        model = build_model_from_config(cfg, dtype=jnp.float32)
        params, outs = _forward(model, img=64)
        got = outs[0] if model.with_masks else outs
        assert len(got) == len(model.get_strides()), path
