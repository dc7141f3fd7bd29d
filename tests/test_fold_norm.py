"""Normalize-folding parity (deploy/fold_norm.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yololite_tpu.deploy.fold_norm import (fold_normalization, folded_stem, raw_cast)
from yololite_tpu.models.detector import build_model_from_config, init_model
from yololite_tpu.train.steps import normalize_images


def _model(backbone, dtype, img=64):
    cfg = {"model": {"arch": "YOLOLiteMS_CPU", "backbone": backbone,
                     "fpn_channels": 32, "head_depth": 1, "num_classes": 2,
                     "num_anchors_per_level": 1, "width_multiple": 1.0,
                     "depth_multiple": 0.5},
           "training": {"img_size": img}}
    m = build_model_from_config(cfg, dtype=dtype)
    p, bs = init_model(m, img, seed=0, batch=1)
    return m, p, bs


@pytest.mark.parametrize("backbone", ["mobilenetv4_conv_small_050",
                                      "cs3darknet_focus_s"])
def test_folded_matches_normalized_f32(backbone):
    m, p, bs = _model(backbone, jnp.float32)
    imgs = jnp.asarray((np.random.RandomState(0).rand(2, 64, 64, 3) * 255)
                       .astype(np.uint8))
    ref = m.apply({"params": p, "batch_stats": bs},
                  normalize_images(imgs, jnp.float32), train=False)
    fp, fbs, folded = fold_normalization(p, bs)
    assert folded
    with folded_stem():
        out = m.apply({"params": fp, "batch_stats": fbs},
                      raw_cast(imgs, jnp.float32), train=False)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=2e-4, atol=2e-4)


def test_folded_close_in_bf16():
    m, p, bs = _model("mobilenetv4_conv_small_050", jnp.bfloat16)
    imgs = jnp.asarray((np.random.RandomState(1).rand(2, 64, 64, 3) * 255)
                       .astype(np.uint8))
    ref = m.apply({"params": p, "batch_stats": bs},
                  normalize_images(imgs, jnp.bfloat16), train=False)
    fp, fbs, folded = fold_normalization(p, bs)
    assert folded
    with folded_stem():
        out = m.apply({"params": fp, "batch_stats": fbs},
                      raw_cast(imgs, jnp.bfloat16), train=False)
    for r, o in zip(ref, out):
        r = np.asarray(r, np.float32)
        o = np.asarray(o, np.float32)
        scale = max(1.0, float(np.abs(r).max()))
        assert np.abs(r - o).max() / scale < 0.05


def test_fold_is_idempotent_noop_on_unknown_layout():
    p = {"backbone": {"Whatever_0": {}}}
    bs = {"backbone": {}}
    p2, bs2, folded = fold_normalization(p, bs)
    assert not folded and p2 is p
