"""Deploy-time head-conv fusion parity (deploy/fuse_head.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yololite_tpu.deploy.fuse_head import fuse_head_params
from yololite_tpu.models.detector import build_model_from_config, init_model


def _model(with_masks=False, use_p2=False, use_p6=False, anchors=1, img=64):
    cfg = {"model": {"arch": "YOLOLiteMS_CPU",
                     "backbone": "mobilenetv4_conv_small_050",
                     "fpn_channels": 32, "head_depth": 1, "num_classes": 3,
                     "num_anchors_per_level": anchors, "width_multiple": 1.0,
                     "depth_multiple": 0.5, "with_masks": with_masks},
           "training": {"img_size": img, "use_p2": use_p2, "use_p6": use_p6}}
    m = build_model_from_config(cfg, dtype=jnp.float32)
    p, bs = init_model(m, img, seed=0, batch=1)
    return m, p, bs


@pytest.mark.parametrize("kw", [dict(), dict(with_masks=True),
                                dict(use_p2=True, use_p6=True),
                                dict(anchors=2)])
def test_fused_head_matches_split(kw):
    m, p, bs = _model(**kw)
    fp, ok = fuse_head_params(p)
    assert ok
    fm = dataclasses.replace(m, fused_head=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3)
                    .astype(np.float32))
    ref = m.apply({"params": p, "batch_stats": bs}, x, train=False)
    out = fm.apply({"params": fp, "batch_stats": bs}, x, train=False)
    for r, o in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=1e-5, atol=1e-5)


def test_fuse_is_noop_without_heads():
    p = {"backbone": {"ConvBNAct_0": {}}}
    p2, ok = fuse_head_params(p)
    assert not ok and p2 is p
