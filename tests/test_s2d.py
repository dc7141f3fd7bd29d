"""Space-to-depth stem rewrite parity (deploy/s2d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yololite_tpu.deploy.fold_norm import fold_normalization, raw_cast
from yololite_tpu.deploy.s2d import (pack_s2d, rewrite_stem_kernel,
                                     rewrite_stem_to_s2d, s2d_stem)
from yololite_tpu.models.detector import build_model_from_config, init_model
from yololite_tpu.train.steps import normalize_images


def test_kernel_rewrite_exact_f32():
    """conv(x, w, s2, pad(1,1)) == conv(pack(x), rewrite(w), s1, pad(1,0)) —
    (1,1) is the zoo's ConvBNAct padding (models/layers.py:64)."""
    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    w = (rng.randn(3, 3, 3, 8) * 0.1).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z = pack_s2d(x)  # dtype-preserving; works on float images too
    out = jax.lax.conv_general_dilated(
        jnp.asarray(z), jnp.asarray(rewrite_stem_kernel(w)), (1, 1),
        ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_pack_phase_order():
    """Phase layout is (di,dj)-major, channel-minor."""
    x = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    z = pack_s2d(x)
    assert z.shape == (2, 2, 2, 12)
    for di in range(2):
        for dj in range(2):
            ph = di * 2 + dj
            np.testing.assert_array_equal(z[..., ph * 3:(ph + 1) * 3],
                                          x[:, di::2, dj::2, :])
    # 3D input round-trips through the batch dim
    z1 = pack_s2d(x[0])
    np.testing.assert_array_equal(z1, z[0])
    with pytest.raises(ValueError):
        pack_s2d(np.zeros((3, 3, 3), np.uint8))


def _model(dtype, img=64):
    cfg = {"model": {"arch": "YOLOLiteMS_CPU",
                     "backbone": "mobilenetv4_conv_small_050",
                     "fpn_channels": 32, "head_depth": 1, "num_classes": 2,
                     "num_anchors_per_level": 1, "width_multiple": 1.0,
                     "depth_multiple": 0.5},
           "training": {"img_size": img}}
    m = build_model_from_config(cfg, dtype=dtype)
    p, bs = init_model(m, img, seed=0, batch=1)
    return m, p, bs


def test_full_graph_parity_f32():
    """normalize->model == s2d(folded params, packed uint8), f32."""
    m, p, bs = _model(jnp.float32)
    imgs = (np.random.RandomState(0).rand(2, 64, 64, 3) * 255).astype(np.uint8)
    ref = m.apply({"params": p, "batch_stats": bs},
                  normalize_images(jnp.asarray(imgs), jnp.float32),
                  train=False)
    fp, fbs, folded = fold_normalization(p, bs)
    assert folded
    sp, ok = rewrite_stem_to_s2d(fp)
    assert ok
    packed = jnp.asarray(pack_s2d(imgs))
    with s2d_stem():
        out = m.apply({"params": sp, "batch_stats": fbs},
                      raw_cast(packed, jnp.float32), train=False)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=2e-4, atol=2e-4)


def test_full_graph_close_bf16():
    m, p, bs = _model(jnp.bfloat16)
    imgs = (np.random.RandomState(1).rand(2, 64, 64, 3) * 255).astype(np.uint8)
    ref = m.apply({"params": p, "batch_stats": bs},
                  normalize_images(jnp.asarray(imgs), jnp.bfloat16),
                  train=False)
    fp, fbs, _ = fold_normalization(p, bs)
    sp, ok = rewrite_stem_to_s2d(fp)
    assert ok
    with s2d_stem():
        out = m.apply({"params": sp, "batch_stats": fbs},
                      raw_cast(jnp.asarray(pack_s2d(imgs)), jnp.bfloat16),
                      train=False)
    for r, o in zip(ref, out):
        r = np.asarray(r, np.float32)
        o = np.asarray(o, np.float32)
        scale = max(1.0, float(np.abs(r).max()))
        assert np.abs(r - o).max() / scale < 0.05


def test_rewrite_noop_without_3ch_stem():
    p = {"backbone": {"Whatever_0": {}}}
    p2, ok = rewrite_stem_to_s2d(p)
    assert not ok and p2 is p


def test_predictor_s2d_segmentation(tmp_path):
    """s2d stem + segmentation model through the Predictor: same detections
    and masks as the plain path (f32)."""
    import os

    from yololite_tpu.deploy.predictor import Predictor
    from yololite_tpu.train.checkpoint import build_meta, save_checkpoint

    img = 64
    cfg = {"model": {"arch": "YOLOLiteMS_CPU",
                     "backbone": "mobilenetv4_conv_small_050",
                     "fpn_channels": 32, "width_multiple": 1.0,
                     "depth_multiple": 0.5, "head_depth": 1,
                     "num_classes": 3, "num_anchors_per_level": 1,
                     "with_masks": True},
           "training": {"img_size": img}}
    m = build_model_from_config(cfg, dtype=jnp.float32)
    p, bs = init_model(m, img, seed=5, batch=1)
    meta = build_meta(cfg, {"AP": 0.0}, "AP", ["a", "b", "c"],
                     m.get_num_anchors_per_level())
    ck = os.path.join(str(tmp_path), "seg.ckpt")
    save_checkpoint(ck, p, bs, meta)

    frame = (np.random.RandomState(0).rand(70, 90, 3) * 255).astype(np.uint8)
    r0 = Predictor(ck, dtype=jnp.float32).infer_image_profiled(frame,
                                                               conf=1e-4)
    pred = Predictor(ck, dtype=jnp.float32, s2d_stem=True)
    assert pred.s2d
    r1 = pred.infer_image_profiled(frame, conf=1e-4)
    assert len(r0["boxes"]) == len(r1["boxes"]) > 0
    np.testing.assert_allclose(r0["boxes"], r1["boxes"], atol=1e-2)
    assert r0["masks"].shape == r1["masks"].shape
    assert (r0["masks"] == r1["masks"]).mean() > 0.999
