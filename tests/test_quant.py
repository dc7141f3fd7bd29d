"""Int8 dynamic-quantized inference path (ops/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from yololite_tpu.models.detector import build_model_from_config, init_model
from yololite_tpu.ops.quant import int8_inference


def _model(img=64):
    cfg = {"model": {"arch": "YOLOLiteMS_CPU",
                     "backbone": "mobilenetv4_conv_small_050",
                     "fpn_channels": 32, "head_depth": 1, "num_classes": 2,
                     "num_anchors_per_level": 1, "width_multiple": 1.0,
                     "depth_multiple": 0.5},
           "training": {"img_size": img}}
    m = build_model_from_config(cfg, dtype=jnp.float32)
    p, bs = init_model(m, img, seed=0, batch=1)
    return m, {"params": p, "batch_stats": bs}


def test_int8_outputs_close_to_f32():
    m, variables = _model()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    ref = m.apply(variables, x, train=False)
    with int8_inference():
        q = m.apply(variables, x, train=False)
    assert len(ref) == len(q)
    for r, o in zip(ref, q):
        r, o = np.asarray(r), np.asarray(o)
        assert r.shape == o.shape
        # raw head logits agree to quantization noise
        denom = np.maximum(1.0, np.abs(r).max())
        assert np.abs(r - o).max() / denom < 0.15, np.abs(r - o).max()
        # and are well-correlated
        cc = np.corrcoef(r.ravel(), o.ravel())[0, 1]
        assert cc > 0.99, cc


def test_int8_under_jit():
    m, variables = _model()

    @jax.jit
    def f(v, x):
        with int8_inference():
            return m.apply(v, x, train=False)[0].sum()

    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    out = f(variables, x)
    assert np.isfinite(float(out))
