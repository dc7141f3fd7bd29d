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


def test_fake_quant_matches_int8_forward():
    """QAT fake-quant (float STE) computes the same arithmetic as the int8
    deploy path up to accumulation dtype (f32 vs s32-rescale)."""
    from yololite_tpu.ops.quant import fake_quant_training
    m, variables = _model()
    x = jnp.asarray(np.random.RandomState(1).randn(2, 64, 64, 3), jnp.float32)
    with int8_inference():
        q = m.apply(variables, x, train=False)
    with fake_quant_training():
        fq = m.apply(variables, x, train=False)
    for a, b in zip(q, fq):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(1.0, np.abs(a).max())
        assert np.abs(a - b).max() / denom < 0.02, np.abs(a - b).max()


def test_fake_quant_gradients_flow():
    """STE: gradients reach every conv kernel through the fake-quant path."""
    from yololite_tpu.ops.quant import fake_quant_training
    m, variables = _model()
    x = jnp.asarray(np.random.RandomState(2).randn(1, 64, 64, 3), jnp.float32)

    def loss_fn(params):
        with fake_quant_training():
            outs = m.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           x, train=False)
        return sum(jnp.sum(o ** 2) for o in outs)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    nonzero = sum(int(np.abs(np.asarray(g)).max() > 0) for g in leaves)
    # virtually all params get gradient (BN stats frozen in eval fwd is fine)
    assert nonzero / len(leaves) > 0.9, f"{nonzero}/{len(leaves)}"


def test_qat_train_step_reduces_loss():
    """A few jitted QAT train steps run and the params actually move."""
    from yololite_tpu.train.steps import Trainer
    cfg = {"model": {"arch": "YOLOLiteMS_CPU",
                     "backbone": "mobilenetv4_conv_small_050",
                     "fpn_channels": 32, "head_depth": 1, "num_classes": 2,
                     "num_anchors_per_level": 1, "width_multiple": 1.0,
                     "depth_multiple": 0.5},
           "training": {"img_size": 64, "lr": 1e-3, "qat": True,
                        "ema": True, "batch_size": 2},
           "loss": {}}
    model = build_model_from_config(cfg, dtype=jnp.float32)
    tr = Trainer(model, cfg, total_updates=10)
    assert tr.qat
    state = tr.init_state(seed=0, batch=2)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3)), jnp.uint8),
        "boxes": jnp.asarray([[[8, 8, 40, 40]] * 4] * 2, jnp.float32),
        "labels": jnp.zeros((2, 4), jnp.int32),
        "mask": jnp.asarray([[True, False, False, False]] * 2),
    }
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    losses = []
    for _ in range(3):
        state, metrics = tr.train_step(state, batch, tr.lr_vector(1e-3))
        losses.append(float(metrics["total"]))
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert all(np.isfinite(losses)), losses
    assert np.abs(p1 - p0).max() > 0
