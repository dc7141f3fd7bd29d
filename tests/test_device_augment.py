"""Device-side photometric augmentation (data/device_augment.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from yololite_tpu.data.device_augment import photometric_augment


def _imgs(b=8, hw=32, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray((rng.rand(b, hw, hw, 3) * 255).astype(np.uint8))


def test_identity_when_probabilities_zero():
    x = _imgs()
    y = photometric_augment(x, jax.random.PRNGKey(0), p_color=0.0, p_noise=0.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_deterministic_under_same_key():
    x = _imgs()
    k = jax.random.PRNGKey(3)
    y1 = photometric_augment(x, k, p_color=1.0, p_noise=1.0)
    y2 = photometric_augment(x, k, p_color=1.0, p_noise=1.0)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = photometric_augment(x, jax.random.PRNGKey(4), p_color=1.0, p_noise=1.0)
    assert np.any(np.asarray(y1) != np.asarray(y3))


def test_transforms_are_bounded_and_applied():
    x = _imgs(b=16, hw=48)
    y = photometric_augment(x, jax.random.PRNGKey(7), p_color=1.0, p_noise=0.0)
    y = np.asarray(y).astype(np.float32)
    xf = np.asarray(x).astype(np.float32)
    # p_color=1: (almost) every image is changed...
    per_img = np.abs(y - xf).mean(axis=(1, 2, 3))
    assert (per_img > 0).sum() >= 14
    # ...but photometric ops keep the image in a sane range of the original
    assert np.abs(y.mean() - xf.mean()) < 60.0


def test_jit_and_shapes():
    x = _imgs(b=4, hw=64)
    f = jax.jit(lambda im, k: photometric_augment(im, k))
    y = f(x, jax.random.PRNGKey(0))
    assert y.shape == x.shape and y.dtype == jnp.uint8


def test_train_step_with_device_augment():
    from tests.test_parallel import _tiny_cfg, _batch
    from yololite_tpu.models.detector import build_model_from_config
    from yololite_tpu.train.steps import Trainer

    cfg = _tiny_cfg()
    cfg["training"]["device_augment"] = True
    cfg["training"]["augment"] = True
    model = build_model_from_config(cfg, dtype=jnp.float32)
    t = Trainer(model, cfg, total_updates=10, mesh=None)
    assert t.device_augment
    s = t.init_state(seed=0)
    s, m = t.train_step(s, t.put_batch(_batch(4)), t.lr_vector(1e-3))
    assert np.isfinite(float(m["total"]))


def test_dataset_photometric_off_skips_color_ops():
    from yololite_tpu.data.augment import TrainTransform
    tf = TrainTransform(64, False, p_color=0.0, p_noise=0.0)
    assert tf.p_color == 0.0 and tf.p_noise == 0.0
