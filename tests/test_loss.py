"""SimOTA loss tests: assignment invariants, golden-case parity, gradients.

The reference algorithm (scripts/loss/loss.py:284-437) is validated here via
invariants (orphan rescue, one-GT-per-anchor, dynamic-k) and a hand-computed
empty-image case, not via a transcription of the reference code.
"""

import numpy as np
import jax
import jax.numpy as jnp

from yololite_tpu.losses import SimOTALoss, LossConfig
from yololite_tpu.losses.simota import _assign_single, _bce_logits
from yololite_tpu.ops.decode import decode_flat, flatten_levels
from yololite_tpu.ops.anchors import make_anchors

IMG = 64
NC = 3


def _cfg(**kw):
    d = dict(num_classes=NC, img_size=IMG, topk_limit=10,
             area_cells_min=0.0, area_cells_max=256.0, area_tol=1.75)
    d.update(kw)
    return LossConfig(**d)


def _levels(rng, b=2, img=IMG, nc=NC):
    return [jnp.asarray(rng.randn(b, 1, img // s, img // s, 5 + nc).astype(np.float32))
            for s in (8, 16, 32)]


def _decoded_single(levels, cfg, img_idx=0):
    flat, shapes = flatten_levels(levels)
    pts, strides = make_anchors(shapes, cfg.img_size)
    d = decode_flat(flat, pts, strides, center_mode=cfg.center_mode,
                    wh_mode=cfg.wh_mode, exp_clamp=(-10.0, 8.0))
    one = {k: v[img_idx] for k, v in d.items()}
    return one, strides


def _targets(boxes, labels, m=8, b=1):
    n = len(boxes)
    bx = np.zeros((b, m, 4), np.float32)
    lb = np.zeros((b, m), np.int32)
    mk = np.zeros((b, m), bool)
    bx[0, :n] = boxes
    lb[0, :n] = labels
    mk[0, :n] = True
    return {"boxes": jnp.asarray(bx), "labels": jnp.asarray(lb), "mask": jnp.asarray(mk)}


def test_every_gt_gets_a_positive_anchor():
    """Orphan rescue: even a 1px GT in a corner must be matched (loss.py:339-346)."""
    rng = np.random.RandomState(0)
    levels = _levels(rng, b=1)
    cfg = _cfg(area_cells_min=4.0, area_cells_max=8.0, area_tol=1.0)  # harsh gate
    d, strides = _decoded_single(levels, cfg)
    gt = jnp.asarray(np.array([[0.0, 0.0, 1.5, 1.5]], np.float32))
    labels = jnp.asarray(np.array([1], np.int32))
    mask = jnp.asarray(np.array([True]))
    match, _ = _assign_single(cfg, d["box"], d["ctr"], d["wh"], d["obj"], d["cls"],
                              gt, labels, mask, strides)
    assert int(jnp.sum(match[:, 0])) >= 1


def test_one_gt_per_anchor():
    rng = np.random.RandomState(1)
    levels = _levels(rng, b=1)
    cfg = _cfg()
    d, strides = _decoded_single(levels, cfg)
    boxes = np.array([[10, 10, 40, 40], [12, 12, 42, 42], [8, 8, 38, 38]], np.float32)
    gt = jnp.asarray(boxes)
    labels = jnp.asarray(np.array([0, 1, 2], np.int32))
    mask = jnp.asarray(np.ones(3, bool))
    match, _ = _assign_single(cfg, d["box"], d["ctr"], d["wh"], d["obj"], d["cls"],
                              gt, labels, mask, strides)
    per_anchor = np.asarray(jnp.sum(match, axis=1))
    assert per_anchor.max() <= 1


def test_padded_gts_never_match():
    rng = np.random.RandomState(2)
    levels = _levels(rng, b=1)
    cfg = _cfg()
    d, strides = _decoded_single(levels, cfg)
    gt = jnp.asarray(np.array([[10, 10, 40, 40], [0, 0, 0, 0]], np.float32))
    labels = jnp.asarray(np.array([0, 0], np.int32))
    mask = jnp.asarray(np.array([True, False]))
    match, _ = _assign_single(cfg, d["box"], d["ctr"], d["wh"], d["obj"], d["cls"],
                              gt, labels, mask, strides)
    assert int(jnp.sum(match[:, 1])) == 0


def test_empty_image_loss_is_top64_negatives():
    """With zero GTs the loss must equal lambda_obj * mean(top-64 BCE(obj, 0))
    (reference loss.py:309-314)."""
    rng = np.random.RandomState(3)
    levels = _levels(rng, b=1)
    cfg = _cfg(lambda_obj=1.0)
    loss_fn = SimOTALoss(cfg)
    t = {"boxes": jnp.zeros((1, 8, 4)), "labels": jnp.zeros((1, 8), jnp.int32),
         "mask": jnp.zeros((1, 8), bool)}
    total, metrics = loss_fn(levels, t)
    flat, _ = flatten_levels(levels)
    obj = np.asarray(flat[0, :, 4], np.float64)
    bce = np.maximum(obj, 0) - obj * 0.0 + np.log1p(np.exp(-np.abs(obj)))
    expected = np.sort(bce)[::-1][:64].mean()
    np.testing.assert_allclose(float(total), expected, rtol=1e-4)
    assert float(metrics["box"]) == 0.0 and float(metrics["cls"]) == 0.0
    assert float(metrics["pos"]) == 0.0


def test_dynamic_k_scales_with_iou():
    """A GT with many high-IoU candidate anchors should get multiple positives."""
    rng = np.random.RandomState(4)
    b, nc = 1, NC
    levels = []
    for s in (8, 16, 32):
        g = IMG // s
        arr = np.zeros((b, 1, g, g, 5 + nc), np.float32)
        arr[..., 2:4] = 2.0  # large-ish boxes everywhere (softplus(2)*stride)
        levels.append(jnp.asarray(arr))
    cfg = _cfg()
    d, strides = _decoded_single(levels, cfg)
    gt = jnp.asarray(np.array([[16, 16, 48, 48]], np.float32))
    match, iou = _assign_single(cfg, d["box"], d["ctr"], d["wh"], d["obj"], d["cls"],
                                gt, jnp.asarray(np.array([0], np.int32)),
                                jnp.asarray(np.array([True])), strides)
    npos = int(jnp.sum(match))
    assert npos >= 2  # dynamic-k > 1 given several high-IoU candidates
    assert npos <= cfg.topk_limit


def test_loss_gradients_finite_and_nonzero():
    rng = np.random.RandomState(5)
    levels = _levels(rng, b=2)
    cfg = _cfg()
    loss_fn = SimOTALoss(cfg)
    t = _targets(np.array([[10, 10, 40, 40]], np.float32), [1], b=1)
    # batch of 2: one image with GT, one empty
    t2 = {
        "boxes": jnp.concatenate([t["boxes"], jnp.zeros_like(t["boxes"])]),
        "labels": jnp.concatenate([t["labels"], jnp.zeros_like(t["labels"])]),
        "mask": jnp.concatenate([t["mask"], jnp.zeros_like(t["mask"])]),
    }

    def f(levels):
        total, _ = loss_fn(levels, t2)
        return total

    grads = jax.grad(lambda ls: f(ls))(levels)
    for g in grads:
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
    assert any(np.abs(np.asarray(g)).max() > 0 for g in grads)


def test_loss_decreases_with_perfect_predictions():
    """Training signal sanity: a prediction matching the GT yields a lower loss
    than a random one."""
    cfg = _cfg(center_mode="v8", wh_mode="softplus")
    rng = np.random.RandomState(6)
    rand_levels = _levels(rng, b=1)
    # GT centered at (36,36), size 16x16 -> exactly the center of cell (4,4) at
    # stride 8 under the v8 center transform with tx=ty=0.
    t = _targets(np.array([[28, 28, 44, 44]], np.float32), [2], b=1)
    loss_fn = SimOTALoss(cfg)
    l_rand, _ = loss_fn(rand_levels, t)

    good = []
    for s, lvl in zip((8, 16, 32), rand_levels):
        arr = np.full(np.asarray(lvl).shape, -8.0, np.float32)  # obj/cls low everywhere
        if s == 8:
            # softplus(inv) * s = 16 -> inv = log(exp(16/s)-1)
            inv = np.log(np.expm1(16.0 / s))
            arr[0, 0, 4, 4, 0:2] = 0.0
            arr[0, 0, 4, 4, 2:4] = inv
            arr[0, 0, 4, 4, 4] = 8.0     # obj high
            arr[0, 0, 4, 4, 5 + 2] = 8.0  # class 2 high
        good.append(jnp.asarray(arr))
    l_good, m = loss_fn(good, t)
    assert float(l_good) < float(l_rand)
    assert float(m["pos"]) == 1.0


def test_bce_logits_matches_numpy():
    x = jnp.asarray(np.linspace(-10, 10, 41, dtype=np.float32))
    t = jnp.asarray(np.linspace(0, 1, 41, dtype=np.float32))
    got = np.asarray(_bce_logits(x, t))
    p = 1 / (1 + np.exp(-np.asarray(x, np.float64)))
    want = -(np.asarray(t) * np.log(p) + (1 - np.asarray(t)) * np.log(1 - p))
    np.testing.assert_allclose(got, want, atol=1e-5)
