"""NMS fixpoint-unroll semantics tests (deploy default unroll=8)."""

import numpy as np



def test_fixpoint_unroll_matches_exact_on_crowded_scenes():
    """fixpoint_unroll=8 (deploy default) must select exactly what the
    convergence-checked while_loop selects. Crowded clustered scenes push the
    suppression-chain depth; measured max depth is 3 on 60 such scenes
    (tools: r3 fuzz), so 8 carries >2x margin."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from yololite_tpu.ops.nms import nms_single

    fe = jax.jit(partial(nms_single, iou_th=0.65, conf_th=0.001, max_det=300,
                         pre_nms_topk=256, class_aware=True))
    f8 = jax.jit(partial(nms_single, iou_th=0.65, conf_th=0.001, max_det=300,
                         pre_nms_topk=256, class_aware=True,
                         fixpoint_unroll=8))
    for seed in range(8):
        r = np.random.RandomState(seed)
        n = 400
        ctr = r.uniform(40, 600, (20, 2))
        xy = ctr[r.randint(0, 20, n)] + r.normal(0, 6, (n, 2))
        wh = np.exp(r.normal(3.2, 0.4, (n, 2)))
        boxes = np.concatenate([xy - wh / 2, xy + wh / 2], 1).astype(np.float32)
        scores = r.rand(n).astype(np.float32)
        classes = r.randint(0, 3, n).astype(np.int32)
        oe = fe(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes))
        o8 = f8(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes))
        for a, b in zip(oe, o8):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fixpoint_unroll_boundary_deep_chain():
    """Documents the unroll semantic boundary: a constructed alternating
    suppression chain deeper than the unroll count diverges from exact greedy
    — which is why eval paths keep the exact while_loop default and deploy
    uses unroll=8 only with the measured depth<=3 margin."""
    import jax.numpy as jnp
    from yololite_tpu.ops.nms import nms_single

    # chain of boxes along a line, each overlapping ONLY its neighbor > thr,
    # scores strictly decreasing -> greedy keeps every other box; fixpoint
    # needs ~chain/2 iterations to settle the tail.
    n = 30
    step = 20.0
    boxes = np.stack([np.arange(n) * step,
                      np.zeros(n),
                      np.arange(n) * step + 100.0,
                      np.full(n, 50.0)], axis=1).astype(np.float32)
    scores = np.linspace(0.9, 0.3, n).astype(np.float32)
    classes = np.zeros(n, np.int32)
    kw = dict(iou_th=0.5, conf_th=0.001, max_det=n, pre_nms_topk=n,
              class_aware=False)
    oe = nms_single(jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.asarray(classes), **kw)
    o2 = nms_single(jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.asarray(classes), fixpoint_unroll=2, **kw)
    o32 = nms_single(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.asarray(classes), fixpoint_unroll=32, **kw)
    exact_valid = np.asarray(oe[3])
    assert not np.array_equal(np.asarray(o2[3]), exact_valid), \
        "depth-2 unroll should diverge on a deep chain"
    # the fixpoint needs ~chain-length iterations on this construction
    np.testing.assert_array_equal(np.asarray(o32[3]), exact_valid)
