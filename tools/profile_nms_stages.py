#!/usr/bin/env python
"""Stage-by-stage timing of the deploy-graph NMS block on the real chip.

Decomposes the ~1.7 ms/batch class-aware NMS (BENCHMARK_TPU.md "where the
time goes") into its pipeline stages so the Pallas fused-kernel roadmap item
can target (or honestly close against) the dominant sub-stage:

  sel:    score threshold + approx/exact top-k over [B,N]
  gather: packed payload gather [B,N,5] -> [B,k,5]
  sup:    IoU matrix + greedy fixpoint on [B,k,k] (vmapped while_loop)
  final:  keep-masked top-k to max_det + second packed gather

Each stage is timed as its own jitted function over the same inputs (stage
boundaries force materialization, so the sum slightly exceeds the fused
whole — the deltas still rank the costs).

Usage: python tools/profile_nms_stages.py [--batch 128] [--n 8400] [--pre 256]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=50, warmup=5):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n", type=int, default=8400)
    ap.add_argument("--pre", type=int, default=256)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--max_det", type=int, default=300)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from yololite_tpu.ops.nms import batched_nms, yolo_scores
    from yololite_tpu.ops.boxes import box_iou_matrix
    from yololite_tpu.ops.nms import _greedy_keep

    B, N, K = args.batch, args.n, args.pre
    rng = np.random.default_rng(0)
    boxes = jnp.asarray(rng.uniform(0, 600, (B, N, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + rng.uniform(5, 40, (B, N, 2)))
    obj = jnp.asarray(rng.normal(-2, 1.5, (B, N)).astype(np.float32))
    cls = jnp.asarray(rng.normal(-2, 1.5, (B, N, args.classes)).astype(np.float32))

    scores, classes = jax.jit(yolo_scores)(obj, cls)
    scores = jax.block_until_ready(scores)

    full = partial(batched_nms, iou_th=0.65, conf_th=0.001, max_det=args.max_det,
                   pre_nms_topk=K, class_aware=True, approx_topk=True)
    t_full = timeit(full, boxes, scores, classes, iters=args.iters)
    full_exact = partial(batched_nms, iou_th=0.65, conf_th=0.001,
                         max_det=args.max_det, pre_nms_topk=K, class_aware=True,
                         approx_topk=False)
    t_full_exact = timeit(full_exact, boxes, scores, classes, iters=args.iters)

    @jax.jit
    def sel_approx(s):
        s = jnp.where(s > 0.001, s, 0.0)
        return jax.lax.approx_max_k(s, K, recall_target=0.99)

    @jax.jit
    def sel_exact(s):
        s = jnp.where(s > 0.001, s, 0.0)
        return jax.lax.top_k(s, K)

    t_sel_a = timeit(sel_approx, scores, iters=args.iters)
    t_sel_e = timeit(sel_exact, scores, iters=args.iters)

    _, idx = jax.block_until_ready(sel_approx(scores))

    @jax.jit
    def gather(bx, cl, idx):
        payload = jnp.concatenate(
            [bx.astype(jnp.float32), cl[..., None].astype(jnp.float32)], axis=-1)
        return jnp.take_along_axis(payload, idx[..., None], axis=1)

    t_gather = timeit(gather, boxes, classes, idx, iters=args.iters)
    pk = jax.block_until_ready(gather(boxes, classes, idx))
    boxes_k = pk[..., :4]
    cls_k = pk[..., 4]
    top_scores = jax.block_until_ready(sel_approx(scores)[0])
    valid = top_scores > 0.0

    @jax.jit
    def suppress(bk, ck, v):
        shifted = bk + (ck * 8192.0)[..., None]
        def one(sb, sv):
            overlap = box_iou_matrix(sb, sb)
            return _greedy_keep(overlap, sv, 0.65)
        return jax.vmap(one)(shifted, v)

    t_sup = timeit(suppress, boxes_k, cls_k, valid, iters=args.iters)
    keep = jax.block_until_ready(suppress(boxes_k, cls_k, valid))

    @jax.jit
    def final(bk, ck, ts, kp, idx):
        out_scores = jnp.where(kp, ts, 0.0)
        m = min(args.max_det, K)
        fs, sel = jax.lax.top_k(out_scores, m)
        payload2 = jnp.concatenate(
            [bk, ck[..., None], idx[..., None].astype(jnp.float32)], axis=-1)
        return fs, jnp.take_along_axis(payload2, sel[..., None], axis=1)

    t_final = timeit(final, boxes_k, cls_k, top_scores, keep, idx,
                     iters=args.iters)

    print(f"B={B} N={N} pre_topk={K} classes={args.classes}")
    print(f"full NMS (approx sel, deploy default): {t_full:8.3f} ms/batch")
    print(f"full NMS (exact sel):                  {t_full_exact:8.3f} ms/batch")
    print("--- stages (independently jitted; sum >= fused whole) ---")
    print(f"  selection approx_max_k [B,{N}]->{K}: {t_sel_a:8.3f} ms")
    print(f"  selection exact top_k  [B,{N}]->{K}: {t_sel_e:8.3f} ms")
    print(f"  packed payload gather  [B,{N},5]:    {t_gather:8.3f} ms")
    print(f"  IoU+greedy fixpoint    [B,{K},{K}]:  {t_sup:8.3f} ms")
    print(f"  final topk+gather      [B,{K}]->{min(args.max_det, K)}: {t_final:8.3f} ms")


if __name__ == "__main__":
    main()
