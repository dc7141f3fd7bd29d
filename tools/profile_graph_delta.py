#!/usr/bin/env python
"""Forward-only vs full deploy graph: the TRUE in-graph decode+NMS cost.

The r2 "where the time goes" table attributed ~1.85 ms/batch to decode+NMS
from a pre-ladder graph; the standalone stage profile (profile_nms_stages.py)
now measures the NMS block at ~0.2 ms. This tool measures the difference the
honest way — the full shipped deploy graph vs the same graph stopped at the
raw head maps — to bound what a fused Pallas decode+score+topk kernel could
possibly recover (ROADMAP "Pallas fused decode kernel").

Usage: python tools/profile_graph_delta.py [--batch 128] [--img 640]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def bench(fn, variables, x, iters=20):
    import jax
    for _ in range(3):
        out = fn(variables, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img", type=int, default=640)
    args = ap.parse_args()

    import dataclasses

    import jax
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from yololite_tpu.deploy.fold_norm import fold_normalization, raw_cast
    from yololite_tpu.deploy.fuse_head import fuse_head_params
    from yololite_tpu.deploy.layout import aot_compile_and_place
    from yololite_tpu.deploy.s2d import pack_s2d, rewrite_stem_to_s2d, s2d_stem
    from yololite_tpu.models.detector import build_model_from_config, init_model
    from yololite_tpu.ops.decode import decode_anchorfree
    from yololite_tpu.ops.nms import batched_nms, yolo_scores

    img = args.img
    cfg = {"model": {"arch": "YOLOLiteMS_CPU",
                     "backbone": "mobilenetv4_conv_small_050",
                     "depth_multiple": 0.65, "width_multiple": 0.60,
                     "fpn_channels": 160, "head_depth": 1, "num_classes": 3,
                     "num_anchors_per_level": 1},
           "training": {"img_size": img}}
    model = build_model_from_config(cfg, dtype=jnp.bfloat16)
    params, bstats = init_model(model, img, seed=0, batch=1)
    params, bstats, _ = fold_normalization(params, bstats)
    params, _ = fuse_head_params(params)
    params, _ = rewrite_stem_to_s2d(params)
    model = dataclasses.replace(model, fused_head=True)
    variables = {"params": params, "batch_stats": bstats}

    def forward_only(v, x):
        with s2d_stem():
            return model.apply(v, raw_cast(x, jnp.bfloat16), train=False)

    def fwd_decode(v, x):
        d = decode_anchorfree(forward_only(v, x), img)
        s, c = yolo_scores(d["obj"][..., 0].astype(jnp.float32),
                           d["cls"].astype(jnp.float32))
        return d["box"], s, c

    def full(v, x):
        b, s, c = fwd_decode(v, x)
        return batched_nms(b.astype(jnp.float32), s, c, iou_th=0.65,
                           conf_th=0.25, max_det=100, pre_nms_topk=256,
                           approx_topk=True)

    rng = np.random.RandomState(0)
    x_np = pack_s2d((rng.rand(args.batch, img, img, 3) * 255)
                    .astype(np.uint8))

    results = {}
    for name, fn in (("forward_only", forward_only),
                     ("fwd+decode+scores", fwd_decode),
                     ("full (shipped deploy graph)", full)):
        comp, placed = aot_compile_and_place(fn, variables, x_np)
        if comp is not None:
            v, x = placed
            results[name] = bench(comp, v, x)
        else:
            results[name] = bench(jax.jit(fn), variables, jnp.asarray(x_np))

    f0 = results["forward_only"]
    print(f"edge_n @{img} b{args.batch} (bf16, full r2 deploy stack):")
    for name, ms in results.items():
        print(f"  {name:32s} {ms:7.3f} ms/batch  (+{ms - f0:5.3f})")
    full_ms = results["full (shipped deploy graph)"]
    print(f"decode+NMS in-graph delta: {full_ms - f0:.3f} ms "
          f"= {(full_ms - f0) / full_ms * 100:.1f}% of the full graph")


if __name__ == "__main__":
    main()
