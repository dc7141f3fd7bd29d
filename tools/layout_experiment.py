#!/usr/bin/env python
"""r5 layout-recovery + dispatch-overhead experiment (VERDICT r4 #5/#6).

Same-process A/B at a given config of the deploy graph:
  a) plain jit, weights as call arguments (the r4 fallback = current record)
  b) const-weights jit (weights baked as compile-time constants,
     deploy/layout.py:const_weights_jit) — the tunnel-safe relayout fix
  c) chained in-graph iterations (chain_iters) — one dispatch runs K steps,
     isolating chip time from per-dispatch tunnel overhead

Prints one JSON line per variant. Usage:
  python tools/layout_experiment.py [model] [img] [batch] [K]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tools.bench_matrix import model_cfg
    from yololite_tpu.deploy.fold_norm import (fold_normalization, folded_stem,
                                               raw_cast)
    from yololite_tpu.deploy.fuse_head import fuse_head_params
    from yololite_tpu.deploy.layout import chain_iters, const_weights_jit
    from yololite_tpu.deploy.s2d import pack_s2d, rewrite_stem_to_s2d, s2d_stem
    from yololite_tpu.models.detector import build_model_from_config, init_model
    from yololite_tpu.ops.decode import decode_anchorfree
    from yololite_tpu.ops.nms import batched_nms, yolo_scores

    mname = sys.argv[1] if len(sys.argv) > 1 else "edge_n"
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    cfg = {"model": model_cfg(mname), "training": {"img_size": img}}
    model = build_model_from_config(cfg, dtype=jnp.bfloat16)
    params, bstats = init_model(model, img, 0, 1)
    params, bstats, _ = fold_normalization(params, bstats)
    params, fused = fuse_head_params(params)
    if fused:
        model = dataclasses.replace(model, fused_head=True)
    params, s2d = rewrite_stem_to_s2d(params)
    variables = {"params": params, "batch_stats": bstats}

    def infer(v, x):
        with (s2d_stem() if s2d else folded_stem()):
            outs = model.apply(v, raw_cast(x, jnp.bfloat16), train=False)
        d = decode_anchorfree(outs, img)
        s, c = yolo_scores(d["obj"][..., 0].astype(jnp.float32),
                           d["cls"].astype(jnp.float32))
        return batched_nms(d["box"].astype(jnp.float32), s, c,
                           iou_th=0.65, conf_th=0.25, max_det=100,
                           pre_nms_topk=256, approx_topk=True,
                           fixpoint_unroll=8)

    rng = np.random.RandomState(0)
    x_np = (rng.rand(batch, img, img, 3) * 255).astype(np.uint8)
    if s2d:
        x_np = pack_s2d(x_np)
    x = jnp.asarray(x_np)

    def time_call(call, iters=20, warmup=3):
        for _ in range(warmup):
            jax.block_until_ready(call())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = call()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    def emit(tag, dt, steps=1):
        per_step = dt / steps
        print(json.dumps({
            "variant": tag, "model": mname, "img": img, "batch": batch,
            "ms_per_batch": round(per_step * 1e3, 3),
            "img_per_s": round(batch / per_step, 1)}), flush=True)
        return per_step

    plain = jax.jit(infer)
    t_a = emit("a_plain_jit", time_call(lambda: plain(variables, x)))

    cw = const_weights_jit(infer, variables)
    t_b = emit("b_const_weights", time_call(lambda: cw(x)))

    ch = chain_iters(infer, variables, K)
    t_c = emit(f"c_chained_K{K}", time_call(lambda: ch(x), iters=4), steps=K)

    print(json.dumps({
        "variant": "summary", "model": mname, "img": img, "batch": batch,
        "const_weights_speedup": round(t_a / t_b, 4),
        "per_dispatch_overhead_ms": round((t_b - t_c) * 1e3, 3),
        "chip_img_per_s": round(batch / t_c, 1)}), flush=True)


if __name__ == "__main__":
    main()
