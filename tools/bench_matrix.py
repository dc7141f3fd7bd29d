#!/usr/bin/env python
"""Measure the BASELINE.json config matrix on the real TPU chip.

Configs (BASELINE.json "configs"):
  1. edge_n detection @320
  2. edge_m detection @640 batched
  3. edge_n + P2 @320 (extreme-edge small-object mode)
  4. yololite_n instance segmentation @640
  5. custom mnv4 + P6 @1280 high-res
plus the headline edge_n @640. Appends JSON lines to benchmarks_tpu.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def model_cfg(name, **kw):
    base = {
        "edge_n": {"arch": "YOLOLiteMS_CPU", "backbone": "mobilenetv4_conv_small_050",
                   "depth_multiple": 0.65, "width_multiple": 0.60,
                   "fpn_channels": 160, "head_depth": 1},
        "edge_m": {"arch": "YOLOLiteMS_CPU", "backbone": "mobilenetv4_conv_small",
                   "depth_multiple": 0.95, "width_multiple": 0.85,
                   "fpn_channels": 288, "head_depth": 2},
        "yololite_n": {"arch": "YOLOLiteMS", "backbone": "tf_efficientnet_lite0",
                       "depth_multiple": 1.0, "width_multiple": 1.0,
                       "fpn_channels": 196, "head_depth": 1},
        "mnv4": {"arch": "YOLOLiteMS_CPU", "backbone": "mobilenetv4_conv_small",
                 "depth_multiple": 1.0, "width_multiple": 1.0,
                 "fpn_channels": 256, "head_depth": 2},
    }[name]
    m = dict(base, num_classes=3, num_anchors_per_level=1)
    m.update(kw)
    return m


def run_case(tag, mname, img, batch, use_p2=False, use_p6=False,
             with_masks=False, iters=15):
    import dataclasses

    import jax
    import jax.numpy as jnp
    from yololite_tpu.models.detector import build_model_from_config, init_model
    from yololite_tpu.models import count_params
    from yololite_tpu.deploy.fold_norm import (fold_normalization, folded_stem,
                                               raw_cast)
    from yololite_tpu.deploy.fuse_head import fuse_head_params
    from yololite_tpu.deploy.s2d import (pack_s2d, rewrite_stem_to_s2d,
                                         s2d_stem)
    from yololite_tpu.ops.decode import decode_anchorfree
    from yololite_tpu.ops.masks import assemble_masks_batch
    from yololite_tpu.ops.nms import batched_nms, yolo_scores

    cfg = {"model": model_cfg(mname, with_masks=with_masks),
           "training": {"img_size": img, "use_p2": use_p2, "use_p6": use_p6}}
    model = build_model_from_config(cfg, dtype=jnp.bfloat16)
    params, bstats = init_model(model, img, 0, 1)
    nparams = count_params(params)
    # the full r2 deploy stack (same as bench.py / Predictor): normalize fold,
    # head fusion, s2d stem over host-packed input, approx pre-NMS top-k
    params, bstats, _ = fold_normalization(params, bstats)
    params, fused = fuse_head_params(params)
    if fused:
        model = dataclasses.replace(model, fused_head=True)
    params, s2d = rewrite_stem_to_s2d(params)
    variables = {"params": params, "batch_stats": bstats}

    def infer(v, x):
        with (s2d_stem() if s2d else folded_stem()):
            out = model.apply(v, raw_cast(x, jnp.bfloat16), train=False)
        outs, protos = out if model.with_masks else (out, None)
        d = decode_anchorfree(outs, img, num_classes=model.num_classes
                              if model.with_masks else None)
        s, c = yolo_scores(d["obj"][..., 0].astype(jnp.float32),
                           d["cls"].astype(jnp.float32))
        b, sc, cl, v_, idx = batched_nms(d["box"].astype(jnp.float32), s, c,
                                         iou_th=0.65, conf_th=0.25, max_det=100,
                                         pre_nms_topk=256, approx_topk=True,
                                         fixpoint_unroll=8)
        if protos is not None:
            coef = jnp.take_along_axis(d["coef"].astype(jnp.float32),
                                       idx[..., None], axis=1)
            masks = assemble_masks_batch(protos.astype(jnp.float32), coef, b,
                                         float(img))
            return b, sc, cl, v_, masks
        return b, sc, cl, v_

    rng = np.random.RandomState(0)
    x_np = (rng.rand(batch, img, img, 3) * 255).astype(np.uint8)
    if s2d:
        x_np = pack_s2d(x_np)
    # deploy path = AOT pinned to the achieved input layouts (deploy/layout.py)
    # or, where the backend rejects explicit Formats (axon tunnel), weights
    # baked as compile-time constants (r5 const_weights_jit, +8.7% vs plain)
    from yololite_tpu.deploy.layout import (aot_compile_and_place, chain_iters,
                                            checked_call, const_weights_jit)
    comp, placed = aot_compile_and_place(infer, variables, x_np)
    if comp is not None:
        variables, x = placed
        call_fn = checked_call(comp, infer)
        call = lambda: call_fn(variables, x)  # noqa: E731
    else:
        x = jnp.asarray(x_np)
        cw = const_weights_jit(infer, variables)
        call = lambda: cw(x)  # noqa: E731
    for _ in range(3):
        jax.block_until_ready(call())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = call()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    # chip-resident leg: K chained in-graph evaluations per dispatch — rows
    # measure the chip, not the session's per-dispatch tunnel overhead
    # (VERDICT r4 #6). K chosen so a window is ~10 steps of work minimum.
    K = int(os.environ.get("BENCH_CHAIN_K", "16"))
    dt_chip = None
    if K > 1:
        chained = chain_iters(infer, variables, K)
        jax.block_until_ready(chained(x))
        t0 = time.perf_counter()
        c_iters = max(2, iters // 5)
        for _ in range(c_iters):
            out = chained(x)
        jax.block_until_ready(out)
        dt_chip = (time.perf_counter() - t0) / (c_iters * K)
    rec = {"config": tag, "model": mname, "img_size": img, "batch": batch,
           "params": nparams, "img_per_s": round(batch / dt, 1),
           "ms_per_batch": round(dt * 1e3, 2),
           "ms_per_img": round(dt * 1e3 / batch, 4)}
    if dt_chip is not None:
        rec["img_per_s_chip"] = round(batch / dt_chip, 1)
        rec["per_dispatch_overhead_ms"] = round((dt - dt_chip) * 1e3, 3)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    cases = [
        ("edge_n@640 (headline)", "edge_n", 640, 128, {}),
        ("edge_n@320", "edge_n", 320, 256, {}),
        ("edge_n+P2@320", "edge_n", 320, 128, {"use_p2": True}),
        ("edge_m@640", "edge_m", 640, 64, {}),
        ("yololite_n@640", "yololite_n", 640, 64, {}),
        ("yololite_n_seg@640", "yololite_n", 640, 64, {"with_masks": True}),
        ("mnv4+P6@1280", "mnv4", 1280, 16, {"use_p6": True}),
    ]
    only = sys.argv[1:] or None
    results = []
    for tag, mname, img, batch, kw in cases:
        if only and not any(o in tag for o in only):
            continue
        try:
            results.append(run_case(tag, mname, img, batch, **kw))
        except Exception as e:
            print(json.dumps({"config": tag, "error": str(e)[:200]}), flush=True)
    with open("benchmarks_tpu.jsonl", "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
