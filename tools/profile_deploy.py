#!/usr/bin/env python
"""Per-op profile of the deployed inference graph on the real chip.

Captures a jax.profiler (xprof) trace of the full deploy path — uint8 ->
folded-normalize stem -> backbone -> FPN -> fused heads -> decode -> NMS —
and prints the top HLO ops by device self time with measured bandwidth and
bound-by classification. This is how the round-2 optimization log in
BENCHMARK_TPU.md was produced (head fusion, packed NMS gathers, preferred
input layouts were all found here).

The reference has no profiler integration (SURVEY §5: manual wall-clock
timers only, export/infer_onnx.py:143-296); this is the TPU-native
equivalent plus XLA-level attribution.

Usage:
  python tools/profile_deploy.py [--model edge_n] [--img 640] [--batch 128]
                                 [--top 25] [--trace_dir /tmp/xprof_deploy]
"""

import argparse
import dataclasses
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODELS = {
    "edge_n": {"arch": "YOLOLiteMS_CPU", "backbone": "mobilenetv4_conv_small_050",
               "depth_multiple": 0.65, "width_multiple": 0.60,
               "fpn_channels": 160, "head_depth": 1},
    "edge_m": {"arch": "YOLOLiteMS_CPU", "backbone": "mobilenetv4_conv_small",
               "depth_multiple": 0.95, "width_multiple": 0.85,
               "fpn_channels": 288, "head_depth": 2},
    "yololite_n": {"arch": "YOLOLiteMS", "backbone": "tf_efficientnet_lite0",
                   "depth_multiple": 1.0, "width_multiple": 1.0,
                   "fpn_channels": 196, "head_depth": 1},
}


def build_deploy_fn(mname, img_size):
    import jax
    import jax.numpy as jnp
    from yololite_tpu.deploy.fold_norm import (fold_normalization, folded_stem,
                                               raw_cast)
    from yololite_tpu.deploy.fuse_head import fuse_head_params
    from yololite_tpu.models.detector import build_model_from_config, init_model
    from yololite_tpu.ops.decode import decode_anchorfree
    from yololite_tpu.ops.nms import batched_nms, yolo_scores

    cfg = {"model": dict(MODELS[mname], num_classes=3,
                         num_anchors_per_level=1),
           "training": {"img_size": img_size}}
    model = build_model_from_config(cfg, dtype=jnp.bfloat16)
    params, bstats = init_model(model, img_size, seed=0, batch=1)
    params, bstats, _ = fold_normalization(params, bstats)
    params, _ = fuse_head_params(params)
    model = dataclasses.replace(model, fused_head=True)
    variables = {"params": params, "batch_stats": bstats}

    def fn(v, images_u8):
        with folded_stem():
            outs = model.apply(v, raw_cast(images_u8, jnp.bfloat16),
                               train=False)
        d = decode_anchorfree(outs, img_size)
        s, c = yolo_scores(d["obj"][..., 0].astype(jnp.float32),
                           d["cls"].astype(jnp.float32))
        return batched_nms(d["box"].astype(jnp.float32), s, c, iou_th=0.65,
                           conf_th=0.25, max_det=100, pre_nms_topk=256)
    return fn, variables


def hlo_stats(trace_dir):
    """Parse the xplane into (device_ms_per_iter, rows) via xprof convert."""
    from xprof.convert import raw_to_tool_data as rtd
    pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not pbs:
        return None, []
    data, _ = rtd.xspace_to_tool_data([sorted(pbs)[-1]], "hlo_stats",
                                      {"tqx": "out:csv;"})
    d = json.loads(data.decode() if isinstance(data, bytes) else str(data))
    cols = [c["id"] for c in d["cols"]]
    idx = {c: n for n, c in enumerate(cols)}
    rows = []
    for r in d["rows"]:
        v = [c.get("v") for c in r["c"]]
        rows.append({
            "category": v[idx["category"]] or "",
            "op": v[idx["hlo_op_name"]] or "",
            "self_us": (v[idx["total_self_time"]] or 0.0),
            "pct": v[idx["total_self_time_percent"]] or 0.0,
            "bw_gibs": v[idx["measured_memory_bw"]] or 0.0,
            "bound_by": v[idx["bound_by"]] or "",
            "expr": (v[idx["hlo_op_expression"]] or "")[:160],
        })
    rows.sort(key=lambda r: -r["self_us"])
    return sum(r["self_us"] for r in rows), rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="edge_n", choices=sorted(MODELS))
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace_dir", default="/tmp/xprof_deploy")
    ap.add_argument("--json_out", default=None,
                    help="also dump the full op table as JSON")
    args = ap.parse_args()

    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yololite_tpu.deploy.layout import aot_compile_and_place

    fn, variables = build_deploy_fn(args.model, args.img)
    rng = np.random.RandomState(0)
    x_np = (rng.rand(args.batch, args.img, args.img, 3) * 255).astype(np.uint8)
    comp, placed = aot_compile_and_place(fn, variables, x_np)
    if comp is not None:
        variables, x = placed
    else:
        import jax.numpy as jnp
        comp = jax.jit(fn)
        x = jnp.asarray(x_np)

    for _ in range(3):
        jax.block_until_ready(comp(variables, x))
    t0 = time.perf_counter()
    for _ in range(20):
        r = comp(variables, x)
    jax.block_until_ready(r)
    wall_ms = (time.perf_counter() - t0) / 20 * 1000
    print(f"{args.model} @{args.img} b{args.batch}: {wall_ms:.2f} ms/batch "
          f"({args.batch / wall_ms * 1000:.0f} img/s) wall")

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            r = comp(variables, x)
        jax.block_until_ready(r)

    try:
        total_us, rows = hlo_stats(args.trace_dir)
    except Exception as e:  # xprof not importable on some hosts
        print(f"trace captured in {args.trace_dir}; parse failed: {e}")
        return
    if total_us is None:
        print(f"no xplane found under {args.trace_dir}")
        return
    print(f"device self time: {total_us / args.iters / 1000:.2f} ms/iter "
          f"(wall-device gap = dispatch/DMA/idle)")
    print(f"{'category':22s} {'op':20s} {'us/iter':>8s} {'%':>5s} "
          f"{'GiB/s':>7s} bound_by")
    for row in rows[:args.top]:
        print(f"{row['category'][:22]:22s} {row['op'][:20]:20s} "
              f"{row['self_us'] / args.iters:>8.1f} {row['pct']:>5.1f} "
              f"{row['bw_gibs']:>7.1f} {row['bound_by']}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"wall_ms": wall_ms, "iters": args.iters,
                       "rows": rows}, f, indent=1)
        print(f"full table -> {args.json_out}")


if __name__ == "__main__":
    main()
