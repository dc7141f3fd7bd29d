#!/usr/bin/env python
"""Sustained batched-serving throughput: overlapped vs serial dispatch.

Measures `Predictor.infer_batched_stream` (ROADMAP "serving pipeline"):
a stream of uint8 batches is pushed through the deploy graph with `depth`
batched device calls in flight, so host batch assembly + H2D upload overlap
device compute. Three numbers:

  serial:     block_until_ready after every batch (host+H2D+device in series)
  overlapped: depth-2 pipeline (the serving default)
  dispatch:   bench.py-style same-device-buffer loop (device ceiling, no H2D)

Done-criterion from VERDICT r2 #8: overlapped >= single-batch dispatch
number. Run with prepared batches (an upstream letterbox tier is assumed for
high-throughput serving; this host has 1 core, in-process cv2 letterbox
caps at ~0.5k img/s and would measure the host, not the pipeline).

Usage: python tools/bench_serving.py [--batch 128] [--nbatches 30] [--img 640]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nbatches", type=int, default=30)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--pool", type=int, default=8,
                    help="distinct host buffers cycled through (forces real "
                         "H2D each call instead of a cached device buffer)")
    args = ap.parse_args()

    import jax
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from yololite_tpu.deploy.predictor import Predictor
    from yololite_tpu.models.detector import build_model_from_config, init_model
    from yololite_tpu.train.checkpoint import save_checkpoint

    # synthetic edge_n checkpoint -> the real Predictor deploy stack
    mcfg = {"arch": "YOLOLiteMS_CPU", "backbone": "mobilenetv4_conv_small_050",
            "depth_multiple": 0.65, "width_multiple": 0.60,
            "fpn_channels": 160, "head_depth": 1, "num_classes": 3,
            "num_anchors_per_level": 1}
    cfg = {"model": mcfg, "training": {"img_size": args.img}}
    model = build_model_from_config(cfg, dtype=jnp.bfloat16)
    params, batch_stats = init_model(model, args.img, seed=0, batch=1)
    ckpt = "/tmp/bench_serving_edge_n.ckpt"
    save_checkpoint(ckpt, params, batch_stats,
                    {"config": cfg, "num_classes": 3, "img_size": args.img,
                     "arch": mcfg["arch"], "backbone": mcfg["backbone"]})

    pred = Predictor(ckpt, s2d_stem=True)
    B, S, N = args.batch, args.img, args.nbatches
    rng = np.random.RandomState(0)
    from yololite_tpu.deploy.s2d import pack_s2d
    pool = [(rng.rand(B, S, S, 3) * 255).astype(np.uint8)
            for _ in range(args.pool)]
    if pred.s2d:
        pool = [pack_s2d(b) for b in pool]

    def batches():
        for i in range(N):
            yield pool[i % len(pool)]

    # warmup/compile
    for _ in pred.infer_batched_stream([pool[0]] * 3, conf=0.25, iou=0.65,
                                       prepared=True, depth=args.depth):
        pass

    # serial: depth=0 -> every batch fully synchronized before the next
    t0 = time.perf_counter()
    ns = 0
    for res in pred.infer_batched_stream(batches(), conf=0.25, iou=0.65,
                                         prepared=True, depth=0):
        ns += len(res)
    t_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    no = 0
    for res in pred.infer_batched_stream(batches(), conf=0.25, iou=0.65,
                                         prepared=True, depth=args.depth):
        no += len(res)
    t_over = time.perf_counter() - t0
    assert ns == no == N * B

    # dispatch ceiling: device-RESIDENT buffer, pipelined (bench.py
    # methodology — one upload, then pure device re-dispatch; a host numpy
    # buffer here would re-pay H2D every call and measure the link instead)
    x = jax.device_put(pool[0])
    jax.block_until_ready(x)
    for _ in range(3):
        out = pred._run(S, 0.25, 0.65, 300, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N):
        out = pred._run(S, 0.25, 0.65, 300, x)
    jax.block_until_ready(out)
    t_disp = time.perf_counter() - t0

    tot = N * B
    mb = pool[0].nbytes / 1e6
    print(json.dumps({
        "config": f"edge_n@{S} b{B} serving",
        "serial_img_s": round(tot / t_serial, 1),
        "overlapped_img_s": round(tot / t_over, 1),
        "dispatch_ceiling_img_s": round(tot / t_disp, 1),
        "depth": args.depth,
        "overlap_vs_ceiling": round(t_disp / t_over, 4),
        "h2d_mb_per_batch": round(mb, 1),
        # effective H2D bandwidth the serial leg sustained; if this is far
        # below PCIe (~12 GB/s) the H2D path is a network tunnel and the
        # overlap criterion is link-bound, not pipeline-bound
        "serial_h2d_MBps": round(N * mb / t_serial, 1),
    }))


if __name__ == "__main__":
    main()
