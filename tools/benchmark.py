#!/usr/bin/env python
"""Benchmark harness (parity with reference benchmark.py:54-152).

Trains + evaluates YoloLite-TPU models on one or more datasets, measures
batched TPU inference throughput + single-image latency, and appends a CSV —
the same train -> val -> export-path -> latency pipeline the reference runs
against Ultralytics, reporting against the reference numbers in BASELINE.md.

    python tools/benchmark.py --data ds1/data.yaml ds2/data.yaml \
        --models edge_n edge_m --epochs 50 --out benchmark_results.csv
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def init_csv(path):
    if not os.path.exists(path):
        with open(path, "w", newline="") as f:
            csv.writer(f).writerow([
                "dataset", "model", "map50", "map", "best_f1",
                "latency_ms_single", "throughput_img_s_batched",
                "train_s", "timestamp"])


def save_result(path, row):
    with open(path, "a", newline="") as f:
        csv.writer(f).writerow(row)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", nargs="+", required=True, help="data.yaml paths")
    ap.add_argument("--models", nargs="+", default=["edge_n"],
                    help="model names from configs/models")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--img_size", type=int, default=640)
    ap.add_argument("--bench_batch", type=int, default=128)
    ap.add_argument("--out", default="benchmark_results.csv")
    args = ap.parse_args()

    import numpy as np
    import jax
    from yololite_tpu import YoloLite

    init_csv(args.out)
    for dataset in args.data:
        for model_name in args.models:
            print(f"\n=== {dataset} / {model_name} ===")
            try:
                model = YoloLite(model_name)
                t0 = time.time()
                model.train(data=dataset, epochs=args.epochs,
                            batch_size=args.batch_size, img_size=args.img_size)
                train_s = time.time() - t0

                stats = model.val(data=dataset, split="test")
                map50, map_all = stats["map_50"], stats["map"]

                # single-image latency (deploy path, incl. pre/post on host)
                pred = model.predictor
                pred.warmup()
                rng = np.random.RandomState(0)
                frame = (rng.rand(args.img_size, args.img_size, 3) * 255)\
                    .astype(np.uint8)
                times = []
                for _ in range(50):
                    r = pred.infer_image_profiled(frame)
                    times.append(r["speed"]["total_ms"])
                lat = float(np.mean(times))

                # batched throughput (the TPU serving configuration)
                import jax.numpy as jnp
                from yololite_tpu.ops.decode import decode_anchorfree
                from yololite_tpu.ops.nms import batched_nms, yolo_scores
                from yololite_tpu.train.steps import normalize_images
                m = pred.model
                B = args.bench_batch

                @jax.jit
                def infer(v, x):
                    out = m.apply(v, normalize_images(x, m.dtype), train=False)
                    outs = out[0] if m.with_masks else out
                    d = decode_anchorfree(outs, args.img_size)
                    s, c = yolo_scores(d["obj"][..., 0].astype(jnp.float32),
                                       d["cls"].astype(jnp.float32))
                    return batched_nms(d["box"].astype(jnp.float32), s, c,
                                       iou_th=0.65, conf_th=0.25, max_det=100,
                                       pre_nms_topk=256)
                x = jnp.zeros((B, args.img_size, args.img_size, 3), jnp.uint8)
                # eval_variables: this graph normalizes internally — the
                # deploy variables are normalize-folded and expect raw uint8
                for _ in range(3):
                    jax.block_until_ready(infer(pred.eval_variables, x))
                t0 = time.perf_counter()
                for _ in range(10):
                    out = infer(pred.eval_variables, x)
                jax.block_until_ready(out)
                thr = B / ((time.perf_counter() - t0) / 10)

                print(f"mAP50 {map50:.3f} | mAP {map_all:.3f} | "
                      f"{lat:.2f} ms single | {thr:.0f} img/s batched")
                save_result(args.out, [dataset, model_name, f"{map50:.4f}",
                                       f"{map_all:.4f}",
                                       f"{stats.get('best_f1', 0):.4f}",
                                       f"{lat:.2f}", f"{thr:.0f}",
                                       f"{train_s:.0f}",
                                       time.strftime("%Y-%m-%dT%H:%M:%S")])
            except Exception as e:
                print(f"FAILED: {e}")
                save_result(args.out, [dataset, model_name, 0, 0, 0, 0, 0, 0,
                                       time.strftime("%Y-%m-%dT%H:%M:%S")])
    print(f"\nResults -> {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
