#!/usr/bin/env python
"""Standalone test-set evaluation CLI (parity with reference tools/evaluate.py:37-79).

Loads a checkpoint, builds a val-transform loader on --test_folder (or the
data.yaml test/val split), runs the full evaluation orchestrator into
runs/evaluate/<n>: COCO stats, P/R/F1 sweep, confusion matrix, latency bench,
summary dashboard.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--test_folder", default=None,
                    help="images dir (labels inferred: images->labels)")
    ap.add_argument("--data", default=None, help="data.yaml (uses test/val split)")
    ap.add_argument("--split", default="test", choices=["test", "val"])
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--img_size", type=int, default=None)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--iou", type=float, default=0.65)
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="evaluate the dynamic-int8 inference path "
                         "(ops/quant.py) instead of bf16 — for the "
                         "accuracy-vs-speed curve")
    args = ap.parse_args()

    from yololite_tpu.config.config import next_run_dir
    from yololite_tpu.data.dataset import YoloDataset
    from yololite_tpu.data.loader import DataLoader
    from yololite_tpu.deploy.predictor import Predictor
    from yololite_tpu.eval.evaluate import evaluate_model
    from yololite_tpu.train.steps import Trainer

    pred = Predictor(args.weights, quantize=args.quantize)
    meta = pred.meta
    img_size = int(args.img_size or meta.get("img_size", 640))
    num_classes = int(meta.get("num_classes", 1))

    if args.test_folder:
        img_dir = args.test_folder
        parts = os.path.normpath(img_dir).split(os.sep)
        lbl_dir = (os.sep.join(parts[:-1] + ["labels"])
                   if parts[-1].lower() == "images"
                   else os.path.join(img_dir, "..", "labels"))
    elif args.data:
        from yololite_tpu.config import load_configs
        cfg = load_configs(None, None, args.data, make_run_dir=False)
        key = args.split if cfg["dataset"].get(f"{args.split}_images") else "val"
        img_dir = cfg["dataset"][f"{key}_images"]
        lbl_dir = cfg["dataset"][f"{key}_labels"]
    else:
        ap.error("need --test_folder or --data")

    out_dir = next_run_dir("runs/evaluate")
    # seg checkpoints evaluate mask mAP too: polygon labels + full-res GT
    # RLEs flow through evaluate_model's segm COCOeval branch
    task = ("segment" if (meta.get("config") or {}).get("model", {})
            .get("with_masks") else "detect")
    ds = YoloDataset(img_dir, lbl_dir, img_size=img_size, is_train=False,
                     augment=False, task=task)
    loader = DataLoader(ds, args.batch_size, shuffle=False, drop_last=False)
    cfg_for_loss = dict(meta.get("config") or {})
    cfg_for_loss.setdefault("model", {})["num_classes"] = num_classes
    cfg_for_loss.setdefault("training", {})["img_size"] = img_size
    trainer = Trainer(pred.model, cfg_for_loss)
    from contextlib import nullcontext
    if args.quantize == "int8":
        # the Trainer's eval/predict steps trace on first call; tracing them
        # inside the interceptor bakes the s8xs8->s32 conv path into the graph
        from yololite_tpu.ops.quant import int8_inference
        ctx = int8_inference()
    else:
        ctx = nullcontext()
    with ctx:
        # eval_variables: head-fused but NOT normalize-folded — eval_step
        # normalizes internally (pred.variables would double-normalize)
        results = evaluate_model(trainer, pred.eval_variables, loader, out_dir,
                                 num_classes, img_size, meta.get("names"),
                                 conf_th=args.conf, iou_th=args.iou)
    print(f"Results -> {out_dir}")
    for k, v in results["coco"].items():
        print(f"  {k}: {v:.4f}")
    print(f"  best_f1: {results['best_f1']:.4f} @ conf {results['best_conf']:.3f}")
    print(f"  forward: {results['ms_per_img']:.2f} ms/img")


if __name__ == "__main__":
    main()
