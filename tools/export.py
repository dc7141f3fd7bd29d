#!/usr/bin/env python
"""Export CLI (parity with reference export/export_onnx.py + export_torchscript.py).

Formats:
  raw     — per-level maps [B,A,S,S,5+C] (reference --format raw)
  decoded — boxes_xyxy/obj_logits/cls_logits, NMS outside (reference decoded)
  nms     — full graph incl. class-aware NMS (TPU-native extra)
Artifact: serialized StableHLO (jax.export) + meta.json sidecar.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--format", default="decoded", choices=["raw", "decoded", "nms"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--img_size", type=int, default=None)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--iou", type=float, default=0.65)
    ap.add_argument("--max_det", type=int, default=300)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--fp32", action="store_true", help="export in fp32 (default bf16)")
    ap.add_argument("--runtime", default="stablehlo",
                    choices=["stablehlo", "tflite", "onnx"],
                    help="stablehlo: TPU/JAX artifact; tflite: self-contained "
                         "host-CPU flatbuffer; onnx: opset-17 ONNX for "
                         "onnxruntime CPU deploy")
    ap.add_argument("--quantize", default=None, choices=[None, "dynamic", "fp16"],
                    help="tflite only: dynamic-range int8 weights or fp16")
    ap.add_argument("--dynamic_batch", action="store_true",
                    help="onnx only: symbolic batch axis (reference "
                         "dynamic_axes parity) — one artifact, any batch")
    args = ap.parse_args()

    import jax.numpy as jnp
    from yololite_tpu.deploy.export import (export_model, export_onnx,
                                            export_tflite, load_exported)

    if args.runtime == "tflite":
        path = export_tflite(args.weights, out_dir=args.out_dir, fmt=args.format,
                             batch=args.batch, img_size=args.img_size,
                             conf=args.conf, iou=args.iou, max_det=args.max_det,
                             quantize=args.quantize)
    elif args.runtime == "onnx":
        path = export_onnx(args.weights, out_dir=args.out_dir, fmt=args.format,
                           batch=args.batch, img_size=args.img_size,
                           conf=args.conf, iou=args.iou, max_det=args.max_det,
                           dynamic_batch=args.dynamic_batch)
    else:
        path = export_model(args.weights, out_dir=args.out_dir, fmt=args.format,
                            batch=args.batch, img_size=args.img_size,
                            conf=args.conf, iou=args.iou, max_det=args.max_det,
                            dtype=jnp.float32 if args.fp32 else jnp.bfloat16)
    # load-back sanity run (reference export dry-run parity)
    import numpy as np
    call, meta = load_exported(path)
    x = np.zeros((args.batch, meta["img_size"], meta["img_size"], 3), np.uint8)
    out = call(x)
    print(f"Exported {args.format} artifact -> {path}")
    print(f"Sanity run OK; output tree: {type(out).__name__}")


if __name__ == "__main__":
    main()
