#!/usr/bin/env python
"""Model info: parameters, FLOPs/MACs, level shapes — the numbers the
reference publishes per model (BENCHMARK.md:351-357 params/MACs/FLOPs table).

    python tools/model_info.py --model configs/models/edge_n.yaml [--img_size 640]
    python tools/model_info.py --all          # whole zoo summary
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_CPU_FORCED = False


def _force_cpu():
    """Cost analysis needs the CPU backend (some TPU plugins report no flops)."""
    global _CPU_FORCED
    if not _CPU_FORCED:
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        _CPU_FORCED = True


def analyze(model_yaml, img_size=640, num_classes=3):
    _force_cpu()
    import jax
    import jax.numpy as jnp
    import yaml
    from yololite_tpu.models.detector import build_model_from_config, init_model
    from yololite_tpu.models import count_params

    with open(model_yaml) as f:
        cfg = yaml.safe_load(f)
    cfg.setdefault("model", {})["num_classes"] = num_classes
    cfg.setdefault("training", {})["img_size"] = img_size
    model = build_model_from_config(cfg, dtype=jnp.float32)
    params, bstats = init_model(model, img_size, 0, 1)

    def fwd(p, x):
        return model.apply({"params": p, "batch_stats": bstats}, x, train=False)

    x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    lowered = jax.jit(fwd).lower(params, x)
    cost = lowered.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    return {
        "model": os.path.splitext(os.path.basename(model_yaml))[0],
        "backbone": cfg["model"].get("backbone", "?"),
        "params_M": count_params(params) / 1e6,
        "flops_G": flops / 1e9,
        "macs_G": flops / 2e9,
        "strides": model.get_strides(),
        "img_size": img_size,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--img_size", type=int, default=640)
    ap.add_argument("--num_classes", type=int, default=3)
    ap.add_argument("--all", action="store_true", help="analyze the whole zoo")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.all:
        targets = sorted(
            os.path.join(root, "configs", "models", f)
            for f in os.listdir(os.path.join(root, "configs", "models"))
            if f.endswith(".yaml"))
    else:
        if not args.model:
            ap.error("--model or --all required")
        targets = [args.model]

    print(f"{'model':22s} {'backbone':28s} {'params(M)':>9s} {'GFLOPs':>8s} "
          f"{'GMACs':>8s}  strides")
    for t in targets:
        try:
            info = analyze(t, args.img_size, args.num_classes)
            print(f"{info['model']:22s} {info['backbone']:28s} "
                  f"{info['params_M']:9.3f} {info['flops_G']:8.2f} "
                  f"{info['macs_G']:8.2f}  {info['strides']}")
        except Exception as e:
            print(f"{os.path.basename(t):22s} FAILED: {e}")


if __name__ == "__main__":
    main()
