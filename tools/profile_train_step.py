#!/usr/bin/env python
"""Train-step time attribution (VERDICT r4 #8): where do the 52.8 ms go?

Applies the `profile_graph_delta.py` methodology (same-process, separately
jitted nested subgraphs; stage cost = delta between consecutive graphs) to
the FULL training step at the study config (edge_n @640 b64, bf16,
approx_topk, device_augment — the hardsynth recipe):

  1. fwd            model.apply train=True (mutable batch_stats)
  2. fwd+loss       + vectorized SimOTA assignment + loss reduction
  3. fwd+loss+bwd   jax.value_and_grad of (2)
  4. full step      + AdamW (grouped LRs) + EMA + state plumbing
                    (the Trainer's real jitted step, donated state)

Caveat shared with profile_graph_delta.py: deltas between separately-jitted
graphs are an upper bound on the stage's in-situ cost (XLA fuses across
stage boundaries in the full graph; bwd shares recomputation with fwd).

Usage:  python tools/profile_train_step.py [batch] [img] [max_boxes]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yololite_tpu.models.detector import build_model_from_config
    from yololite_tpu.train.steps import Trainer, normalize_images

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    max_boxes = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    cfg = {"model": {"arch": "YOLOLiteMS_CPU",
                     "backbone": "mobilenetv4_conv_small_050",
                     "depth_multiple": 0.65, "width_multiple": 0.60,
                     "fpn_channels": 160, "head_depth": 1, "num_classes": 20,
                     "num_anchors_per_level": 1},
           "training": {"img_size": img, "amp": True, "device_augment": True,
                        "augment": True},
           "loss": {"approx_topk": True}}
    model = build_model_from_config(cfg, dtype=jnp.bfloat16)
    trainer = Trainer(model, cfg, total_updates=1000, mesh=None)
    state = trainer.init_state(seed=0, batch=batch)

    rng = np.random.RandomState(0)
    nb = 12  # valid GT per image (hardsynth mean ~25; capacity max_boxes)
    boxes = np.zeros((batch, max_boxes, 4), np.float32)
    cx = rng.rand(batch, nb) * (img - 80) + 40
    cy = rng.rand(batch, nb) * (img - 80) + 40
    w = rng.rand(batch, nb) * 60 + 12
    boxes[:, :nb, 0] = cx - w / 2; boxes[:, :nb, 1] = cy - w / 2
    boxes[:, :nb, 2] = cx + w / 2; boxes[:, :nb, 3] = cy + w / 2
    mask = np.zeros((batch, max_boxes), bool); mask[:, :nb] = True
    b = {"image": (rng.rand(batch, img, img, 3) * 255).astype(np.uint8),
         "boxes": boxes,
         "labels": rng.randint(0, 20, (batch, max_boxes)).astype(np.int32),
         "mask": mask}
    b = trainer.put_batch(b)
    lr = trainer.lr_vector(1e-3)

    def timeit(call, iters=10, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(call())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = call()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    x = normalize_images(np.asarray(b["image"]), model.dtype)
    x = jax.device_put(x)
    targets = {"boxes": b["boxes"], "labels": b["labels"], "mask": b["mask"]}

    # 1. forward only
    @jax.jit
    def fwd(params, bstats, x):
        out, mut = model.apply({"params": params, "batch_stats": bstats},
                               x, train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    t_fwd = timeit(lambda: fwd(state.params, state.batch_stats, x))

    # 2. forward + loss (assignment + reductions), no grad
    @jax.jit
    def fwd_loss(params, bstats, x):
        outs, _ = fwd.__wrapped__(params, bstats, x)
        total, metrics = trainer.loss(outs, targets, None, img_size=img)
        return total

    t_loss = timeit(lambda: fwd_loss(state.params, state.batch_stats, x))

    # 3. + backward
    @jax.jit
    def vag(params, bstats, x):
        def lf(p):
            outs, _ = fwd.__wrapped__(p, bstats, x)
            total, _ = trainer.loss(outs, targets, None, img_size=img)
            return total
        return jax.value_and_grad(lf)(params)

    t_bwd = timeit(lambda: vag(state.params, state.batch_stats, x))

    # 4. the real full step (donated state: rebuild state each iter is wrong —
    #    instead thread the returned state like the training loop does)
    holder = {"s": state}

    def full_call():
        s, m = trainer.train_step(holder["s"], b, lr)
        holder["s"] = s
        return m["total"]

    t_full = timeit(full_call)

    rows = [
        ("forward (train mode)", t_fwd),
        ("+ SimOTA assignment + loss", t_loss),
        ("+ backward (value_and_grad)", t_bwd),
        ("full step (+AdamW+EMA+aug)", t_full),
    ]
    prev = 0.0
    for name, t in rows:
        print(json.dumps({"stage": name, "ms": round(t, 2),
                          "delta_ms": round(t - prev, 2)}), flush=True)
        prev = t
    print(json.dumps({"stage": "summary", "batch": batch, "img": img,
                      "max_boxes": max_boxes,
                      "ms_per_step": round(t_full, 2),
                      "img_per_s": round(batch / (t_full / 1e3), 1)}),
          flush=True)


if __name__ == "__main__":
    main()
