"""Worker process for the 2-process jax.distributed smoke test.

Launched (twice) by tests/test_parallel.py::test_multihost_two_process_train_step
with JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=4,
so the global mesh spans 2 processes x 4 virtual CPU devices = 8 devices.
Each process feeds its local half of the global batch; one fused train step
runs under the global mesh; both processes print the post-step parameter
checksum, which the launcher asserts identical (grads were all-reduced).

Reference has no distributed story at all (SURVEY.md §2) — this validates the
TPU build's multi-host path (`parallel/mesh.py:init_distributed` + SPMD step).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    args = ap.parse_args()

    import jax
    # CPU host platform BEFORE any backend init (the image force-prepends a
    # single-chip TPU 'axon' platform which must not win here).
    jax.config.update("jax_platforms", "cpu")
    # reuse the test suite's persistent compilation cache (the train-step
    # compile is ~3 min cold on CPU, instant warm)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import numpy as np

    from yololite_tpu.parallel.mesh import init_distributed, make_mesh

    n_global = init_distributed(coordinator_address=args.coordinator,
                                num_processes=args.num_processes,
                                process_id=args.process_id)
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert n_global == 8, f"expected 8 global devices, got {n_global}"

    import jax.numpy as jnp

    from yololite_tpu.models.detector import build_model_from_config
    from yololite_tpu.train.steps import Trainer

    img_size, local_batch = 64, 8  # global batch 16 over 8 devices
    cfg = {
        "model": {"arch": "YOLOLiteMS_CPU",
                  "backbone": "mobilenetv4_conv_small_050",
                  "depth_multiple": 0.5, "width_multiple": 1.0,
                  "fpn_channels": 32, "head_depth": 1,
                  "num_classes": 3, "num_anchors_per_level": 1},
        "training": {"img_size": img_size, "batch_size": local_batch * 2,
                     "lr": 1e-3, "optimizer": "adamw", "weight_decay": 1e-4,
                     "grad_clip": 1.0, "ema": True, "ema_decay": 0.99,
                     "amp": False},
        "loss": {"topk_limit": 10, "area_cells_min": 0.0,
                 "area_cells_max": 256, "area_tol": 1.75},
    }
    mesh = make_mesh()  # all 8 global devices
    model = build_model_from_config(cfg, dtype=jnp.float32)
    trainer = Trainer(model, cfg, total_updates=10, mesh=mesh)
    state = trainer.init_state(seed=0)  # same seed -> identical on both hosts

    # deterministic local batch, DIFFERENT per process (so the all-reduce
    # matters: a process seeing only its own grads would diverge)
    rng = np.random.RandomState(100 + args.process_id)
    m = 8
    batch_np = {
        "image": (rng.rand(local_batch, img_size, img_size, 3) * 255
                  ).astype(np.uint8),
        "boxes": np.tile(np.array([[8.0, 8.0, 40.0, 40.0]], np.float32),
                         (local_batch, m, 1)),
        "labels": np.zeros((local_batch, m), np.int32),
        "mask": np.tile(np.array([True] + [False] * (m - 1)), (local_batch, 1)),
    }
    device_batch = trainer.put_batch(batch_np)

    # AOT-compile BEFORE the first cross-process collective, then rendezvous
    # at a host-side coordination-service barrier. The gloo transport that
    # backs CPU collectives gives the peer only ~30s to show up at context
    # init; on a contended 1-core host the two processes' jit compiles can
    # skew past that, so the compile must not sit inside the window.
    lr = trainer.lr_vector(1e-3)
    compiled_step = trainer.train_step.lower(state, device_batch, lr).compile()
    from jax._src.distributed import global_state
    global_state.client.wait_at_barrier("train_step_compiled", 600_000)

    state, metrics = compiled_step(state, device_batch, lr)
    total = float(metrics["total"])  # fully replicated -> locally readable
    assert np.isfinite(total), f"non-finite loss: {total}"

    checksum = float(sum(jnp.sum(jnp.abs(x)) for x in
                         jax.tree_util.tree_leaves(state.params)))
    print(f"MULTIHOST_OK pid={args.process_id} loss={total:.6f} "
          f"checksum={checksum:.6f}", flush=True)

    # ---- multi-host validation path (train/loop.py eval epoch) ----------
    # Every process evaluates the full val set LOCALLY: put_eval_batch must
    # bypass the global mesh (batch-sharding identical per-host copies would
    # both duplicate the set and make the detections span non-addressable
    # devices) and local_eval_variables pulls the replicated EMA weights to
    # addressable storage. np.asarray on the detections must succeed.
    eval_vars = trainer.local_eval_variables(trainer.ema_variables(state))
    eval_batch = trainer.put_eval_batch(
        {**batch_np, "image_id": np.arange(local_batch)})
    vmetrics, dets = trainer.eval_step(eval_vars, eval_batch,
                                       conf_th=0.1, iou_th=0.65)
    dets_np = {k: np.asarray(v) for k, v in dets.items()}
    assert dets_np["boxes"].shape[0] == local_batch
    vloss = float(vmetrics["total"])
    assert np.isfinite(vloss), f"non-finite val loss: {vloss}"
    print(f"MULTIHOST_EVAL_OK pid={args.process_id} vloss={vloss:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
