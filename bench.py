#!/usr/bin/env python
"""Benchmark: edge_n @640 batched inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "img/s", "vs_baseline": N}

The measured graph is the full deploy path — uint8 -> normalize -> backbone ->
FPN -> heads -> decode -> class-aware NMS — jitted as a single XLA program in
bf16 (the reference's deploy path is ONNX Runtime CPU at 23.88 ms/img for
edge_n @640, BENCHMARK.md:336; the driver north star in BASELINE.json is
5,000 img/s/chip, used as vs_baseline denominator).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_IMG_S = 5000.0  # BASELINE.json north star: edge_n @640 >= 5k img/s/chip
_REPO = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.path.join(_REPO, ".jax_cache")

# The axon TPU tunnel is flaky (backend-init RuntimeError, or jax.devices()
# hanging outright — both observed as multi-hour outages). One transient
# failure must not forfeit the round's official record, so the default mode
# is an orchestrator: run the measurement in a child process with a hard
# timeout, retry with backoff, and on final failure emit the last archived
# number from benchmarks_tpu.jsonl clearly marked as stale.
_ATTEMPTS = int(os.environ.get("BENCH_ATTEMPTS", "4"))
_BACKOFF_S = (0, 60, 180, 300)  # sleep before attempt i
# first-ever compile can take minutes through the tunnel
_ATTEMPT_TIMEOUT_S = int(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "1200"))


def _archived_record(error: str):
    """Last-known-good edge_n@640 number from the committed archive."""
    best = None
    try:
        with open(os.path.join(_REPO, "benchmarks_tpu.jsonl")) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if str(rec.get("config", "")).startswith("edge_n@640"):
                    best = rec  # keep the LAST (most recent) entry
    except OSError:
        pass
    value = float(best["img_per_s"]) if best else 0.0
    return {
        "metric": "images/sec/chip (edge_n @640px inference incl. decode+NMS)"
                  " [ARCHIVED last-known-good: TPU tunnel unavailable]",
        "value": round(value, 2),
        "unit": "img/s",
        "vs_baseline": round(value / BASELINE_IMG_S, 4),
        "stale": True,
        "error": error[-2000:],
    }


def orchestrate():
    last_err = "no attempts ran"
    for i in range(_ATTEMPTS):
        backoff = _BACKOFF_S[min(i, len(_BACKOFF_S) - 1)]
        if backoff:
            time.sleep(backoff)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--measure"]
                + sys.argv[1:],
                capture_output=True, text=True, timeout=_ATTEMPT_TIMEOUT_S,
                cwd=_REPO)
        except subprocess.TimeoutExpired:
            last_err = f"attempt {i + 1}: timed out after {_ATTEMPT_TIMEOUT_S}s"
            continue
        if proc.returncode == 0:
            # re-print only the JSON line (child may emit compile chatter)
            for line in reversed(proc.stdout.strip().splitlines()):
                if line.startswith("{"):
                    print(line)
                    return 0
            last_err = f"attempt {i + 1}: rc=0 but no JSON line in stdout"
        else:
            last_err = (f"attempt {i + 1}: rc={proc.returncode}: "
                        + (proc.stderr or proc.stdout)[-1500:])
    print(json.dumps(_archived_record(last_err)))
    return 0


def main():
    import jax
    # persistent XLA compilation cache: first-ever run pays the full compile,
    # subsequent bench invocations start in seconds
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from yololite_tpu.models.detector import build_model_from_config, init_model
    from yololite_tpu.ops.decode import decode_anchorfree
    from yololite_tpu.ops.nms import batched_nms, yolo_scores

    argv = [a for a in sys.argv[1:] if a != "--measure"]
    img_size = 640
    batch = int(argv[0]) if argv else 128

    cfg = {"model": {"arch": "YOLOLiteMS_CPU",
                     "backbone": "mobilenetv4_conv_small_050",
                     "depth_multiple": 0.65, "width_multiple": 0.60,
                     "fpn_channels": 160, "head_depth": 1, "num_classes": 3,
                     "num_anchors_per_level": 1},
           "training": {"img_size": img_size}}
    model = build_model_from_config(cfg, dtype=jnp.bfloat16)
    params, batch_stats = init_model(model, img_size, seed=0, batch=1)
    # exact normalize-into-stem fold (deploy/fold_norm.py): the deployed graph
    # consumes raw uint8 and never materializes the normalized image (~10%).
    from yololite_tpu.deploy.fold_norm import fold_normalization, raw_cast
    from yololite_tpu.deploy.fuse_head import fuse_head_params
    from yololite_tpu.deploy.s2d import (pack_s2d, rewrite_stem_to_s2d,
                                         s2d_stem)
    import dataclasses
    params, batch_stats, _folded = fold_normalization(params, batch_stats)
    # deploy-time head fusion: one 1x1 conv per level instead of 3 (exact)
    params, _fused = fuse_head_params(params)
    # space-to-depth stem (exact rewrite; input packed host-side, deploy/s2d.py)
    params, _s2d = rewrite_stem_to_s2d(params)
    model = dataclasses.replace(model, fused_head=True)
    variables = {"params": params, "batch_stats": batch_stats}

    def infer_fn(variables, images_u8):
        with s2d_stem():
            outs = model.apply(variables, raw_cast(images_u8, jnp.bfloat16),
                               train=False)
        d = decode_anchorfree(outs, img_size)
        scores, classes = yolo_scores(d["obj"][..., 0].astype(jnp.float32),
                                      d["cls"].astype(jnp.float32))
        return batched_nms(d["box"].astype(jnp.float32), scores, classes,
                           iou_th=0.65, conf_th=0.25, max_det=100,
                           pre_nms_topk=256, approx_topk=True,
                           fixpoint_unroll=8)

    rng = np.random.RandomState(0)
    images_np = pack_s2d(
        (rng.rand(batch, img_size, img_size, 3) * 255).astype(np.uint8))

    # AOT-compile with XLA-chosen input layouts and place weights + image
    # buffer directly into them — the program then starts at the stem conv
    # instead of a relayout copy (deploy/layout.py; ~+10% at b128). The
    # compile is pinned to the layouts device_put ACTUALLY produced (the
    # tunnel backend ignores a few requested layouts — r4 finding). Where
    # the backend rejects explicit Formats outright (the axon tunnel), the
    # r5 fallback bakes the weights into the executable as compile-time
    # constants instead (const_weights_jit) — XLA owns their layout with no
    # Format API involved; measured +8.7% over weights-as-args plain jit.
    from yololite_tpu.deploy.layout import (aot_compile_and_place, chain_iters,
                                            checked_call, const_weights_jit)
    compiled, placed = aot_compile_and_place(infer_fn, variables, images_np)
    if compiled is not None:
        variables, images = placed
        infer = checked_call(compiled, infer_fn)
        call = lambda: infer(variables, images)  # noqa: E731
    else:
        images = jnp.asarray(images_np)
        cw = const_weights_jit(infer_fn, variables)
        call = lambda: cw(images)  # noqa: E731

    # warmup + compile
    for _ in range(3):
        jax.block_until_ready(call())

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = call()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    # chip-resident throughput: one dispatch runs K chained evaluations on
    # device, isolating the chip from per-dispatch tunnel overhead (~1.5 ms
    # per call on the r5 dev tunnel; deploy/layout.py:chain_iters)
    K = 16
    chained = chain_iters(infer_fn, variables, K)
    jax.block_until_ready(chained(images))
    t0 = time.perf_counter()
    c_iters = 4
    for _ in range(c_iters):
        out = chained(images)
    jax.block_until_ready(out)
    dt_chip = (time.perf_counter() - t0) / (c_iters * K)

    img_s = batch / dt
    p50_ms = dt / batch * 1000.0
    result = {
        "metric": f"images/sec/chip (edge_n @{img_size}px batch={batch} inference incl. decode+NMS)",
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 4),
        "p50_ms_per_img": round(p50_ms, 4),
        # BASELINE.json also names single-frame p50. In this environment a
        # single-frame dispatch measures the dev tunnel's ~270 ms per-call
        # RTT, not the model (BENCHMARK_TPU.md "Note on single-image
        # latency"), so p50_ms_per_img above is the batched steady-state
        # per-image time and this flag records the limitation structurally.
        "p50_env_bound": True,
        # one-dispatch-many-steps measurement: what the CHIP sustains once
        # per-dispatch tunnel overhead is amortized (r5; the e2e `value`
        # above keeps the r2/r4 steady-state-dispatch methodology)
        "chip_img_per_s": round(batch / dt_chip, 2),
        "per_dispatch_overhead_ms": round((dt - dt_chip) * 1e3, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if "--measure" in sys.argv:
        main()
    else:
        sys.exit(orchestrate())
