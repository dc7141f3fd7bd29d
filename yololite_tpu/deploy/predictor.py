"""Reusable predictor over a checkpoint — the deploy-time inference seam.

Parity with the reference `ONNX_Predict` class (tools/infer_onnx.py:143-233):
  Predictor(weights).infer_image(img_bgr, img_size, conf, iou, max_det)
    -> (boxes_xyxy, scores, classes) in ORIGINAL image pixels,
with letterbox (or square-resize) preprocessing and back-mapping through
pad/scale (infer_onnx.py:214-231), plus per-stage speed profiling
(pre/infer/post ms) as in the V2 results dict (README.md:36-42).

TPU-first: preprocessing emits uint8; normalize -> forward -> decode -> NMS is
ONE jitted graph per (batch, img_size); graphs are cached per shape.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import numpy as np

import cv2

import jax
import jax.numpy as jnp

from yololite_tpu.ops.decode import decode_anchorfree
from yololite_tpu.ops.letterbox import letterbox_image, resize_image, unletterbox_boxes
from yololite_tpu.ops.nms import batched_nms, yolo_scores
from yololite_tpu.train.checkpoint import load_checkpoint, model_from_meta
from yololite_tpu.train.steps import normalize_images


class Predictor:
    # Below this confidence the candidate pool is dense enough that greedy
    # suppression chains can exceed the unrolled fixpoint depth; fall back to
    # the exact while_loop NMS (fixpoint_unroll=0) so sweep-style calls
    # (conf=0.001 for PR curves) never silently diverge from exact greedy.
    _UNROLL_CONF_FLOOR = 0.05

    def __init__(self, weights: str, use_letterbox: bool = True,
                 dtype=jnp.bfloat16, quantize: Optional[str] = None,
                 fold_normalize: bool = True, s2d_stem: bool = False,
                 fixpoint_unroll: int = 8):
        """quantize="int8": run every conv in the dynamic-int8 path
        (ops/quant.py) — validate accuracy with tools/evaluate.py first.
        fold_normalize=True (default): fold the ImageNet input normalization
        into the stem conv (deploy/fold_norm.py) — exact, ~10% faster on the
        bandwidth-bound edge models.
        s2d_stem=True: additionally rewrite the 3x3/s2 stem conv over a
        host-packed space-to-depth input (deploy/s2d.py) — +8% device
        throughput at ~2 ms/img/core host packing cost; enable on serving
        hosts with spare CPU cores.
        fixpoint_unroll: NMS fixpoint iterations unrolled in the deploy graph
        (8 covers serving-range conf; +5% over the while_loop). Calls with
        conf < 0.05 automatically use the exact while_loop instead — deep
        suppression chains at sweep thresholds can exceed a fixed unroll."""
        sd, meta = load_checkpoint(weights)
        self.meta = meta
        self.model = model_from_meta(meta, dtype=dtype)
        self.variables = {"params": sd["params"], "batch_stats": sd["batch_stats"]}
        self.folded = False
        self.s2d = False
        if fold_normalize and quantize is None:
            from yololite_tpu.deploy.fold_norm import fold_normalization
            fp, fbs, ok = fold_normalization(sd["params"], sd["batch_stats"])
            if ok:
                self.variables = {"params": fp, "batch_stats": fbs}
                self.folded = True
            if ok and s2d_stem:
                from yololite_tpu.deploy.s2d import rewrite_stem_to_s2d
                fp, ok2 = rewrite_stem_to_s2d(self.variables["params"])
                if ok2:
                    self.variables = {"params": fp,
                                      "batch_stats": self.variables["batch_stats"]}
                    self.s2d = True
        # exact deploy-time head fusion (one 1x1 conv/level — fuse_head.py)
        import dataclasses
        from yololite_tpu.deploy.fuse_head import fuse_head_params
        fp, ok = fuse_head_params(self.variables["params"])
        if ok:
            self.variables = {"params": fp,
                              "batch_stats": self.variables["batch_stats"]}
            self.model = dataclasses.replace(self.model, fused_head=True)
        # variables for NORMALIZED-input consumers (Trainer.eval_step in
        # tools/evaluate.py / api.val): head-fused to match self.model, but
        # WITHOUT the normalize fold — self.variables expect raw uint8 and
        # feeding them a normalized image double-normalizes (AP collapses
        # to zero; regression-tested in test_api_deploy.py).
        ep, _ = fuse_head_params(sd["params"])
        self.eval_variables = {"params": ep, "batch_stats": sd["batch_stats"]}
        self.img_size = int(meta.get("img_size", 640))
        self.names = meta.get("names")
        self.use_letterbox = use_letterbox
        if quantize not in (None, "int8"):
            raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")
        self.quantize = quantize
        self.fixpoint_unroll = int(fixpoint_unroll)
        self._compiled: Dict[tuple, callable] = {}
        self._aot: Dict[tuple, tuple] = {}

    # ------------------------------------------------------------------ #
    def _make_fn(self, img_size: int, conf: float, iou: float, max_det: int):
        """Raw (unjitted) deploy-graph function for this parameter set."""
        # exact while_loop NMS below the documented conf floor (see __init__)
        unroll = self.fixpoint_unroll if conf >= self._UNROLL_CONF_FLOOR else 0
        key = (img_size, conf, iou, max_det)
        if key not in self._compiled:
            model = self.model
            with_masks = bool(getattr(model, "with_masks", False))
            quantize = self.quantize
            folded = self.folded
            s2d = self.s2d

            def fn(variables, images_u8):
                if quantize == "int8":
                    from yololite_tpu.ops.quant import int8_inference
                    x = normalize_images(images_u8, model.dtype)
                    with int8_inference():
                        out = model.apply(variables, x, train=False)
                elif s2d:
                    from yololite_tpu.deploy.fold_norm import raw_cast
                    from yololite_tpu.deploy.s2d import s2d_stem
                    with s2d_stem():
                        out = model.apply(variables,
                                          raw_cast(images_u8, model.dtype),
                                          train=False)
                elif folded:
                    from yololite_tpu.deploy.fold_norm import (folded_stem,
                                                               raw_cast)
                    with folded_stem():
                        out = model.apply(variables,
                                          raw_cast(images_u8, model.dtype),
                                          train=False)
                else:
                    x = normalize_images(images_u8, model.dtype)
                    out = model.apply(variables, x, train=False)
                outs, protos = out if with_masks else (out, None)
                d = decode_anchorfree(outs, img_size,
                                      num_classes=model.num_classes
                                      if with_masks else None)
                scores, classes = yolo_scores(d["obj"][..., 0].astype(jnp.float32),
                                              d["cls"].astype(jnp.float32))
                b, s_, c_, v_, idx = batched_nms(
                    d["box"].astype(jnp.float32), scores, classes,
                    iou_th=iou, conf_th=conf, max_det=max_det, pre_nms_topk=512,
                    fixpoint_unroll=unroll)
                if with_masks:
                    from yololite_tpu.ops.masks import assemble_masks_batch
                    coef = jnp.take_along_axis(d["coef"].astype(jnp.float32),
                                               idx[..., None], axis=1)
                    masks = assemble_masks_batch(protos.astype(jnp.float32),
                                                 coef, b, float(img_size))
                    return b, s_, c_, v_, masks
                return b, s_, c_, v_
            self._compiled[key] = fn
        return self._compiled[key]

    def _run(self, img_size: int, conf: float, iou: float, max_det: int,
             batch_np: np.ndarray):
        """Dispatch one deploy-graph call (async — caller block_until_readys).

        Per (params, batch-shape) the graph is AOT-compiled with XLA-chosen
        input layouts and the weights pre-placed into them (deploy/layout.py)
        so no relayout copy runs per call; falls back to plain jit where the
        layout API is unavailable.
        """
        if self.s2d and batch_np.shape[-1] == 3:
            from yololite_tpu.deploy.s2d import pack_s2d
            batch_np = pack_s2d(batch_np)
        skey = (img_size, conf, iou, max_det, batch_np.shape[0])
        entry = self._aot.get(skey)
        if entry is None:
            from yololite_tpu.deploy.layout import (aot_compile_and_place,
                                                    checked_call,
                                                    const_weights_jit)
            fn = self._make_fn(img_size, conf, iou, max_det)
            # pinned to the layouts device_put actually produces (the tunnel
            # backend ignores some requested layouts — deploy/layout.py)
            compiled, placed = aot_compile_and_place(fn, self.variables,
                                                     batch_np)
            if compiled is not None:
                entry = (checked_call(compiled, fn), placed[0],
                         placed[1].format)
            else:
                # backend rejects explicit Formats (axon tunnel): bake the
                # weights in as compile-time constants instead — XLA owns
                # their layout, no per-call weight relayout (r5, +8.7%)
                cw = const_weights_jit(fn, self.variables)
                entry = (lambda _v, x, _cw=cw: _cw(x), self.variables, None)
            self._aot[skey] = entry
            if compiled is not None:  # first batch already placed
                return entry[0](entry[1], placed[1])
        call, variables, img_fmt = entry
        x = (jax.device_put(batch_np, img_fmt) if img_fmt is not None
             else jnp.asarray(batch_np))
        return call(variables, x)

    # ------------------------------------------------------------------ #
    def preprocess(self, img_rgb: np.ndarray, img_size: int):
        """Returns (canvas, ((sx, sy), pad_x, pad_y)); letterbox is uniform,
        plain resize is per-axis (non-square inputs back-map correctly)."""
        if self.use_letterbox:
            canvas, scale, px, py = letterbox_image(img_rgb, img_size)
            return canvas, ((scale, scale), px, py)
        canvas, sx, sy = resize_image(img_rgb, img_size)
        return canvas, ((sx, sy), 0, 0)

    def infer_image(self, img_bgr: np.ndarray, img_size: Optional[int] = None,
                    conf: float = 0.25, iou: float = 0.45, max_det: int = 300
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """BGR frame in -> (boxes xyxy px, scores, classes) in original pixels."""
        out = self.infer_image_profiled(img_bgr, img_size, conf, iou, max_det)
        return out["boxes"], out["scores"], out["classes"]

    def infer_image_profiled(self, img_bgr: np.ndarray,
                             img_size: Optional[int] = None, conf: float = 0.25,
                             iou: float = 0.45, max_det: int = 300) -> Dict:
        img_size = int(img_size or self.img_size)
        h, w = img_bgr.shape[:2]

        t0 = time.perf_counter()
        img_rgb = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
        canvas, (scale, px, py) = self.preprocess(img_rgb, img_size)
        t1 = time.perf_counter()

        out = jax.block_until_ready(
            self._run(img_size, conf, iou, max_det, canvas[None]))
        with_masks = len(out) == 5
        boxes, scores, classes, valid = out[:4]
        t2 = time.perf_counter()

        m = np.asarray(valid[0])
        b = np.asarray(boxes[0])[m]
        s = np.asarray(scores[0])[m]
        c = np.asarray(classes[0])[m]
        b = unletterbox_boxes(b, scale, px, py, w, h)
        masks_out = None
        if with_masks:
            # proto-res masks in letterbox space -> crop pad, resize to original
            pm = np.asarray(out[4][0])[m]                 # [D, Hp, Wp] probs
            if len(pm):
                hp = pm.shape[1]
                r = hp / float(img_size)
                ya, xa = int(round(py * r)), int(round(px * r))
                yb = int(round((img_size - py) * r))
                xb = int(round((img_size - px) * r))
                crop = pm[:, ya:max(ya + 1, yb), xa:max(xa + 1, xb)]
                masks_out = np.stack([
                    (cv2.resize(cm, (w, h), interpolation=cv2.INTER_LINEAR) > 0.5)
                    .astype(np.uint8) for cm in crop])
            else:
                masks_out = np.zeros((0, h, w), np.uint8)
        t3 = time.perf_counter()

        return {
            "boxes": b, "scores": s, "classes": c, "masks": masks_out,
            "names": self.names,
            "speed": {"preprocess_ms": (t1 - t0) * 1e3,
                      "inference_ms": (t2 - t1) * 1e3,
                      "postprocess_ms": (t3 - t2) * 1e3,
                      "total_ms": (t3 - t0) * 1e3},
        }

    def infer_batch(self, frames_bgr, img_size: Optional[int] = None,
                    conf: float = 0.25, iou: float = 0.45, max_det: int = 300):
        """Batched inference over a list of BGR frames: ONE jitted call per
        power-of-2 batch bucket (static shapes), per-image back-mapping.
        Returns a list of result dicts like infer_image_profiled."""
        img_size = int(img_size or self.img_size)
        n = len(frames_bgr)
        if n == 0:
            return []
        t0 = time.perf_counter()
        canvases, geoms, sizes = [], [], []
        for f in frames_bgr:
            rgb = cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
            canvas, geom = self.preprocess(rgb, img_size)
            canvases.append(canvas)
            geoms.append(geom)
            sizes.append(f.shape[:2])
        bucket = 1
        while bucket < n:
            bucket *= 2
        batch = np.zeros((bucket, img_size, img_size, 3), np.uint8)
        batch[:n] = np.stack(canvases)
        t1 = time.perf_counter()

        out = jax.block_until_ready(
            self._run(img_size, conf, iou, max_det, batch))
        with_masks = len(out) == 5
        boxes, scores, classes, valid = (np.asarray(x) for x in out[:4])
        t2 = time.perf_counter()

        results = []
        per_pre = (t1 - t0) * 1e3 / n
        per_inf = (t2 - t1) * 1e3 / n
        for i in range(n):
            m = valid[i]
            (scale, px, py), (h, w) = geoms[i], sizes[i]
            b = unletterbox_boxes(boxes[i][m], scale, px, py, w, h)
            masks_out = None
            if with_masks:
                pm = np.asarray(out[4][i])[m]
                if len(pm):
                    hp = pm.shape[1]
                    r = hp / float(img_size)
                    ya, xa = int(round(py * r)), int(round(px * r))
                    yb = int(round((img_size - py) * r))
                    xb = int(round((img_size - px) * r))
                    crop = pm[:, ya:max(ya + 1, yb), xa:max(xa + 1, xb)]
                    masks_out = np.stack([
                        (cv2.resize(cm, (w, h)) > 0.5).astype(np.uint8)
                        for cm in crop])
                else:
                    masks_out = np.zeros((0, h, w), np.uint8)
            results.append({
                "boxes": b, "scores": scores[i][m], "classes": classes[i][m],
                "masks": masks_out, "names": self.names,
                "speed": {"preprocess_ms": per_pre, "inference_ms": per_inf,
                          "postprocess_ms": 0.0,
                          "total_ms": per_pre + per_inf},
            })
        return results

    def infer_stream(self, frames_bgr, img_size: Optional[int] = None,
                     conf: float = 0.25, iou: float = 0.45, max_det: int = 300,
                     depth: int = 2):
        """Streaming video inference: a generator over an iterable of BGR
        frames that keeps `depth` device calls in flight (ROADMAP "streaming
        video predictor").

        JAX dispatch is asynchronous — NOT calling block_until_ready after
        launch means frame i+1's host preprocess + H2D upload overlap frame
        i's device compute (software double-buffering; no extra buffers
        needed, the runtime owns the in-flight arrays). Results yield in
        order as frame-result dicts like infer_image_profiled (boxes in
        original pixels). Roughly hides min(host, device) time per frame;
        single-frame latency is unchanged."""
        from collections import deque
        img_size = int(img_size or self.img_size)
        inflight = deque()

        def finalize(item):
            out, (scale, px, py), (h, w), t_pre = item
            t0 = time.perf_counter()
            boxes, scores, classes, valid = (np.asarray(x) for x in out[:4])
            m = valid[0]
            b = unletterbox_boxes(boxes[0][m], scale, px, py, w, h)
            t1 = time.perf_counter()
            return {"boxes": b, "scores": scores[0][m],
                    "classes": classes[0][m], "names": self.names,
                    "speed": {"preprocess_ms": t_pre * 1e3,
                              "sync_ms": (t1 - t0) * 1e3}}

        for frame in frames_bgr:
            t0 = time.perf_counter()
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            canvas, (scale, px, py) = self.preprocess(rgb, img_size)
            t_pre = time.perf_counter() - t0
            out = self._run(img_size, conf, iou, max_det,
                            canvas[None])     # async launch — no block
            inflight.append((out, (scale, px, py), frame.shape[:2], t_pre))
            if len(inflight) > max(1, depth):
                yield finalize(inflight.popleft())
        while inflight:
            yield finalize(inflight.popleft())

    def infer_batched_stream(self, batches, img_size: Optional[int] = None,
                             conf: float = 0.25, iou: float = 0.45,
                             max_det: int = 300, depth: int = 2,
                             prepared: bool = False):
        """Sustained batched serving: a generator over an iterable of frame
        BATCHES that keeps `depth` batched device calls in flight (the
        batched analogue of infer_stream; ROADMAP "serving pipeline").

        Because JAX dispatch is asynchronous, not blocking after launch lets
        batch i+1's host letterbox + s2d pack + H2D upload overlap batch i's
        device compute, so steady-state throughput approaches the pure
        device dispatch rate instead of host+device in series.

        Each item of `batches` is a list of BGR frames (variable length;
        padded to a power-of-2 bucket), or — with prepared=True — an already
        letterboxed uint8 array [B, S, S, 3] from an upstream preprocessing
        tier, in which case back-mapping is skipped and device-space outputs
        are yielded directly. Yields one list of result dicts per input
        batch, in order.
        """
        from collections import deque
        img_size = int(img_size or self.img_size)
        inflight = deque()

        def finalize(item):
            out, geoms, sizes, n, t_pre = item
            boxes, scores, classes, valid = (np.asarray(x) for x in out[:4])
            results = []
            for i in range(n):
                m = valid[i]
                if geoms is None:
                    b = boxes[i][m]
                else:
                    (scale, px, py), (h, w) = geoms[i], sizes[i]
                    b = unletterbox_boxes(boxes[i][m], scale, px, py, w, h)
                results.append({"boxes": b, "scores": scores[i][m],
                                "classes": classes[i][m], "names": self.names,
                                "speed": {"preprocess_ms": t_pre * 1e3 / n}})
            return results

        for item in batches:
            t0 = time.perf_counter()
            if prepared:
                batch, geoms, sizes, n = np.asarray(item), None, None, len(item)
            else:
                canvases, geoms, sizes = [], [], []
                for f in item:
                    rgb = cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
                    canvas, geom = self.preprocess(rgb, img_size)
                    canvases.append(canvas)
                    geoms.append(geom)
                    sizes.append(f.shape[:2])
                n = len(item)
                bucket = 1
                while bucket < n:
                    bucket *= 2
                batch = np.zeros((bucket, img_size, img_size, 3), np.uint8)
                batch[:n] = np.stack(canvases)
            t_pre = time.perf_counter() - t0
            out = self._run(img_size, conf, iou, max_det, batch)  # async
            inflight.append((out, geoms, sizes, n, t_pre))
            if depth <= 0:  # fully synchronous (serial baseline for benches)
                jax.block_until_ready(out)
                yield finalize(inflight.popleft())
            elif len(inflight) > depth:
                yield finalize(inflight.popleft())
        while inflight:
            yield finalize(inflight.popleft())

    def warmup(self, img_size: Optional[int] = None, conf: float = 0.25,
               iou: float = 0.45, max_det: int = 300):
        img_size = int(img_size or self.img_size)
        jax.block_until_ready(
            self._run(img_size, conf, iou, max_det,
                      np.zeros((1, img_size, img_size, 3), np.uint8)))
