"""Model export: serialized StableHLO artifacts (raw / decoded), ONNX optional.

Capability parity with the reference export layer (export/export_onnx.py:179-332,
export/export_torchscript.py:173-228):
  - "raw"     : graph emits the tuple of per-level maps [B,A,S,S,5+C]
  - "decoded" : graph emits {boxes_xyxy, obj_logits, cls_logits} — decode INSIDE
                the graph, NMS OUTSIDE (reference AFDecode export_onnx.py:111-175)
  - "nms"     : TPU-native extra — the full graph incl. class-aware NMS
The TPU-native artifact is a `jax.export` serialized StableHLO module
(portable across processes/versions) + a meta.json sidecar so deploy tools can
rebuild pre/post-processing. CPU-portable artifacts: TFLite (`export_tflite`)
and first-party ONNX (`export_onnx` — jaxpr compiled straight to an opset-17
graph, no onnx/tf2onnx dependency; runnable via onnxruntime or the in-repo
numpy executor `deploy/onnx_run.py`).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp

from yololite_tpu.ops.decode import decode_anchorfree
from yololite_tpu.ops.nms import batched_nms, yolo_scores
from yololite_tpu.train.checkpoint import load_checkpoint, model_from_meta
from yololite_tpu.train.steps import normalize_images


def _build_fn(model, img_size: int, fmt: str, conf: float, iou: float,
              max_det: int):
    with_masks = bool(getattr(model, "with_masks", False))

    def _forward(variables, images_u8):
        x = normalize_images(images_u8, model.dtype)
        out = model.apply(variables, x, train=False)
        return out if with_masks else (out, None)

    def raw_fn(variables, images_u8):
        outs, protos = _forward(variables, images_u8)
        return tuple(outs) + ((protos,) if with_masks else ())

    def decoded_fn(variables, images_u8):
        """Reference `decoded` format (export_onnx.py:283-309); segmentation
        models additionally emit the YOLACT pieces (per-anchor mask
        coefficients + prototypes) so the host assembles masks as
        sigmoid(protos @ coef) cropped to the box — see infer_exported.py."""
        outs, protos = _forward(variables, images_u8)
        d = decode_anchorfree(outs, img_size,
                              num_classes=model.num_classes
                              if with_masks else None)
        out = {"boxes_xyxy": d["box"].astype(jnp.float32),
               "obj_logits": d["obj"].astype(jnp.float32),
               "cls_logits": d["cls"].astype(jnp.float32)}
        if with_masks:
            out["mask_coef"] = d["coef"].astype(jnp.float32)
            out["protos"] = protos.astype(jnp.float32)
        return out

    def nms_fn(variables, images_u8):
        outs, protos = _forward(variables, images_u8)
        d = decode_anchorfree(outs, img_size,
                              num_classes=model.num_classes
                              if with_masks else None)
        scores, classes = yolo_scores(d["obj"][..., 0].astype(jnp.float32),
                                      d["cls"].astype(jnp.float32))
        b, s_, c_, v_, idx = batched_nms(d["box"].astype(jnp.float32), scores,
                                         classes, iou_th=iou, conf_th=conf,
                                         max_det=max_det, pre_nms_topk=512)
        if with_masks:
            from yololite_tpu.ops.masks import assemble_masks_batch
            coef = jnp.take_along_axis(d["coef"].astype(jnp.float32),
                                       idx[..., None], axis=1)
            masks = assemble_masks_batch(protos.astype(jnp.float32), coef, b,
                                         float(img_size))
            return b, s_, c_, v_, masks
        return b, s_, c_, v_

    return {"raw": raw_fn, "decoded": decoded_fn, "nms": nms_fn}[fmt]


def export_model(weights: str, out_dir: Optional[str] = None,
                 fmt: str = "decoded", batch: int = 1,
                 img_size: Optional[int] = None, conf: float = 0.001,
                 iou: float = 0.65, max_det: int = 300,
                 dtype=jnp.bfloat16) -> str:
    """Export a checkpoint. Returns the artifact path (<stem>_<fmt>.stablehlo)."""
    from jax import export as jax_export

    sd, meta = load_checkpoint(weights)
    model = model_from_meta(meta, dtype=dtype)
    img_size = int(img_size or meta.get("img_size", 640))
    variables = {"params": jax.tree.map(jnp.asarray, sd["params"]),
                 "batch_stats": jax.tree.map(jnp.asarray, sd["batch_stats"])}

    fn = _build_fn(model, img_size, fmt, conf, iou, max_det)
    # close over weights so the artifact is self-contained
    closed = jax.jit(lambda images: fn(variables, images))
    images_spec = jax.ShapeDtypeStruct((batch, img_size, img_size, 3), jnp.uint8)

    # dummy run sanity check (reference export_onnx.py:220-225)
    _ = jax.eval_shape(closed, images_spec)

    exported = jax_export.export(closed)(images_spec)
    blob = exported.serialize()

    out_dir = out_dir or os.path.dirname(os.path.abspath(weights))
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(weights))[0]
    art_path = os.path.join(out_dir, f"{stem}_{fmt}.stablehlo")
    with open(art_path, "wb") as f:
        f.write(blob)
    with open(art_path + ".json", "w") as f:
        json.dump({"format": fmt, "img_size": img_size, "batch": batch,
                   "conf": conf, "iou": iou, "max_det": max_det,
                   "names": meta.get("names"),
                   "num_classes": meta.get("num_classes"),
                   "letterbox": True, "normalize": "imagenet/on-device",
                   "source_ckpt": os.path.abspath(weights)}, f, indent=2)
    return art_path


def load_exported(art_path: str):
    """Load a serialized artifact; returns (callable(images_u8), meta dict).
    Dispatches on extension: .tflite -> host-CPU TFLite, .onnx -> first-party
    ONNX executor (or onnxruntime), else StableHLO."""
    if art_path.endswith(".tflite"):
        return load_tflite(art_path)
    if art_path.endswith(".onnx"):
        return load_onnx_artifact(art_path)
    from jax import export as jax_export
    with open(art_path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta = {}
    if os.path.exists(art_path + ".json"):
        with open(art_path + ".json") as f:
            meta = json.load(f)
    return exported.call, meta


# --------------------------------------------------------------------------- #
# CPU-portable export: TFLite / TF SavedModel via jax2tf.
#
# This is the TPU-native answer to the reference's ONNX-on-CPU deploy story
# (export/export_onnx.py:179-332, tools/infer_onnx.py:143-233): the jitted
# forward(+decode[+NMS]) graph is lowered through jax2tf into a TensorFlow
# graph and compiled to a TFLite flatbuffer — a fully self-contained artifact
# that runs on any host CPU (XNNPACK) with zero JAX/TPU dependency, covering
# the same raw/decoded/nms duality. ONNX emission lives in deploy/onnx_emit.py.
# --------------------------------------------------------------------------- #

def _tf_module_for(fn, variables, batch: int, img_size: int, out_names):
    """Wrap a jax fn as a tf.Module with a named serving signature."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = jax2tf.convert(lambda images: fn(variables, images),
                           native_serialization=False)

    class Wrapper(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec((batch, img_size, img_size, 3), tf.uint8,
                          name="images")])
        def serve(self, images):
            out = tf_fn(images)
            if isinstance(out, dict):  # keys survive jax2tf; don't re-zip —
                return {k: tf.identity(v, name=k) for k, v in out.items()}
            return {n: tf.identity(t, name=n)     # jax pytrees sort dict keys
                    for n, t in zip(out_names, list(out))}

    return Wrapper()


_OUT_NAMES = {
    "raw": None,  # filled per-model: level_0..level_{L-1}
    "decoded": ["boxes_xyxy", "obj_logits", "cls_logits"],
    "nms": ["boxes", "scores", "classes", "valid"],
}


def export_tflite(weights: str, out_dir: Optional[str] = None,
                  fmt: str = "decoded", batch: int = 1,
                  img_size: Optional[int] = None, conf: float = 0.001,
                  iou: float = 0.65, max_det: int = 300,
                  quantize: Optional[str] = None,
                  keep_saved_model: bool = False) -> str:
    """Export a checkpoint to a TFLite flatbuffer (CPU deploy artifact).

    quantize: None | "dynamic" (dynamic-range int8 weights) | "fp16".
    Returns the .tflite path; a meta.json sidecar sits next to it.
    """
    import tempfile

    import tensorflow as tf

    sd, meta = load_checkpoint(weights)
    model = model_from_meta(meta, dtype=jnp.float32)  # fp32 graph for CPU
    img_size = int(img_size or meta.get("img_size", 640))
    variables = {"params": jax.tree.map(jnp.asarray, sd["params"]),
                 "batch_stats": jax.tree.map(jnp.asarray, sd["batch_stats"])}

    fn = _build_fn(model, img_size, fmt, conf, iou, max_det)
    with_masks = bool(getattr(model, "with_masks", False))
    if fmt == "raw":
        n_outs = len(jax.eval_shape(
            lambda v, im: fn(v, im), variables,
            jax.ShapeDtypeStruct((batch, img_size, img_size, 3), jnp.uint8)))
        n_levels = n_outs - (1 if with_masks else 0)
        out_names = [f"level_{i}" for i in range(n_levels)]
        if with_masks:
            out_names.append("protos")
    else:
        out_names = list(_OUT_NAMES[fmt])
        if with_masks and fmt == "nms":
            out_names.append("masks")

    module = _tf_module_for(fn, variables, batch, img_size, out_names)

    out_dir = out_dir or os.path.dirname(os.path.abspath(weights))
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(weights))[0]

    sm_dir = (os.path.join(out_dir, f"{stem}_{fmt}_savedmodel")
              if keep_saved_model else tempfile.mkdtemp(prefix="ylt_sm_"))
    tf.saved_model.save(module, sm_dir,
                        signatures={"serving_default": module.serve})

    converter = tf.lite.TFLiteConverter.from_saved_model(sm_dir)
    converter.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS,
                                           tf.lite.OpsSet.SELECT_TF_OPS]
    if quantize == "dynamic":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    elif quantize == "fp16":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    blob = converter.convert()

    art_path = os.path.join(out_dir, f"{stem}_{fmt}.tflite")
    with open(art_path, "wb") as f:
        f.write(blob)
    with open(art_path + ".json", "w") as f:
        json.dump({"format": fmt, "img_size": img_size, "batch": batch,
                   "conf": conf, "iou": iou, "max_det": max_det,
                   "names": meta.get("names"),
                   "num_classes": meta.get("num_classes"),
                   "outputs": out_names, "quantize": quantize,
                   "letterbox": True, "normalize": "imagenet/in-graph",
                   "runtime": "tflite",
                   "source_ckpt": os.path.abspath(weights)}, f, indent=2)
    if not keep_saved_model:
        import shutil
        shutil.rmtree(sm_dir, ignore_errors=True)
    return art_path


def load_tflite(art_path: str):
    """Load a .tflite artifact; returns (callable(images_u8) -> tuple, meta).

    The callable returns outputs in the meta["outputs"] order, matching the
    StableHLO artifact's output layout for each format.
    """
    import numpy as np
    import tensorflow as tf

    meta = {}
    if os.path.exists(art_path + ".json"):
        with open(art_path + ".json") as f:
            meta = json.load(f)
    interp = tf.lite.Interpreter(model_path=art_path, num_threads=os.cpu_count())
    runner = interp.get_signature_runner("serving_default")
    out_names = meta.get("outputs") or sorted(
        runner.get_output_details().keys())

    as_dict = meta.get("format") == "decoded"  # match StableHLO pytree layout

    def call(images_u8):
        out = runner(images=np.asarray(images_u8, np.uint8))
        if as_dict:
            return {n: out[n] for n in out_names}
        return tuple(out[n] for n in out_names)

    return call, meta


def export_onnx(weights: str, out_dir: Optional[str] = None,
                fmt: str = "decoded", batch: int = 1,
                img_size: Optional[int] = None, conf: float = 0.001,
                iou: float = 0.65, max_det: int = 300,
                dynamic_batch: bool = False) -> str:
    """ONNX export (reference export/export_onnx.py:179-332 parity).

    First-party route: the jitted deploy function's jaxpr is compiled directly
    to an opset-17 ONNX graph (`deploy/onnx_emit.py`) and serialized with the
    in-repo protobuf codec (`deploy/onnx_proto.py`) — no onnx/tf2onnx
    dependency. Matching the reference, ONNX covers the "raw" and "decoded"
    formats with NMS on the host (tools/infer_onnx.py:143-233); the in-graph
    "nms" format remains StableHLO/TFLite-only. Run the artifact with
    onnxruntime, or anywhere with `deploy/onnx_run.py` (numpy executor).

    dynamic_batch=True declares the batch axis symbolic (reference
    export_onnx.py:303-309 `dynamic_axes` parity): one artifact serves any
    batch size. The graph is traced at max(batch, 2) — a symbolic batch
    can't be inferred from a batch-1 trace.
    """
    if fmt == "nms":
        raise ValueError(
            "ONNX export covers fmt='raw'/'decoded' with host-side NMS "
            "(reference export_onnx.py parity); use export_tflite/"
            "export_model for the in-graph-NMS artifact.")
    from yololite_tpu.deploy.onnx_emit import export_fn_to_onnx

    sd, meta = load_checkpoint(weights)
    model = model_from_meta(meta, dtype=jnp.float32)  # fp32 graph for CPU
    img_size = int(img_size or meta.get("img_size", 640))
    variables = {"params": jax.tree.map(jnp.asarray, sd["params"]),
                 "batch_stats": jax.tree.map(jnp.asarray, sd["batch_stats"])}

    fn = _build_fn(model, img_size, fmt, conf, iou, max_det)
    # dynamic batch needs a trace batch that collides with no static dim in
    # the graph (a non-leading dim equal to the traced batch is ambiguous);
    # the emitter raises on collision and we retry with the next prime.
    trace_batches = ([max(int(batch), 2), 3, 5, 7, 11, 13]
                     if dynamic_batch else [int(batch)])
    images_spec = jax.ShapeDtypeStruct((trace_batches[0], img_size,
                                        img_size, 3), jnp.uint8)
    with_masks = bool(getattr(model, "with_masks", False))
    if fmt == "raw":
        n_outs = len(jax.eval_shape(lambda im: fn(variables, im),
                                    images_spec))
        n_levels = n_outs - (1 if with_masks else 0)
        out_names = [f"level_{i}" for i in range(n_levels)]
        if with_masks:
            out_names.append("protos")
    else:  # decoded: dict outputs flatten in sorted-key order (jax pytree)
        keys = list(_OUT_NAMES["decoded"])
        if with_masks:
            keys += ["mask_coef", "protos"]
        out_names = sorted(keys)

    out_dir = out_dir or os.path.dirname(os.path.abspath(weights))
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(weights))[0]
    onnx_path = os.path.join(out_dir, f"{stem}_{fmt}.onnx")
    for i, tb in enumerate(trace_batches):
        spec = jax.ShapeDtypeStruct((tb, img_size, img_size, 3), jnp.uint8)
        try:
            export_fn_to_onnx(lambda im: fn(variables, im), (spec,), onnx_path,
                              input_names=["images"], output_names=out_names,
                              model_name=f"{meta.get('model_name', stem)}_{fmt}",
                              doc=f"YoloLite-TPU {fmt} deploy graph "
                                  f"@{img_size}px",
                              dynamic_batch=dynamic_batch)
            break
        except NotImplementedError as e:
            if (not dynamic_batch or "batch-sized dim" not in str(e)
                    or i == len(trace_batches) - 1):
                raise
    with open(onnx_path + ".json", "w") as f:
        json.dump({"format": fmt, "img_size": img_size,
                   "batch": "dynamic" if dynamic_batch else batch,
                   "conf": conf, "iou": iou, "max_det": max_det,
                   "names": meta.get("names"),
                   "num_classes": meta.get("num_classes"),
                   "outputs": out_names, "letterbox": True,
                   "normalize": "imagenet/in-graph", "runtime": "onnx",
                   "source_ckpt": os.path.abspath(weights)}, f, indent=2)
    return onnx_path


def load_onnx_artifact(art_path: str):
    """Load a .onnx artifact; returns (callable(images_u8) -> outputs, meta).

    Output layout matches the other artifact kinds: "decoded" returns the
    {boxes_xyxy, cls_logits, obj_logits} dict, "raw" a tuple of level maps.
    """
    from yololite_tpu.deploy.onnx_run import load_onnx

    meta = {}
    if os.path.exists(art_path + ".json"):
        with open(art_path + ".json") as f:
            meta = json.load(f)
    graph = load_onnx(art_path)
    out_names = meta.get("outputs") or graph.output_names
    as_dict = meta.get("format") == "decoded"

    def call(images_u8):
        import numpy as np
        outs = graph(np.asarray(images_u8, np.uint8))
        if as_dict:
            return dict(zip(out_names, outs))
        return tuple(outs)

    return call, meta
