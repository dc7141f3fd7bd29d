"""Model export: serialized StableHLO artifacts (raw / decoded), ONNX optional.

Capability parity with the reference export layer (export/export_onnx.py:179-332,
export/export_torchscript.py:173-228):
  - "raw"     : graph emits the tuple of per-level maps [B,A,S,S,5+C]
  - "decoded" : graph emits {boxes_xyxy, obj_logits, cls_logits} — decode INSIDE
                the graph, NMS OUTSIDE (reference AFDecode export_onnx.py:111-175)
  - "nms"     : TPU-native extra — the full graph incl. class-aware NMS
The TPU-native artifact is a `jax.export` serialized StableHLO module
(portable across processes/versions) + a meta.json sidecar so deploy tools can
rebuild pre/post-processing. ONNX export is gated on onnx availability (not
present in this environment; the StableHLO artifact is the deploy format).
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
    def raw_fn(variables, images_u8):
        x = normalize_images(images_u8, model.dtype)
        return tuple(model.apply(variables, x, train=False))

    def decoded_fn(variables, images_u8):
        x = normalize_images(images_u8, model.dtype)
        outs = model.apply(variables, x, train=False)
        d = decode_anchorfree(outs, img_size)
        return {"boxes_xyxy": d["box"].astype(jnp.float32),
                "obj_logits": d["obj"].astype(jnp.float32),
                "cls_logits": d["cls"].astype(jnp.float32)}

    def nms_fn(variables, images_u8):
        x = normalize_images(images_u8, model.dtype)
        outs = model.apply(variables, x, train=False)
        d = decode_anchorfree(outs, img_size)
        scores, classes = yolo_scores(d["obj"][..., 0].astype(jnp.float32),
                                      d["cls"].astype(jnp.float32))
        b, s_, c_, v_, _ = batched_nms(d["box"].astype(jnp.float32), scores,
                                       classes, iou_th=iou, conf_th=conf,
                                       max_det=max_det, pre_nms_topk=512)
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
    """Load a serialized artifact; returns (callable(images_u8), meta dict)."""
    from jax import export as jax_export
    with open(art_path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta = {}
    if os.path.exists(art_path + ".json"):
        with open(art_path + ".json") as f:
            meta = json.load(f)
    return exported.call, meta


def export_onnx(weights: str, out_dir: Optional[str] = None, **kw) -> str:
    """ONNX export for CPU deploy parity — requires `onnx` (absent here)."""
    try:
        import onnx  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "onnx is not available in this environment; use the StableHLO "
            "artifact (export_model) for deployment, or install onnx + a "
            "jax->onnx converter for CPU parity export.") from e
    raise NotImplementedError("ONNX path requires a jax2onnx converter")
