"""Self-describing checkpoints (msgpack single file, torch-free).

Format parity with the reference (tools/train.py:62-75): one file holding
  {"state_dict": {params, batch_stats[, ema..., opt_state]}, "meta": {...}}
where meta = {metric_key, metric_value, names, num_classes, img_size, arch,
backbone, num_anchors_per_level, config} — every downstream tool rebuilds the
architecture from `meta` (reference build_model_from_meta tools/infer.py:34-77).

Files: weights/best_model_state.ckpt, last_model_state.ckpt, best_no_aug.ckpt,
epoch_{n}.ckpt (train.py:316-320, :558-565). Resume = load weights + fresh EMA
(optimizer/scheduler state intentionally NOT restored — train.py:293-297).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, batch_stats, meta: Dict[str, Any],
                    extra_state: Optional[Dict[str, Any]] = None) -> str:
    state = {"params": _to_numpy(params), "batch_stats": _to_numpy(batch_stats)}
    if extra_state:
        state.update({k: _to_numpy(v) for k, v in extra_state.items()})
    payload = {"state_dict": state, "meta_json": json.dumps(meta, default=str)}
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic (reference _write_json_atomic helpers.py:229-233)
    return path


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (state_dict, meta). Accepts both the single-file msgpack format
    and orbax checkpoint directories (see save_checkpoint_orbax)."""
    if os.path.isdir(path):
        return load_checkpoint_orbax(path)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = json.loads(payload["meta_json"])
    return payload["state_dict"], meta


# --------------------------------------------------------------------------- #
# Optional orbax backend (SURVEY.md §7: "orbax + the same self-describing meta
# dict"). The default single-file msgpack format stays primary because it is
# dependency-free and trivially portable; orbax adds async/sharded multi-host
# checkpointing for large DP runs.
# --------------------------------------------------------------------------- #

def save_checkpoint_orbax(path: str, params, batch_stats,
                          meta: Dict[str, Any]) -> str:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    state = {"params": _to_numpy(params), "batch_stats": _to_numpy(batch_stats)}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, default=str)
    return path


_ASYNC_CKPTR = None


def save_checkpoint_orbax_async(path: str, params, batch_stats,
                                meta: Dict[str, Any]) -> str:
    """Non-blocking orbax save (training continues while the previous epoch's
    checkpoint streams to disk; ROADMAP "async orbax for large DP runs").
    A singleton AsyncCheckpointer serializes successive saves — call
    wait_for_checkpoints() before reading the newest one back."""
    global _ASYNC_CKPTR
    import orbax.checkpoint as ocp
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    path = os.path.abspath(path)
    state = {"params": _to_numpy(params), "batch_stats": _to_numpy(batch_stats)}
    _ASYNC_CKPTR.save(path, args=ocp.args.StandardSave(state), force=True)
    # meta goes to a SIBLING file: orbax materializes `path` itself via an
    # atomic tmp-dir rename, so nothing may pre-create the final dir.
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f, default=str)
    return path


def wait_for_checkpoints() -> None:
    """Block until all async checkpoint writes have landed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint_orbax(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path)
    meta = {}
    for meta_path in (os.path.join(path, "meta.json"), path + ".meta.json"):
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            break
    return state, meta


def build_meta(config: Dict[str, Any], metrics: Dict[str, float], metric_key: str,
               class_names, num_anchors_per_level) -> Dict[str, Any]:
    return {
        "metric_key": metric_key,
        "metric_value": float(metrics.get(metric_key, -1.0)),
        "names": list(class_names) if class_names else None,
        "num_classes": int(config["model"]["num_classes"]),
        "img_size": int(config["training"].get("img_size", 640)),
        "arch": config["model"].get("arch", "YOLOLiteMS"),
        "backbone": config["model"].get("backbone", "resnet18"),
        "num_anchors_per_level": list(num_anchors_per_level),
        "config": config,
        "framework": "yololite_tpu",
    }


def model_from_meta(meta: Dict[str, Any], dtype=None):
    """Rebuild the detector from checkpoint meta (parity tools/infer.py:34-77)."""
    import jax.numpy as jnp
    from yololite_tpu.models.detector import build_model_from_config
    cfg = dict(meta.get("config") or {})
    cfg.setdefault("model", {})
    cfg["model"].setdefault("arch", meta.get("arch", "YOLOLiteMS"))
    cfg["model"].setdefault("backbone", meta.get("backbone", "resnet18"))
    cfg["model"].setdefault("num_classes", meta.get("num_classes", 3))
    cfg.setdefault("training", {})
    cfg["training"].setdefault("img_size", meta.get("img_size", 640))
    return build_model_from_config(cfg, dtype=dtype or jnp.float32)
