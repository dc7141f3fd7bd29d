"""Configuration system: 3-way YAML deep-merge + CLI overrides + run-dir allocation.

Capability parity with the reference config layer (`scripts/args/build_args.py`):
  - `load_configs(model, train, data)` deep-merges model+train+data YAMLs into one
    config dict (reference :130-241), infers `num_classes` from `nc`/`names`
    (:194-205), resolves dataset paths with `<yaml_dir>/<split>/{images,labels}`
    fallbacks and valid<->val aliasing (:85-128), allocates an auto-incrementing
    `runs/<n>` directory and updates a `latest` pointer (:6-44, :222-238).
  - `apply_overrides` gives the CLI the last word (:265-302) including the
    `--save_by` whitelist validation (:293-297).

This is a re-implementation, not a port: implemented with plain dicts + pathlib,
no torch/argparse coupling in the library layer.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

SAVE_BY_KEYS = ["AP50", "AP75", "AP", "AR", "APS", "APM", "APL"]


# --------------------------------------------------------------------------- #
# Small utilities
# --------------------------------------------------------------------------- #

def deep_merge(a: Dict[str, Any], b: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``b`` into ``a`` (b wins), returning ``a``."""
    for k, v in (b or {}).items():
        if isinstance(v, dict) and isinstance(a.get(k), dict):
            deep_merge(a[k], v)
        else:
            a[k] = v
    return a


def read_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def next_run_dir(base: str) -> str:
    """Create and return the next free numeric run dir under ``base``.

    e.g. base='runs' -> 'runs/1', 'runs/2', ... (mkdir is the atomicity guard).
    """
    root = Path(base)
    root.mkdir(parents=True, exist_ok=True)
    n = 1
    while True:
        cand = root / str(n)
        try:
            cand.mkdir(parents=False, exist_ok=False)
            return str(cand.resolve())
        except FileExistsError:
            n += 1


def update_latest_pointer(parent: str, target: str) -> None:
    """Maintain a 'latest' symlink (or latest.txt fallback) next to the run dirs."""
    parent_p = Path(parent)
    latest = parent_p / "latest"
    try:
        if latest.exists() or latest.is_symlink():
            latest.unlink()
        latest.symlink_to(Path(target), target_is_directory=True)
    except Exception:
        try:
            (parent_p / "latest.txt").write_text(str(Path(target)), encoding="utf-8")
        except Exception:
            pass


def _norm(p: Optional[str]) -> Optional[str]:
    return str(Path(p).expanduser().resolve()) if p else p


def _abs_from_yaml_dir(raw: str, data_yaml: str) -> str:
    if not raw:
        return ""
    yaml_dir = Path(data_yaml).expanduser().resolve().parent
    p = Path(str(raw).replace("\\", "/")).expanduser()
    return str(p.resolve() if p.is_absolute() else (yaml_dir / p).resolve())


def _fallback_split_dir(split: str, data_yaml: str, kind: str) -> Optional[str]:
    """Try <yaml_dir>/<split>/<kind>; 'val' also tries 'valid'."""
    base = Path(data_yaml).expanduser().resolve().parent
    candidates = []
    if split == "val":
        candidates += [base / "val" / kind, base / "valid" / kind]
    else:
        candidates += [base / split / kind]
    for c in candidates:
        if c.exists():
            return str(c.resolve())
    return None


def _ensure_or_fallback(img_path: str, split: str, data_yaml: str) -> str:
    if img_path and Path(img_path).exists():
        return img_path
    fb = _fallback_split_dir(split, data_yaml, "images")
    return fb if fb else img_path


def _labels_or_fallback(lbl_path: str, img_path: str, split: str, data_yaml: str) -> str:
    if lbl_path and Path(lbl_path).exists():
        return lbl_path
    fb = _fallback_split_dir(split, data_yaml, "labels")
    if fb:
        return fb
    if img_path:
        parts = Path(img_path).parts
        if parts and parts[-1].lower() == "images":
            return str(Path(*parts[:-1], "labels"))
        return str((Path(img_path).parent / "labels").resolve())
    return ""


def _ensure_dir_exists(p: str, tag: str) -> None:
    if p and not Path(p).exists():
        raise FileNotFoundError(f"{tag} path not found: {p}")


# --------------------------------------------------------------------------- #
# Public API
# --------------------------------------------------------------------------- #

def load_configs(
    model_yaml: Optional[str],
    train_yaml: Optional[str],
    data_yaml: Optional[str],
    make_run_dir: bool = True,
) -> Dict[str, Any]:
    """Merge model/train/data YAMLs into one config dict.

    Precedence (later wins): dataset block < model.yaml < train.yaml.
    Adds `config["dataset"]` with resolved image/label dirs + class names, infers
    `model.num_classes` from `nc`/`names`, defaults `training.img_size` to 640,
    and (optionally) allocates `config["logging"]["log_dir"] = <base>/<n>`.
    """
    model_yaml = _norm(model_yaml) if model_yaml else None
    train_yaml = _norm(train_yaml) if train_yaml else None
    data_yaml = _norm(data_yaml) if data_yaml else None

    model_cfg = read_yaml(model_yaml) if model_yaml else {}
    train_cfg = read_yaml(train_yaml) if train_yaml else {}
    data_cfg = read_yaml(data_yaml) if data_yaml else {}

    config: Dict[str, Any] = {}

    if data_yaml:
        train_img = _abs_from_yaml_dir(data_cfg.get("train", ""), data_yaml)
        val_img = _abs_from_yaml_dir(data_cfg.get("val", ""), data_yaml)
        test_img = _abs_from_yaml_dir(data_cfg.get("test", ""), data_yaml)

        train_img = _ensure_or_fallback(train_img, "train", data_yaml)
        val_img = _ensure_or_fallback(val_img, "val", data_yaml)
        test_img = _ensure_or_fallback(test_img, "test", data_yaml)

        labels_cfg = data_cfg.get("labels") if isinstance(data_cfg.get("labels"), dict) else {}
        train_lbl = _abs_from_yaml_dir(labels_cfg.get("train", ""), data_yaml) if labels_cfg.get("train") else ""
        val_lbl = _abs_from_yaml_dir(labels_cfg.get("val", ""), data_yaml) if labels_cfg.get("val") else ""
        test_lbl = _abs_from_yaml_dir(labels_cfg.get("test", ""), data_yaml) if labels_cfg.get("test") else ""

        # COCO-json ingestion: train_json/val_json/test_json point at COCO
        # instances files; they are converted (mtime-cached) to YOLO-txt dirs
        # and win over label-dir fallbacks (data/coco_ingest.py).
        coco_names = None
        for split, key in (("train", "train_json"), ("val", "val_json"),
                           ("test", "test_json")):
            jp = data_cfg.get(key)
            if not jp:
                continue
            from yololite_tpu.data.coco_ingest import coco_to_yolo_labels
            lbl_dir, coco_names = coco_to_yolo_labels(
                _abs_from_yaml_dir(jp, data_yaml))
            if split == "train":
                train_lbl = lbl_dir
            elif split == "val":
                val_lbl = lbl_dir
            else:
                test_lbl = lbl_dir
        if coco_names and not data_cfg.get("names"):
            data_cfg["names"] = coco_names

        train_lbl = _labels_or_fallback(train_lbl, train_img, "train", data_yaml)
        val_lbl = _labels_or_fallback(val_lbl, val_img, "val", data_yaml)
        test_lbl = _labels_or_fallback(test_lbl, test_img, "test", data_yaml)

        for tag, p in [("train_images", train_img), ("val_images", val_img),
                       ("train_labels", train_lbl), ("val_labels", val_lbl)]:
            _ensure_dir_exists(p, tag)
        if test_img:
            _ensure_dir_exists(test_img, "test_images")

        names = data_cfg.get("names")
        if names is not None and not isinstance(names, (list, tuple)):
            raise ValueError("data.yaml 'names' must be a list of class names.")
        nc = data_cfg.get("nc", len(names) if names else None)
        if nc is None:
            raise ValueError("Unable to infer 'nc'. Set 'nc' or provide 'names' in data.yaml.")

        config["dataset"] = {
            "train_images": train_img,
            "val_images": val_img,
            "train_labels": train_lbl,
            "val_labels": val_lbl,
            **({"test_images": test_img} if test_img else {}),
            **({"test_labels": test_lbl} if test_lbl else {}),
            "names": list(names) if names else [str(i) for i in range(int(nc))],
        }
        model_block = model_cfg.setdefault("model", {})
        if model_block.get("num_classes") is None:
            model_block["num_classes"] = int(nc)

    train_cfg.setdefault("training", {})
    if "img_size" not in train_cfg["training"]:
        ds_img = (model_cfg.get("dataset", {}) or {}).get("img_size") or \
                 (train_cfg.get("dataset", {}) or {}).get("img_size")
        train_cfg["training"]["img_size"] = int(ds_img) if ds_img else 640

    deep_merge(config, model_cfg)
    deep_merge(config, train_cfg)

    base_log_dir = (config.get("logging", {}) or {}).get("log_dir") or "runs"
    if make_run_dir:
        run_dir = next_run_dir(base_log_dir)
        config["logging"] = {"log_dir": run_dir}
        update_latest_pointer(parent=str(Path(run_dir).parent), target=run_dir)
    else:
        config.setdefault("logging", {})["log_dir"] = str(base_log_dir)

    return config


def save_merged_config(config: Dict[str, Any], run_dir: Optional[str] = None) -> str:
    """Persist the merged config for reproducibility (reference tools/train.py:118)."""
    run_dir = run_dir or config.get("logging", {}).get("log_dir", ".")
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, "merged_config.yaml")
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(config, f, sort_keys=False)
    return path


def build_argparser() -> argparse.ArgumentParser:
    """Training CLI argparser (parity with reference build_argparser :243-263)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", type=str, required=True, help="Path to model.yaml")
    ap.add_argument("--train", type=str, default=None, help="Path to train.yaml")
    ap.add_argument("--data", type=str, required=True, help="Path to data.yaml")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--device", type=str, default=None, help="tpu | cpu | tpu:<n>")
    ap.add_argument("--img_size", type=int, default=None)
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--augment", default=None, action=argparse.BooleanOptionalAction)
    ap.add_argument("--use_p6", default=None, action=argparse.BooleanOptionalAction)
    ap.add_argument("--use_p2", default=None, action=argparse.BooleanOptionalAction)
    ap.add_argument("--use_resize", default=None, action=argparse.BooleanOptionalAction,
                    help="Use plain resize instead of letterbox")
    ap.add_argument("--resume", type=str, default=None)
    ap.add_argument("--start_epoch", type=int, default=None,
                    help="With --resume on a save_optimizer checkpoint: "
                         "continue the LR schedule / aug taper / CSV from "
                         "this epoch instead of replaying from zero "
                         "(chunked long runs)")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--save_every", type=int, default=None)
    ap.add_argument("--save_by", type=str, default=None,
                    help=f"Checkpoint selection metric, one of {SAVE_BY_KEYS}")
    ap.add_argument("--anchors_per_level", type=int, default=None)
    ap.add_argument("--data_parallel", type=int, default=None,
                    help="Number of devices for data-parallel training (default: all)")
    ap.add_argument("--spatial_parallel", type=int, default=None,
                    help="Shard image height over this many devices per data "
                         "replica (activation sharding for 1280px+ P6 runs)")
    ap.add_argument("--pretrained_backbone", type=str, default=None,
                    help="Backbone checkpoint from tools/import_backbone.py or "
                         "tools/pretrain_backbone.py (reference: timm "
                         "pretrained=True, model_v2.py:84)")
    return ap


def apply_overrides(config: Dict[str, Any], args: argparse.Namespace) -> Dict[str, Any]:
    """CLI overrides win over YAML (parity with reference apply_overrides :265-302)."""
    tr = config.setdefault("training", {})
    if getattr(args, "epochs", None) is not None:
        tr["epochs"] = int(args.epochs)
    if getattr(args, "batch_size", None) is not None:
        tr["batch_size"] = int(args.batch_size)
    if getattr(args, "img_size", None) is not None:
        tr["img_size"] = int(args.img_size)
    if getattr(args, "workers", None) is not None:
        tr["num_workers"] = int(args.workers)
    if getattr(args, "device", None) is not None:
        tr["device"] = str(args.device)
    if getattr(args, "use_p6", None) is not None:
        tr["use_p6"] = bool(args.use_p6)
    if getattr(args, "use_p2", None) is not None:
        tr["use_p2"] = bool(args.use_p2)
    if getattr(args, "use_resize", None) is not None:
        tr["resize"] = bool(args.use_resize)
    if getattr(args, "augment", None) is not None:
        tr["augment"] = bool(args.augment)
    if getattr(args, "resume", None) is not None:
        tr["resume"] = str(args.resume)
    if getattr(args, "start_epoch", None) is not None:
        tr["start_epoch"] = int(args.start_epoch)
    if getattr(args, "pretrained_backbone", None) is not None:
        tr["pretrained_backbone"] = str(args.pretrained_backbone)
    if getattr(args, "spatial_parallel", None) is not None:
        tr["spatial_parallel"] = int(args.spatial_parallel)
    if getattr(args, "lr", None) is not None:
        tr["lr"] = float(args.lr)
    if getattr(args, "save_every", None) is not None:
        tr["save_every"] = int(args.save_every)
    if getattr(args, "save_by", None) is not None:
        if args.save_by in SAVE_BY_KEYS:
            tr["save_by"] = str(args.save_by)
        else:
            raise ValueError(f"Invalid --save_by {args.save_by!r}. Valid: {SAVE_BY_KEYS}")
    if getattr(args, "anchors_per_level", None) is not None:
        config.setdefault("model", {})["num_anchors_per_level"] = int(args.anchors_per_level)
    if getattr(args, "data_parallel", None) is not None:
        tr["data_parallel"] = int(args.data_parallel)
    return config
