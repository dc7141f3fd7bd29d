"""Public library API: the `YoloLite` class.

Surface parity with the reference V2 pip API (README.md:20-42, consumed by
benchmark.py:73-107):

    model = YoloLite("edge_n")                     # model name / yaml / ckpt
    model.train(data="data.yaml", epochs=20, batch=8, accumulate=4,
                warmup=3, freeze_backbone=5)
    model = YoloLite("runs/det/1/weights/best_model_state.ckpt")
    results = model.predict(source="image.jpg")[0]
    results["boxes"]   # xyxy np.ndarray (original pixels)
    results["masks"]   # np.ndarray | None
    results["speed"]   # {"preprocess_ms", "inference_ms", ..., "total_ms"}
    stats = model.val(data="data.yaml", split="test")   # {"map", "map_50", ...}
    path = model.export(format="decoded")
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _resolve_model_arg(model: str) -> Dict[str, Any]:
    """Resolve a model argument to {'ckpt': path} or {'model_yaml': path}."""
    if model.endswith((".ckpt", ".pt", ".msgpack")) and os.path.exists(model):
        return {"ckpt": model}
    if model.endswith((".yaml", ".yml")) and os.path.exists(model):
        return {"model_yaml": model}
    # bare model name -> configs/models/<name>.yaml (then v2_models, custom)
    name = model.replace(".yaml", "")
    for sub in ("models", "v2_models", "custom"):
        cand = os.path.join(_REPO_ROOT, "configs", sub, f"{name}.yaml")
        if os.path.exists(cand):
            return {"model_yaml": cand}
    raise FileNotFoundError(
        f"Cannot resolve model {model!r}: not a checkpoint, yaml, or known "
        f"model name under configs/.")


class YoloLite:
    def __init__(self, model: str = "edge_n", task: str = "detect"):
        self.task = task
        self._src = _resolve_model_arg(str(model))
        self._predictor = None

    # ------------------------------------------------------------------ #
    @property
    def predictor(self):
        if self._predictor is None:
            if "ckpt" not in self._src:
                raise RuntimeError("predict()/val()/export() need a trained "
                                   "checkpoint; train first or pass a .ckpt path.")
            from yololite_tpu.deploy.predictor import Predictor
            self._predictor = Predictor(self._src["ckpt"])
        return self._predictor

    # ------------------------------------------------------------------ #
    def train(self, data: str, epochs: int = 100, batch_size: Optional[int] = None,
              batch: Optional[int] = None, img_size: Optional[int] = None,
              workers: int = 4, accumulate: int = 1, warmup: int = 0,
              freeze_backbone: int = 0, lr: Optional[float] = None,
              train_yaml: Optional[str] = None, run_dir: str = "runs/det",
              **overrides) -> Dict[str, Any]:
        from yololite_tpu.config import load_configs
        from yololite_tpu.train.loop import train_from_config

        model_yaml = self._src.get("model_yaml")
        if model_yaml is None:
            # fine-tune from checkpoint: rebuild config from meta
            from yololite_tpu.train.checkpoint import load_checkpoint
            _, meta = load_checkpoint(self._src["ckpt"])
            base_cfg = meta.get("config", {})
        else:
            base_cfg = None

        train_yaml = train_yaml or os.path.join(_REPO_ROOT, "configs", "train",
                                                "standard_train.yaml")
        if not os.path.exists(train_yaml):
            train_yaml = None
        cfg = load_configs(model_yaml, train_yaml, data, make_run_dir=False)
        if base_cfg:
            model_block = dict(base_cfg.get("model", {}))
            model_block.update(cfg.get("model", {}))
            cfg["model"] = model_block
            cfg["training"].setdefault("resume", self._src["ckpt"])

        tr = cfg.setdefault("training", {})
        tr["epochs"] = int(epochs)
        if batch_size or batch:
            tr["batch_size"] = int(batch_size or batch)
        tr.setdefault("batch_size", 16)
        if img_size:
            tr["img_size"] = int(img_size)
        tr["num_workers"] = int(workers)
        tr["accumulate"] = int(accumulate)
        if warmup:
            tr["warmup_epochs"] = int(warmup)
        if freeze_backbone:
            tr["freeze_backbone_epochs"] = int(freeze_backbone)
        if lr is not None:
            tr["lr"] = float(lr)
        tr.update(overrides)

        from yololite_tpu.config.config import next_run_dir, update_latest_pointer
        rd = next_run_dir(run_dir)
        cfg["logging"] = {"log_dir": rd}
        update_latest_pointer(os.path.dirname(rd), rd)

        results = train_from_config(cfg)
        best = os.path.join(rd, "weights", "best_model_state.ckpt")
        if not os.path.exists(best):
            best = os.path.join(rd, "weights", "best_no_aug.ckpt")
        if not os.path.exists(best):
            best = os.path.join(rd, "weights", "last_model_state.ckpt")
        if os.path.exists(best):
            self._src = {"ckpt": best}
            self._predictor = None
        return results

    # ------------------------------------------------------------------ #
    def predict(self, source: Union[str, np.ndarray, Sequence], conf: float = 0.25,
                iou: float = 0.45, max_det: int = 300,
                img_size: Optional[int] = None, device: Optional[str] = None,
                batch: bool = True, draw: bool = False,
                save_dir: Optional[str] = None,
                **_ignored) -> List[Dict[str, Any]]:
        import cv2
        pred = self.predictor
        items = self._expand_source(source)

        frames, names = [], []
        for item in items:
            if isinstance(item, str):
                img_bgr = cv2.imread(item)
                if img_bgr is None:
                    raise FileNotFoundError(item)
                frames.append(img_bgr)
                names.append(item)
            else:
                frames.append(np.asarray(item))
                names.append(None)

        # multi-image sources run as ONE batched TPU call (bucketed shapes)
        if batch and len(frames) > 1:
            batched = pred.infer_batch(frames, img_size, conf, iou, max_det)
        else:
            batched = None

        results = []
        for i, (img_bgr, name) in enumerate(zip(frames, names)):
            if batched is not None:
                r = batched[i]
            else:
                r = pred.infer_image_profiled(img_bgr, img_size, conf, iou, max_det)
            r["source"] = name
            if draw or save_dir:
                from yololite_tpu.utils.viz import draw_detections
                vis_rgb = draw_detections(cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB),
                                          r["boxes"], r["scores"], r["classes"],
                                          pred.names)
                r["plot"] = vis_rgb
                if save_dir:
                    os.makedirs(save_dir, exist_ok=True)
                    base = os.path.basename(name) if name else f"pred_{len(results)}.jpg"
                    cv2.imwrite(os.path.join(save_dir, base),
                                cv2.cvtColor(vis_rgb, cv2.COLOR_RGB2BGR))
            results.append(r)
        return results

    @staticmethod
    def _expand_source(source):
        if isinstance(source, (list, tuple)):
            return list(source)
        if isinstance(source, np.ndarray):
            return [source]
        if isinstance(source, str) and os.path.isdir(source):
            exts = ("*.jpg", "*.jpeg", "*.png", "*.bmp")
            files = []
            for e in exts:
                files += glob.glob(os.path.join(source, e))
            return sorted(files)
        return [source]

    # ------------------------------------------------------------------ #
    def val(self, data: str, split: str = "val", batch_size: int = 8,
            conf: float = 0.001, iou: float = 0.65,
            img_size: Optional[int] = None) -> Dict[str, Any]:
        from yololite_tpu.config import load_configs
        from yololite_tpu.data.dataset import YoloDataset
        from yololite_tpu.data.loader import DataLoader
        from yololite_tpu.eval.evaluate import evaluate_model
        from yololite_tpu.train.steps import Trainer

        pred = self.predictor
        meta = pred.meta
        cfg = load_configs(None, None, data, make_run_dir=False)
        ds_cfg = cfg["dataset"]
        key = "test" if split == "test" and ds_cfg.get("test_images") else "val"
        img_dir = ds_cfg.get(f"{key}_images")
        lbl_dir = ds_cfg.get(f"{key}_labels")
        img_size = int(img_size or meta.get("img_size", 640))
        num_classes = int(meta.get("num_classes", len(ds_cfg.get("names", [])) or 1))

        ds = YoloDataset(img_dir, lbl_dir, img_size=img_size, is_train=False,
                         augment=False)
        loader = DataLoader(ds, batch_size, shuffle=False, drop_last=False)
        t_cfg = dict(meta.get("config") or {})
        t_cfg.setdefault("model", {})["num_classes"] = num_classes
        t_cfg.setdefault("training", {})["img_size"] = img_size
        trainer = Trainer(pred.model, t_cfg)
        out_dir = os.path.join("runs", "val")
        os.makedirs(out_dir, exist_ok=True)
        results = evaluate_model(trainer, pred.eval_variables, loader, out_dir,
                                 num_classes, img_size, ds_cfg.get("names"),
                                 conf_th=conf, iou_th=iou)
        stats = results["coco"]
        return {"map": stats["AP"], "map_50": stats["AP50"],
                "map_75": stats["AP75"], **stats,
                "best_f1": results["best_f1"], "best_conf": results["best_conf"],
                "ms_per_img": results["ms_per_img"]}

    # ------------------------------------------------------------------ #
    def export(self, format: str = "decoded", batch: int = 1,
               img_size: Optional[int] = None, simplify: bool = True,
               verbose: bool = False, **kw) -> str:
        from yololite_tpu.deploy.export import export_model
        fmt = {"onnx": "decoded"}.get(format, format)
        path = export_model(self._src["ckpt"], fmt=fmt, batch=batch,
                            img_size=img_size, **kw)
        if verbose:
            print(f"exported -> {path}")
        return path
