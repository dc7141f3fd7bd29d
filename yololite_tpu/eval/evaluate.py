"""Full-dataset evaluation orchestrator.

Parity with reference `evaluate_model` (scripts/helpers/evaluate.py:396-605):
loop the val loader -> on-device decode+NMS -> COCO stats -> P/R/F1 confidence
sweep -> confusion matrix at best_conf -> forward-only latency bench -> summary
dashboard PNG. Artifacts land in `log_dir` like the reference (curves PNG/CSV,
confusion_matrix.png + stats txt, summary.png, eval_results.json).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from yololite_tpu.eval.coco import coco_eval_from_lists
from yololite_tpu.eval.confusion import create_confusion_matrix
from yololite_tpu.eval.prf1 import build_curves_from_coco


def dets_to_coco(det_batch: Dict[str, np.ndarray], first_img_id: int,
                 nvalid: int, add_one: bool = True,
                 mask_size: Optional[int] = None) -> List[dict]:
    """Fixed-shape NMS outputs -> COCO det dicts (xywh, 1-based category).

    Segmentation models attach an image-resolution instance mask per det:
    the proto-res probability map is upsampled to `mask_size` (bilinear),
    binarized at 0.5, and stored as COCO RLE ("segmentation"), matching the
    reference V2's full-resolution mask outputs (README.md:41). If
    `mask_size` is None the raw proto-res binary mask is kept under "mask"
    (legacy callers/tests)."""
    import cv2

    from yololite_tpu.ops.masks import rle_encode_np
    out = []
    boxes = np.asarray(det_batch["boxes"])
    scores = np.asarray(det_batch["scores"])
    classes = np.asarray(det_batch["classes"])
    valid = np.asarray(det_batch["valid"])
    masks = np.asarray(det_batch["masks"]) if "masks" in det_batch else None
    for b in range(min(len(boxes), nvalid)):
        m = valid[b]
        idxs = np.nonzero(m)[0]
        for i in idxs:
            x1, y1, x2, y2 = [float(v) for v in boxes[b][i]]
            d = {
                "image_id": int(first_img_id + b),
                "category_id": int(classes[b][i]) + (1 if add_one else 0),
                "bbox": [x1, y1, max(0.0, x2 - x1), max(0.0, y2 - y1)],
                "score": float(scores[b][i]),
            }
            if masks is not None:
                if mask_size is not None:
                    up = cv2.resize(masks[b][i].astype(np.float32),
                                    (int(mask_size), int(mask_size)),
                                    interpolation=cv2.INTER_LINEAR)
                    d["segmentation"] = rle_encode_np(up > 0.5)
                else:
                    d["mask"] = masks[b][i] > 0.5
            out.append(d)
    return out


def gts_to_coco(batch: Dict[str, np.ndarray], first_img_id: int, nvalid: int,
                img_size: int, ann_id_start: int):
    """Padded GT batch -> (coco images, coco anns, next_ann_id).

    Segmentation batches attach the GT instance mask per ann: the dataset's
    full-resolution RLE ("gt_rles", rasterized from the letterboxed polygons
    at image resolution) when available, else the proto-res binary "mask"
    (legacy callers/tests)."""
    from yololite_tpu.ops.masks import rle_area
    images, anns = [], []
    ann_id = ann_id_start
    boxes = np.asarray(batch["boxes"])
    labels = np.asarray(batch["labels"])
    mask = np.asarray(batch["mask"])
    if "masks" in batch:
        gt_masks = np.asarray(batch["masks"])
    elif "masks_packed" in batch:  # host-bitpacked along W (see dataset.py)
        mp = np.asarray(batch["masks_packed"])
        gt_masks = np.unpackbits(mp, axis=-1, count=mp.shape[-2])
    else:
        gt_masks = None
    gt_rles = batch.get("gt_rles")
    for b in range(min(len(boxes), nvalid)):
        img_id = int(first_img_id + b)
        images.append({"id": img_id, "file_name": f"val_{img_id}.jpg",
                       "width": int(img_size), "height": int(img_size)})
        idxs = np.nonzero(mask[b])[0]
        for i in idxs:
            x1, y1, x2, y2 = [float(v) for v in boxes[b][i]]
            w, h = max(0.0, x2 - x1), max(0.0, y2 - y1)
            a = {"id": ann_id, "image_id": img_id,
                 "category_id": int(labels[b][i]) + 1,
                 "bbox": [x1, y1, w, h], "area": float(w * h), "iscrowd": 0}
            if gt_rles is not None and i < len(gt_rles[b]):
                a["segmentation"] = gt_rles[b][i]
                a["area"] = float(rle_area(gt_rles[b][i]))
            elif gt_masks is not None:
                a["mask"] = gt_masks[b][i] > 0
            anns.append(a)
            ann_id += 1
    return images, anns, ann_id


def bench_forward_ms_per_img(trainer, variables, batch_size: int, img_size: int,
                             warmup: int = 3, iters: int = 10,
                             device=None) -> float:
    """Forward-only latency (reference _bench_forward_ms_per_img
    evaluate.py:254-303); jitted forward, block_until_ready for honest timing.
    `device`: bench on a specific device (e.g. the host CPU — the reference
    benches on GPU AND a cpu model copy, evaluate.py:497-516)."""
    import jax
    import jax.numpy as jnp
    x = jnp.zeros((batch_size, img_size, img_size, 3), jnp.uint8)
    if device is not None:  # committed inputs steer jit to this backend
        variables = jax.device_put(variables, device)
        x = jax.device_put(x, device)

    fwd = jax.jit(lambda v, x: trainer._eval_forward(v["params"], v["batch_stats"], x))
    for _ in range(warmup):
        jax.block_until_ready(fwd(variables, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fwd(variables, x))
    dt = (time.perf_counter() - t0) / iters
    return dt * 1000.0 / batch_size


def bench_forward_cpu_ms_per_img(trainer, variables, img_size: int) -> float:
    """Host-CPU forward latency leg (batch 1, few iters — the CPU copy is the
    deploy sanity number, not the headline). NaN if no distinct CPU backend."""
    import jax
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return float("nan")
    if cpu.platform == jax.devices()[0].platform:
        return float("nan")  # already benched on this backend
    return bench_forward_ms_per_img(trainer, variables, batch_size=1,
                                    img_size=img_size, warmup=1, iters=3,
                                    device=cpu)


def make_summary_image(stats: Dict[str, float], curves: Dict, ms_per_img: float,
                       out_path: str, title: str = "Evaluation summary",
                       ms_per_img_cpu: float = float("nan")):
    """PIL/matplotlib dashboard card (reference make_summary_image
    evaluate.py:349-394)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.axis("off")
        lines = [title, ""]
        for k in ("AP", "AP50", "AP75", "APS", "APM", "APL", "AR"):
            lines.append(f"{k:>6}: {stats.get(k, 0.0):.4f}")
        lines.append("")
        lines.append(f"best F1: {curves.get('best_f1', 0.0):.4f} "
                     f"@ conf {curves.get('best_conf', 0.0):.3f}")
        lines.append(f"P/R at best: {curves.get('precision_at_best', 0.0):.4f} / "
                     f"{curves.get('recall_at_best', 0.0):.4f}")
        lines.append("")
        lines.append(f"forward latency: {ms_per_img:.2f} ms/img "
                     f"({1000.0 / max(ms_per_img, 1e-9):.1f} img/s)")
        if np.isfinite(ms_per_img_cpu):
            lines.append(f"host-CPU forward: {ms_per_img_cpu:.2f} ms/img "
                         f"({1000.0 / max(ms_per_img_cpu, 1e-9):.1f} img/s)")
        ax.text(0.02, 0.98, "\n".join(lines), va="top", family="monospace",
                fontsize=12)
        fig.tight_layout()
        fig.savefig(out_path)
        plt.close(fig)
    except Exception:
        pass


def evaluate_model(trainer, variables, val_loader, log_dir: str, num_classes: int,
                   img_size: int, class_names: Optional[Sequence[str]] = None,
                   conf_th: float = 0.001, iou_th: float = 0.65,
                   max_det: int = 300, run_bench: bool = True) -> Dict[str, Any]:
    os.makedirs(log_dir, exist_ok=True)
    coco_images: List[dict] = []
    coco_anns: List[dict] = []
    coco_dets: List[dict] = []
    ann_id, img_id = 1, 1

    for batch in val_loader:
        nvalid = int(batch.get("nvalid", len(batch["image"])))
        device_batch = trainer.put_batch(batch)
        _, dets = trainer.eval_step(variables, device_batch, conf_th=conf_th,
                                    iou_th=iou_th, max_det=max_det)
        imgs, anns, ann_id = gts_to_coco(batch, img_id, nvalid, img_size, ann_id)
        coco_images += imgs
        coco_anns += anns
        coco_dets += dets_to_coco({k: np.asarray(v) for k, v in dets.items()},
                                  img_id, nvalid, mask_size=img_size)
        img_id += nvalid

    stats = coco_eval_from_lists(coco_images, coco_anns, coco_dets,
                                 num_classes=num_classes)
    # instance-segmentation mAP (mask IoU, full image resolution) when present
    segm_stats = None
    has = lambda items: any("segmentation" in x or "mask" in x for x in items)
    if has(coco_dets) and has(coco_anns):
        from yololite_tpu.eval.coco import COCOEvaluator
        segm_stats = COCOEvaluator(num_classes, iou_type="segm").evaluate(
            coco_images, coco_anns, coco_dets)
    curves = build_curves_from_coco(coco_images, coco_anns, coco_dets,
                                    out_dir=log_dir)
    create_confusion_matrix(coco_anns, coco_dets, num_classes,
                            conf=float(curves.get("best_conf", 0.25) or 0.25),
                            class_names=class_names, out_dir=log_dir)

    if run_bench:
        ms_per_img = bench_forward_ms_per_img(
            trainer, variables, batch_size=min(8, val_loader.batch_size),
            img_size=img_size)
        ms_per_img_cpu = bench_forward_cpu_ms_per_img(trainer, variables,
                                                      img_size)
    else:
        ms_per_img = ms_per_img_cpu = float("nan")

    make_summary_image(stats, curves, ms_per_img,
                       os.path.join(log_dir, "summary.png"),
                       ms_per_img_cpu=ms_per_img_cpu)
    # NaN is not valid JSON — emit null so strict parsers accept the file.
    _jsonable = lambda v: float(v) if np.isfinite(v) else None
    results = {
        "coco": stats,
        "best_f1": float(curves.get("best_f1", 0.0)),
        "best_conf": float(curves.get("best_conf", 0.0)),
        "ms_per_img": _jsonable(ms_per_img),
        "ms_per_img_cpu": _jsonable(ms_per_img_cpu),
    }
    if segm_stats is not None:
        results["coco_segm"] = segm_stats
    with open(os.path.join(log_dir, "eval_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results
