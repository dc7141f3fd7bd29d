"""Empirical head-to-head: train the REFERENCE implementation vs this repo.

Completes the accuracy-parity story. tests/test_ref_parity.py proves the loss
and decode match numerically on fixed inputs; this tool proves the *training
dynamics* match by actually training the reference's own torch model + LossAF
(/root/reference/scripts/model/model_v2.py, scripts/loss/loss.py) on CPU and
emitting an AP50-vs-epoch metrics.csv directly comparable to a
`tools/train.py` run on the same dataset/config.

Held identical between the two runs (by construction):
  * data + augmentation: this repo's YoloDataset/DataLoader feeds BOTH runs
    (the reference's own pipeline needs Albumentations, absent here) — same
    presets, same letterbox, same seed;
  * architecture: the stub `timm` serves TimmStyleTwin — a torch re-expression
    of our flax backbone zoo verified feature-identical to ~1e-4
    (tests/test_torch_import.py) — so backbone/neck/head match our detector
    (param parity audited by tools/ref_param_audit.py);
  * hyperparameters: both read the same merged YAML (loss weights, LR +
    bb/neck/head multipliers, cosine schedule + the reference's warmup quirk
    of overriding every group to base_lr*(0.1+0.9w) (tools/train.py:306-308,
    :383-386), EMA ramp (tools/train.py:29-60), grad clip, aug taper at
    70%/90% (tools/train.py:326-331));
  * evaluation: reference decode (utils_ms.decode_preds_anchorfree) feeds the
    SAME score/NMS/COCO path our trainer uses (ops/nms.batched_nms on CPU +
    eval/coco), conf 0.1 / iou 0.65 / max_det 300.
Different (the thing under test): torch autograd/AdamW vs our jitted
JAX step, per-image-loop LossAF vs vectorized SimOTA, torch BN vs flax BN.

Usage:
  python tools/ref_train_compare.py --model configs/models/edge_n.yaml \
      --train <train.yaml> --data <data.yaml> --epochs 20 --img_size 320 \
      --batch_size 16 --out runs/ref_compare/torch
Then train ours with the same YAMLs via tools/train.py and compare
metrics.csv; tools/summarize_hardsynth.py renders the table.
"""

from __future__ import annotations

import argparse
import csv
import math
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def install_stub_timm_and_torchvision():
    """Serve our torch twin backbones under the `timm` API; stub torchvision
    (utils_ms imports its nms at module scope; we never call it)."""
    from yololite_tpu.models.backbones.torch_twin import TimmStyleTwin

    def create_model(name, features_only=True, pretrained=False,
                     out_indices=None, **kw):
        assert features_only
        return TimmStyleTwin(name, out_indices)

    timm = types.ModuleType("timm")
    timm.create_model = create_model
    sys.modules["timm"] = timm
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.nms = None
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops


class RefEMA:
    """The reference ModelEMA (tools/train.py:29-60): deepcopy + decay ramp
    d = decay*(1-exp(-t/warmup_limit)), warmup_limit = max(100, updates/5)."""

    def __init__(self, model, total_updates, decay=0.995):
        import copy

        import torch
        self.ema = copy.deepcopy(model).eval()
        self.updates = 0
        self.decay = decay
        self.warmup_limit = max(100, total_updates // 5)
        for p in self.ema.parameters():
            p.requires_grad_(False)
        self._torch = torch

    def update(self, model):
        torch = self._torch
        self.updates += 1
        d = self.decay * (1 - math.exp(-self.updates / self.warmup_limit))
        with torch.no_grad():
            msd = model.state_dict()
            for k, v in self.ema.state_dict().items():
                if v.dtype.is_floating_point:
                    v.mul_(d).add_(msd[k].detach(), alpha=1 - d)
                else:
                    v.copy_(msd[k])


def batch_to_torch(batch):
    """uint8 letterboxed batch -> normalized NCHW tensor + per-image targets
    (the reference's yolo_collate format: list of {boxes,labels})."""
    import torch
    imgs = batch["image"].astype(np.float32) / 255.0
    imgs = (imgs - IMAGENET_MEAN) / IMAGENET_STD
    t_imgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2).copy())
    targets = []
    for b in range(len(imgs)):
        m = batch["mask"][b]
        targets.append({
            "boxes": torch.from_numpy(batch["boxes"][b][m].copy()),
            "labels": torch.from_numpy(batch["labels"][b][m].astype(np.int64)),
        })
    return t_imgs, targets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--train", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--img_size", type=int, default=None)
    ap.add_argument("--out", default="runs/ref_compare/torch")
    ap.add_argument("--torch_threads", type=int, default=0,
                    help="torch intra-op threads (0 = torch default)")
    args = ap.parse_args()

    # JAX only runs the (CPU) NMS postproc here; never touch the TPU tunnel.
    import jax
    jax.config.update("jax_platforms", "cpu")

    import torch
    if args.torch_threads:
        torch.set_num_threads(args.torch_threads)

    from yololite_tpu.config.config import load_configs
    from yololite_tpu.data import DataLoader, YoloDataset
    from yololite_tpu.eval.coco import coco_eval_from_lists
    from yololite_tpu.eval.evaluate import dets_to_coco, gts_to_coco

    config = load_configs(args.model, args.train, args.data, make_run_dir=False)
    tr = config["training"]
    if args.epochs:
        tr["epochs"] = args.epochs
    if args.batch_size:
        tr["batch_size"] = args.batch_size
    if args.img_size:
        tr["img_size"] = args.img_size

    install_stub_timm_and_torchvision()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from scripts.helpers.utils_ms import decode_preds_anchorfree
    from scripts.loss.loss import LossAF
    from scripts.model.model_v2 import YOLOLiteMS, YOLOLiteMS_CPU

    torch.manual_seed(int(tr.get("seed", 1337)))
    np.random.seed(int(tr.get("seed", 1337)))

    num_classes = int(config["model"]["num_classes"])
    img_size = int(tr["img_size"])
    epochs = int(tr["epochs"])
    batch_size = int(tr["batch_size"])

    # ---- data: OUR pipeline for both sides (host-identical inputs) ----
    train_ds = YoloDataset(config["dataset"]["train_images"],
                           config["dataset"]["train_labels"],
                           img_size=img_size, is_train=True,
                           augment=bool(tr.get("augment", True)),
                           max_boxes=int(tr.get("max_boxes", 100)),
                           task="detect",
                           aug_preset=str(tr.get("aug_preset", "base")))
    val_ds = YoloDataset(config["dataset"]["val_images"],
                         config["dataset"]["val_labels"],
                         img_size=img_size, is_train=False, augment=False,
                         max_boxes=int(tr.get("max_boxes", 100)))
    seed = int(tr.get("seed", 1337))
    train_loader = DataLoader(train_ds, batch_size, shuffle=True,
                              drop_last=True, seed=seed)
    val_loader = DataLoader(val_ds, batch_size, shuffle=False, drop_last=False)

    # ---- reference model / loss / optimizer (tools/train.py:160-323) ----
    mc = config["model"]
    cls_ = YOLOLiteMS_CPU if mc["arch"].lower() == "yololitems_cpu" else YOLOLiteMS
    model = cls_(backbone=mc["backbone"], num_classes=num_classes,
                 fpn_channels=mc["fpn_channels"],
                 num_anchors_per_level=(1, 1, 1),
                 depth_multiple=mc.get("depth_multiple", 1.0),
                 width_multiple=mc.get("width_multiple", 1.0),
                 head_depth=mc.get("head_depth", 1),
                 pretrained=False, use_p6=False, use_p2=False)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"[ref] {mc['arch']} {mc['backbone']}: {n_params/1e6:.3f}M params")

    lo = config.get("loss", {})
    criterion = LossAF(
        num_classes=num_classes, img_size=img_size,
        lambda_box=lo.get("lambda_box", 5.0), lambda_obj=lo.get("lambda_obj", 1.0),
        lambda_cls=lo.get("lambda_cls", 1.0),
        cls_smoothing=lo.get("cls_smoothing", 0.05),
        assign_cls_weight=lo.get("assign_cls_weight", 0.5),
        center_radius_cells=lo.get("center_radius_cells", 2.0),
        topk_limit=lo.get("topk_limit", 20),
        area_cells_min=lo.get("area_cells_min", 4),
        area_cells_max=lo.get("area_cells_max", 256),
        area_tol=lo.get("area_tol", 1.25),
        size_prior_w=lo.get("size_prior_w", 0.2),
        ar_prior_w=lo.get("ar_prior_w", 0.1),
        iou_cost_w=lo.get("iou_cost_w", 3.0),
        center_cost_w=lo.get("center_cost_w", 0.5))

    base_lr = float(tr["lr"])
    wd = float(tr.get("weight_decay", 1e-4))
    bb_params = list(model.backbone.parameters())
    head_params = []
    for hn in ("head", "head3", "head4", "head5"):
        if hasattr(model, hn):
            head_params += list(getattr(model, hn).parameters())
    got = {id(p) for p in bb_params + head_params}
    neck_params = [p for p in model.parameters() if id(p) not in got]
    optimizer = torch.optim.AdamW([
        {"params": bb_params, "lr": base_lr * float(tr.get("bb_lr_mult", 1.0)),
         "weight_decay": wd},
        {"params": neck_params, "lr": base_lr * float(tr.get("neck_lr_mult", 1.0)),
         "weight_decay": wd},
        {"params": head_params, "lr": base_lr * float(tr.get("head_lr_mult", 1.0)),
         "weight_decay": wd},
    ])
    # cosine is the shipped recipe; fall back to constant LR otherwise
    sched_name = tr.get("scheduler", "cosine")
    if isinstance(sched_name, dict):
        sched_name = sched_name.get("type", "cosine")
    scheduler = (torch.optim.lr_scheduler.CosineAnnealingLR(optimizer, T_max=epochs)
                 if str(sched_name).lower() == "cosine" else None)
    warmup_epochs = int(tr.get("warmup_epochs", 0))
    grad_clip = float(tr.get("grad_clip", 0.0))
    steps_per_epoch = max(1, len(train_ds) // batch_size)
    ema = RefEMA(model, total_updates=steps_per_epoch * epochs,
                 decay=float(tr.get("ema_decay", 0.995))) \
        if tr.get("ema", True) else None

    center_mode = str(lo.get("center_mode", "v8"))
    wh_mode = str(lo.get("wh_mode", "softplus"))

    from yololite_tpu.ops.nms import batched_nms, yolo_scores
    import jax.numpy as jnp

    os.makedirs(args.out, exist_ok=True)
    csv_path = os.path.join(args.out, "metrics.csv")
    with open(csv_path, "w", newline="") as f:
        csv.writer(f).writerow(
            ["epoch", "AP", "AP50", "AP75", "APS", "APM", "APL", "AR",
             "train_loss", "val_loss", "lr_g0", "lr_g1", "lr_g2",
             "elapsed_s", "timestamp"])

    use_augment = bool(tr.get("augment", True))
    if warmup_epochs > 0:
        for pg in optimizer.param_groups:
            pg["lr"] = base_lr * 0.1

    for epoch in range(epochs):
        # aug taper identical to both implementations (train.py:326-331)
        if epoch == int(epochs * 0.7) and use_augment:
            train_ds.set_mosaic_cutmix(0.0, 0.0)
        if epoch > int(epochs * 0.9) and use_augment:
            train_ds.set_augment(False)
            use_augment = False

        model.train()
        t0 = time.time()
        running, nb = 0.0, 0
        for batch in train_loader:
            imgs, targets = batch_to_torch(batch)
            optimizer.zero_grad(set_to_none=True)
            preds = model(imgs)
            loss, ldict = criterion(preds, targets)
            loss.backward()
            if grad_clip > 0:
                torch.nn.utils.clip_grad_norm_(model.parameters(), grad_clip)
            optimizer.step()
            if ema:
                ema.update(model)
            B = imgs.shape[0]
            running += (float(ldict["box"]) + float(ldict["obj"]) +
                        float(ldict["cls"])) / B
            nb += 1
        avg_train = running / max(1, nb)

        # the reference's warmup quirk: every group pinned to the same scaled
        # base LR during warmup; cosine only steps after (train.py:381-388)
        if warmup_epochs > 0 and epoch < warmup_epochs:
            w = (epoch + 1) / warmup_epochs
            for pg in optimizer.param_groups:
                pg["lr"] = base_lr * (0.1 + 0.9 * w)
        elif scheduler is not None:
            scheduler.step()

        # ---- val: EMA fwd -> ref decode -> our NMS/COCO (conf .1 iou .65) ----
        eval_model = ema.ema if ema else model
        eval_model.eval()
        coco_images, coco_anns, coco_dets = [], [], []
        ann_id, img_id = 1, 1
        v_running, vb = 0.0, 0
        with torch.no_grad():
            for batch in val_loader:
                nvalid = int(batch.get("nvalid", len(batch["image"])))
                imgs, targets = batch_to_torch(batch)
                preds = eval_model(imgs)
                vloss, _ = criterion(preds, targets)
                v_running += float(vloss) / max(1, nvalid)
                vb += 1
                d = decode_preds_anchorfree(preds, img_size,
                                            center_mode=center_mode,
                                            wh_mode=wh_mode)
                scores, classes = yolo_scores(
                    jnp.asarray(d["obj"].numpy()[..., 0]),
                    jnp.asarray(d["cls"].numpy()))
                boxes, s, c, v, _ = batched_nms(
                    jnp.asarray(d["box"].numpy()), scores, classes,
                    iou_th=0.65, conf_th=0.1, max_det=300)
                imgs_c, anns_c, ann_id = gts_to_coco(batch, img_id, nvalid,
                                                     img_size, ann_id)
                coco_images += imgs_c
                coco_anns += anns_c
                coco_dets += dets_to_coco(
                    {"boxes": np.asarray(boxes), "scores": np.asarray(s),
                     "classes": np.asarray(c), "valid": np.asarray(v)},
                    img_id, nvalid)
                img_id += nvalid
        stats = coco_eval_from_lists(coco_images, coco_anns, coco_dets,
                                     num_classes=num_classes)
        avg_val = v_running / max(1, vb)
        lrs = [pg["lr"] for pg in optimizer.param_groups]
        elapsed = time.time() - t0
        with open(csv_path, "a", newline="") as f:
            csv.writer(f).writerow(
                [epoch + 1, stats["AP"], stats["AP50"], stats["AP75"],
                 stats["APS"], stats["APM"], stats["APL"], stats["AR"],
                 avg_train, avg_val, lrs[0], lrs[1], lrs[2],
                 elapsed, time.strftime("%Y-%m-%dT%H:%M:%S")])
        print(f"[ref] epoch {epoch+1}/{epochs} train {avg_train:.4f} "
              f"val {avg_val:.4f} AP50 {stats['AP50']:.4f} "
              f"AP {stats['AP']:.4f} ({elapsed:.0f}s)", flush=True)

    if ema:
        torch.save({"state_dict": ema.ema.state_dict()},
                   os.path.join(args.out, "ref_ema_final.pt"))
    print(f"[ref] done -> {csv_path}")


if __name__ == "__main__":
    main()
