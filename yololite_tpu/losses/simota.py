"""Vectorized SimOTA-hybrid anchor-free loss (static shapes, no per-image loop).

Math parity with the reference `LossAF` (scripts/loss/loss.py:190-437):
  (a) decode all preds to xyxy (v8 center, softplus wh; loss-side exp clamp
      (-10, 8) — loss.py:258-276);
  (b) candidate mask = center radius `r = clamp(cells*stride + 0.1*max(gt_wh),
      min=15px)` (:326-330) AND area-in-cells level gate (:333-337);
  (c) orphan rescue: GT with zero candidates force-matched to the nearest
      anchor (:339-346);
  (d) cost = 3*(1-IoU) + w_cls*clsCost + objCost + 0.5*centerNorm
      + 0.2*sizeCost + 0.1*arCost (:363-371);
  (e) SimOTA dynamic-k = int(sum of top-k IoUs) per GT, clamped >= 1 (:374-383);
  (f) anchor-conflict resolution by min cost (:385-392);
  losses: CIoU box, CE-with-smoothing cls, BCE obj with IoU-valued targets for
  positives + top-K hard-negative mining K = max(64, 3*npos) (:419-430);
  per-image means summed over the batch (NOT divided by B), and the reported
  "pos" = fraction of images with >= 1 positive (:406 quirk preserved).

TPU-first design: the reference loops over images in Python (loss.py:304 — its
training hot spot). Here the whole assignment is one vmapped static-shape
computation: GTs are padded to [B, M, ...] with a validity mask, dynamic-k is a
fixed top-k + rank mask, and the hard-negative top-K is a full sort + prefix
mask. Everything jits into the train step.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from yololite_tpu.ops.boxes import bbox_ciou, box_iou_matrix
from yololite_tpu.ops.decode import decode_flat, flatten_levels
from yololite_tpu.ops.anchors import make_anchors

BIG = 1e9


@dataclasses.dataclass(frozen=True)
class LossConfig:
    num_classes: int
    img_size: int
    lambda_box: float = 5.0
    lambda_obj: float = 1.0
    lambda_cls: float = 0.5
    assign_cls_weight: float = 0.5
    center_mode: str = "v8"
    wh_mode: str = "softplus"
    center_radius_cells: float = 2.0
    topk_limit: int = 20
    cls_smoothing: float = 0.05
    area_cells_min: float = 4.0
    area_cells_max: float = 256.0
    area_tol: float = 1.25
    size_prior_w: float = 0.20
    ar_prior_w: float = 0.10
    iou_cost_w: float = 3.0
    center_cost_w: float = 0.5
    # instance segmentation (V2 capability): YOLACT-style mask loss
    lambda_mask: float = 6.125
    max_pos_masks: int = 64   # static cap on positives with mask loss per image
    # use jax.lax.approx_max_k for the two [M,N] top-k reductions (TPU-native,
    # ~2x faster assignment; recall ~0.95 can rarely swap borderline candidates)
    approx_topk: bool = False

    @classmethod
    def from_config(cls, cfg: dict) -> "LossConfig":
        """Build from a merged config dict (loss block keys as in
        configs/train/standard_train.yaml)."""
        lo = cfg.get("loss", {}) or {}
        tr = cfg.get("training", {}) or {}
        m = cfg.get("model", {}) or {}
        return cls(
            num_classes=int(m.get("num_classes", 3)),
            img_size=int(tr.get("img_size", 640)),
            lambda_box=float(lo.get("lambda_box", 5.0)),
            lambda_obj=float(lo.get("lambda_obj", 1.0)),
            lambda_cls=float(lo.get("lambda_cls", 0.5)),
            assign_cls_weight=float(lo.get("assign_cls_weight", 0.5)),
            center_mode=str(lo.get("center_mode", "v8")),
            wh_mode=str(lo.get("wh_mode", "softplus")),
            center_radius_cells=float(lo.get("center_radius_cells",
                                             lo.get("center_radius", 2.0))),
            topk_limit=int(lo.get("topk_limit", 20)),
            cls_smoothing=float(lo.get("cls_smoothing", 0.05)),
            area_cells_min=float(lo.get("area_cells_min", 4.0)),
            area_cells_max=float(lo.get("area_cells_max", 256.0)),
            area_tol=float(lo.get("area_tol", 1.25)),
            size_prior_w=float(lo.get("size_prior_w", 0.20)),
            ar_prior_w=float(lo.get("ar_prior_w", 0.10)),
            iou_cost_w=float(lo.get("iou_cost_w", 3.0)),
            center_cost_w=float(lo.get("center_cost_w", 0.5)),
            lambda_mask=float(lo.get("lambda_mask", 6.125)),
            max_pos_masks=int(lo.get("max_pos_masks", 64)),
            approx_topk=bool(lo.get("approx_topk", False)),
        )


def _bce_logits(logits, targets):
    """Elementwise BCE-with-logits (stable)."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _ce_smoothed(logits, labels, num_classes, smoothing):
    """CrossEntropy with label smoothing (torch CrossEntropyLoss semantics)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    target = onehot * (1.0 - smoothing) + smoothing / num_classes
    return -jnp.sum(target * logp, axis=-1)


def _assign_single(
    cfg: LossConfig,
    pred_xyxy, pred_ctr, pred_wh, pred_obj, pred_cls,  # [N,4] [N,2] [N,2] [N] [N,C]
    gt_xyxy, gt_labels, gt_mask,                        # [M,4] [M] [M] bool
    strides,                                            # [N]
):
    """SimOTA assignment for one image. Returns (match [N,M] bool, iou [N,M])."""
    N = pred_xyxy.shape[0]
    M = gt_xyxy.shape[0]
    K = min(cfg.topk_limit, N)

    iou = box_iou_matrix(pred_xyxy, gt_xyxy)                       # [N,M]
    gt_ctr = (gt_xyxy[:, :2] + gt_xyxy[:, 2:]) * 0.5               # [M,2]
    gt_wh = jnp.maximum(gt_xyxy[:, 2:] - gt_xyxy[:, :2], 1.0)      # [M,2]

    dist_sq = jnp.sum((pred_ctr[:, None, :] - gt_ctr[None, :, :]) ** 2, -1)  # [N,M]
    s_col = strides[:, None]                                                 # [N,1]

    # (b) min-radius guard (loss.py:326-330)
    raw_r = cfg.center_radius_cells * s_col + 0.10 * jnp.max(gt_wh, axis=1)[None, :]
    r_pix = jnp.maximum(raw_r, 15.0)
    center_mask = dist_sq <= r_pix**2

    # level gating (loss.py:333-337) — note area_tol pre-applied to bounds
    gt_area = jnp.prod(gt_wh, axis=1)[None, :]                     # [1,M]
    area_cells = gt_area / (s_col**2)
    amin = cfg.area_cells_min / cfg.area_tol
    amax = cfg.area_cells_max * cfg.area_tol
    level_mask = (area_cells >= amin) & (area_cells <= amax)

    valid = center_mask & level_mask & gt_mask[None, :]

    # (c) orphan rescue (loss.py:339-346)
    orphan = (~jnp.any(valid, axis=0)) & gt_mask                   # [M]
    nearest = jnp.argmin(dist_sq, axis=0)                          # [M]
    rescue = jax.nn.one_hot(nearest, N, dtype=bool).T & orphan[None, :]
    valid = valid | rescue

    # (d) cost (loss.py:348-371)
    cls_prob = jax.nn.sigmoid(pred_cls)                            # [N,C]
    # gather of prob[n, label[m]] expressed as a one-hot matmul: a general
    # [N,M] gather lowers to scalar loads on TPU (~100x slower than this MXU dot)
    label_onehot = jax.nn.one_hot(gt_labels, cls_prob.shape[-1],
                                  dtype=cls_prob.dtype)            # [M,C]
    class_probs = jnp.dot(cls_prob, label_onehot.T,
                          preferred_element_type=jnp.float32)      # [N,M]
    cls_cost = 1.0 - class_probs
    obj_cost = -jax.nn.sigmoid(pred_obj)[:, None]

    p_area = jnp.maximum(jnp.prod(pred_wh, axis=1), 1e-9)[:, None]  # [N,1]
    dlog = jnp.abs(jnp.log(p_area) - jnp.log(jnp.maximum(gt_area, 1e-9)))
    size_cost = dlog / (1.0 + dlog)

    p_ar = jnp.log(jnp.maximum(pred_wh[:, 0] / jnp.maximum(pred_wh[:, 1], 1e-9), 1e-9))[:, None]
    g_ar = jnp.log(gt_wh[:, 0] / gt_wh[:, 1])[None, :]
    dar = jnp.abs(p_ar - g_ar)
    ar_cost = dar / (1.0 + dar)

    center_norm = dist_sq / (gt_wh[:, 0] ** 2 + gt_wh[:, 1] ** 2 + 1e-6)[None, :]

    cost = (cfg.iou_cost_w * (1.0 - iou)
            + cfg.assign_cls_weight * cls_cost
            + obj_cost
            + cfg.center_cost_w * center_norm
            + cfg.size_prior_w * size_cost
            + cfg.ar_prior_w * ar_cost)
    cost = jnp.where(valid, cost, BIG)

    # (e) dynamic-k via static top-k + rank mask (loss.py:374-383)
    topk_fn = jax.lax.approx_max_k if cfg.approx_topk else jax.lax.top_k
    iou_masked = jnp.where(valid, iou, 0.0)
    topk_ious = topk_fn(iou_masked.T, K)[0]                        # [M,K]
    dynamic_ks = jnp.clip(jnp.sum(topk_ious, axis=1).astype(jnp.int32), 1, K)  # [M]

    neg_cost_sorted, idx = topk_fn(-cost.T, K)                     # [M,K] anchor idx, best first
    rank_ok = jnp.arange(K)[None, :] < dynamic_ks[:, None]         # [M,K]
    # never select an invalid (cost BIG) anchor even when dynamic_k exceeds
    # the number of valid candidates
    rank_ok = rank_ok & (-neg_cost_sorted < BIG * 0.5)
    match_mt = jnp.zeros((M, N), dtype=bool).at[
        jnp.arange(M)[:, None], idx].max(rank_ok)                  # [M,N]
    match = match_mt.T & gt_mask[None, :]                          # [N,M]

    # (f) conflict resolution by min cost (loss.py:385-392)
    n_matched = jnp.sum(match, axis=1)                             # [N]
    best_gt = jnp.argmin(jnp.where(match, cost, BIG), axis=1)      # [N]
    exclusive = jax.nn.one_hot(best_gt, M, dtype=bool) & match
    match = jnp.where((n_matched > 1)[:, None], exclusive, match)

    return match, iou


def _loss_single(cfg: LossConfig, decoded, gt_xyxy, gt_labels, gt_mask, strides):
    """Per-image losses (box, cls, obj_pos+obj_neg, has_pos). All static shape."""
    pred_xyxy = decoded["box"]
    pred_obj = decoded["obj"]
    pred_cls = decoded["cls"]
    N = pred_xyxy.shape[0]

    # The assignment is discrete (indices/masks): gradients never flow through
    # it (the reference computes costs on grad-tensors but only consumes topk
    # INDICES, and detaches the IoU obj-targets). Detaching here lets XLA drop
    # the backward of every [N,M] assignment tensor — a large train-step win.
    sg = jax.lax.stop_gradient
    match, iou = _assign_single(cfg, sg(pred_xyxy), sg(decoded["ctr"]),
                                sg(decoded["wh"]), sg(pred_obj), sg(pred_cls),
                                gt_xyxy, gt_labels, gt_mask, strides)
    pos_mask = jnp.any(match, axis=1)                              # [N]
    matched_gt = jnp.argmax(match, axis=1)                         # [N]
    npos = jnp.sum(pos_mask)

    # --- box: CIoU over positives, per-image mean (loss.py:410-413)
    tgt_box = gt_xyxy[matched_gt]                                  # [N,4]
    ciou = bbox_ciou(pred_xyxy, tgt_box)
    loss_box = jnp.sum(jnp.where(pos_mask, 1.0 - ciou, 0.0)) / jnp.maximum(npos, 1)

    # --- cls: CE with smoothing over positives (loss.py:415-417)
    ce = _ce_smoothed(pred_cls, gt_labels[matched_gt], cfg.num_classes, cfg.cls_smoothing)
    loss_cls = jnp.sum(jnp.where(pos_mask, ce, 0.0)) / jnp.maximum(npos, 1)

    # --- obj: IoU-valued targets at positives + hard-negative top-K (loss.py:419-430)
    # iou[n, matched_gt[n]] as a masked sum: positives have exactly one match,
    # so sum(iou * match) == the row-gather (which is TPU-slow)
    iou_at_match = jax.lax.stop_gradient(
        jnp.clip(jnp.sum(jnp.where(match, iou, 0.0), axis=1), 0.0, 1.0))
    obj_t = jnp.where(pos_mask, iou_at_match, 0.0)
    bce = _bce_logits(pred_obj, obj_t)
    pos_obj = jnp.sum(jnp.where(pos_mask, bce, 0.0)) / jnp.maximum(npos, 1)

    neg_scores = jnp.where(pos_mask, -jnp.inf, bce)                # exclude positives
    neg_sorted = jnp.sort(neg_scores)[::-1]                        # desc
    n_neg = N - npos
    k_neg = jnp.clip(jnp.maximum(64, 3 * npos), 0, n_neg)
    take = jnp.arange(N) < k_neg
    neg_obj = jnp.sum(jnp.where(take, neg_sorted, 0.0)) / jnp.maximum(k_neg, 1)

    has_pos = (npos > 0).astype(jnp.float32)
    loss_obj = has_pos * pos_obj + neg_obj
    # when no positives: box/cls contribute 0 (matches reference early-continue)
    loss_box = has_pos * loss_box
    loss_cls = has_pos * loss_cls
    return loss_box, loss_obj, loss_cls, has_pos, npos, pos_mask, matched_gt


def _mask_loss_single(cfg: LossConfig, coef, protos, gt_xyxy, gt_masks,
                      pos_mask, matched_gt):
    """YOLACT-style mask loss for one image.

    coef [N,K] tanh coefficients, protos [Hp,Wp,K], gt_masks [M,Hp,Wp] in {0,1},
    pos_mask [N] bool, matched_gt [N] int. Static shapes: at most
    `max_pos_masks` positives contribute (top-k picks the first positives).
    BCE on assembled mask logits, cropped to the GT box and normalized by its
    area (the standard prototype-mask objective).
    """
    P = cfg.max_pos_masks
    N = coef.shape[0]
    hp, wp, _ = protos.shape
    img = float(cfg.img_size)

    vals, pick = jax.lax.top_k(pos_mask.astype(jnp.float32), min(P, N))
    sel_valid = vals > 0.0                                  # [P]
    gt_idx = matched_gt[pick]                               # [P]
    boxes = gt_xyxy[gt_idx]                                 # [P,4]
    target = gt_masks[gt_idx].astype(jnp.float32)           # [P,Hp,Wp]

    logits = jnp.einsum("hwk,pk->phw", protos.astype(jnp.float32),
                        coef[pick].astype(jnp.float32))     # [P,Hp,Wp]
    bce = _bce_logits(logits, target)

    # rectangular crop mask from the GT box, in prototype resolution
    ys = (jnp.arange(hp, dtype=jnp.float32) + 0.5) * (img / hp)
    xs = (jnp.arange(wp, dtype=jnp.float32) + 0.5) * (img / wp)
    in_x = (xs[None, None, :] >= boxes[:, 0, None, None]) & \
           (xs[None, None, :] <= boxes[:, 2, None, None])
    in_y = (ys[None, :, None] >= boxes[:, 1, None, None]) & \
           (ys[None, :, None] <= boxes[:, 3, None, None])
    crop = (in_x & in_y).astype(jnp.float32)                # [P,Hp,Wp]

    per_pos = jnp.sum(bce * crop, axis=(1, 2)) / jnp.maximum(
        jnp.sum(crop, axis=(1, 2)), 1.0)                    # [P]
    n_sel = jnp.sum(sel_valid)
    return jnp.sum(jnp.where(sel_valid, per_pos, 0.0)) / jnp.maximum(n_sel, 1)


class SimOTALoss:
    """Callable loss over raw per-level predictions + padded targets.

    targets: dict with
      boxes  [B, M, 4] xyxy pixels (padded rows arbitrary),
      labels [B, M] int32,
      mask   [B, M] bool (True for real GTs).
    """

    def __init__(self, cfg: LossConfig):
        self.cfg = cfg

    def __call__(self, preds_levels: Sequence[jnp.ndarray],
                 targets: Dict[str, jnp.ndarray], protos: jnp.ndarray = None,
                 img_size: int = None, img_valid: jnp.ndarray = None):
        """`img_size` overrides cfg.img_size (multi-scale training: one traced
        graph per size, the radius/area gates scale with the actual input).
        `img_valid` [B] bool zeroes the contribution of padding images in a
        padded final eval batch (their top-K hard-negative obj loss would
        otherwise skew the reported val loss)."""
        cfg = self.cfg
        if img_size is not None and int(img_size) != cfg.img_size:
            cfg = dataclasses.replace(cfg, img_size=int(img_size))
        flat, shapes = flatten_levels(preds_levels)
        flat = flat.astype(jnp.float32)
        pts, strides = make_anchors(shapes, cfg.img_size)
        decoded = decode_flat(flat, pts, strides, center_mode=cfg.center_mode,
                              wh_mode=cfg.wh_mode, exp_clamp=(-10.0, 8.0),
                              img_size=None, num_classes=cfg.num_classes)
        coef = decoded.pop("coef")

        gt_boxes = targets["boxes"].astype(jnp.float32)
        gt_labels = targets["labels"].astype(jnp.int32)
        gt_mask = targets["mask"].astype(bool)
        # keep padded rows numerically safe (w/h >= 1 via gt_wh clamp; labels in range)
        gt_labels = jnp.clip(gt_labels, 0, cfg.num_classes - 1)

        per_image = jax.vmap(partial(_loss_single, cfg),
                             in_axes=(
                                 {"box": 0, "obj": 0, "cls": 0, "ctr": 0, "wh": 0},
                                 0, 0, 0, None))
        lb, lo, lc, has_pos, npos, pos_mask, matched_gt = per_image(
            decoded, gt_boxes, gt_labels, gt_mask, strides)

        B = gt_boxes.shape[0]
        if img_valid is not None:
            w = img_valid.astype(lb.dtype)
            lb, lo, lc = lb * w, lo * w, lc * w
            has_pos = has_pos * w
        loss_box = cfg.lambda_box * jnp.sum(lb)
        loss_obj = cfg.lambda_obj * jnp.sum(lo)
        loss_cls = cfg.lambda_cls * jnp.sum(lc)
        total = loss_box + loss_obj + loss_cls
        metrics = {
            "box": loss_box,
            "obj": loss_obj,
            "cls": loss_cls,
            "pos": jnp.sum(has_pos) / max(B, 1),   # reference quirk: images w/ pos
            "npos": jnp.sum(npos),
        }
        if protos is not None and "masks" in targets:
            lm = jax.vmap(partial(_mask_loss_single, cfg))(
                coef, protos, gt_boxes,
                targets["masks"].astype(jnp.float32), pos_mask, matched_gt)
            # per-image mean, summed over batch, zeroed for empty images
            loss_mask = cfg.lambda_mask * jnp.sum(lm * has_pos)
            total = total + loss_mask
            metrics["mask"] = loss_mask
        return total, metrics
