"""Jit-compiled train / eval / predict steps (single graph each, donated state).

This replaces the reference's per-batch Python orchestration
(tools/train.py:344-375): forward + loss + backward + AdamW + EMA fuse into ONE
XLA program; normalization runs on-device so the host ships uint8; with a mesh,
the batch is sharded over "data" and XLA all-reduces grads over ICI.

The eval step runs forward -> decode -> score -> class-aware NMS entirely
on-device (the reference round-trips through torchvision NMS on host,
helpers.py:87-153) and additionally returns the val loss metrics.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from yololite_tpu.data.device_augment import photometric_augment
from yololite_tpu.losses import LossConfig, SimOTALoss
from yololite_tpu.models.detector import YOLOLiteMS, init_model
from yololite_tpu.ops.decode import decode_anchorfree
from yololite_tpu.ops.nms import batched_nms, yolo_scores
from yololite_tpu.parallel.mesh import replicate_tree, shard_batch
from yololite_tpu.train.ema import ema_update, ema_warmup_limit
from yololite_tpu.train.optim import (apply_updates_grouped, build_optimizer,
                                      group_index_tree)

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def gt_masks_from_batch(batch: Dict[str, jnp.ndarray]):
    """Device-side GT-mask view [B,M,Hp,Wp] or None.

    Seg batches ship masks host-bitpacked along W ([B,M,Hp,ceil(Wp/8)],
    1 bit/pixel — 8x less H2D per step); unpacking runs inside the jitted
    step where it is bandwidth-free next to the conv work. Hand-built raw
    "masks" batches (tests, external callers) pass through unchanged.
    """
    if "masks_packed" in batch:
        mp = batch["masks_packed"]
        return jnp.unpackbits(mp, axis=-1, count=mp.shape[-2])
    return batch.get("masks")


def normalize_images(images_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(dtype)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    updates: jnp.ndarray        # int32 optimizer-step counter
    grad_accum: Any = None      # grad accumulation buffer (accumulate > 1)
    micro: jnp.ndarray = None   # int32 micro-step counter


class Trainer:
    """Owns the model, loss, optimizer and the compiled step functions."""

    def __init__(self, model: YOLOLiteMS, config: Dict[str, Any],
                 total_updates: int = 10000, mesh=None):
        self.model = model
        self.config = config
        tr = config.get("training", {})
        self.img_size = int(tr.get("img_size", 640))
        self.loss = SimOTALoss(LossConfig.from_config(config))
        self.tx, self.hyper = build_optimizer(config)
        self.use_ema = bool(tr.get("ema", True))
        self.ema_decay = float(tr.get("ema_decay", 0.995) or 0.995)
        self.ema_warmup = ema_warmup_limit(total_updates)
        self.accumulate = max(1, int(tr.get("accumulate", 1) or 1))
        self.mesh = mesh
        self._groups = None
        # device-side photometric augmentation (data/device_augment.py):
        # only active when the host pipeline is told to skip its photometric
        # stage (training.device_augment: true) AND augmentation is on at all.
        self.device_augment = bool(tr.get("device_augment", False)) and \
            bool(tr.get("augment", True))
        # quantization-aware training (ops/quant.py): fake-quant every conv
        # in the train AND eval forward so validation reflects int8 accuracy
        self.qat = bool(tr.get("qat", False))
        self._aug_key = jax.random.PRNGKey(int(tr.get("seed", 1337) or 0) + 7)

        # shardings are carried by the (committed) inputs: state is replicated
        # via replicate_tree, batches sharded via put_batch — jit propagates them.
        self.train_step = jax.jit(self._train_step, donate_argnums=(0,))
        self.eval_step = jax.jit(self._eval_step,
                                 static_argnames=("conf_th", "iou_th", "max_det"))
        self.predict_step = jax.jit(self._predict_step,
                                    static_argnames=("conf_th", "iou_th", "max_det"))

    # ------------------------------------------------------------------ #
    def _make_state(self, params, batch_stats) -> TrainState:
        params = jax.tree.map(jnp.asarray, params)
        batch_stats = jax.tree.map(jnp.asarray, batch_stats)
        opt_state = self.tx.init(params)
        self._groups = group_index_tree(params)
        accum = (jax.tree.map(jnp.zeros_like, params)
                 if self.accumulate > 1 else None)
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state,
                           ema_params=jax.tree.map(jnp.copy, params),
                           ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
                           updates=jnp.zeros((), jnp.int32),
                           grad_accum=accum,
                           micro=jnp.zeros((), jnp.int32))
        return replicate_tree(state, self.mesh)

    def init_state(self, seed: int = 0, batch: int = 1) -> TrainState:
        params, batch_stats = init_model(self.model, self.img_size, seed, batch)
        return self._make_state(params, batch_stats)

    def state_from_weights(self, params, batch_stats) -> TrainState:
        """Resume: load weights, fresh EMA/optimizer (train.py:293-297 parity)."""
        return self._make_state(params, batch_stats)

    def state_from_full(self, state_dict) -> TrainState:
        """Exact resume from a checkpoint saved with save_optimizer=True:
        restores the RAW training weights (saved as raw_params/raw_batch_stats
        — the checkpoint's top-level "params" are the deployed EMA copy), the
        EMA copies, the Adam moments and the update counter; falls back to
        fresh state for missing pieces."""
        raw_p = state_dict.get("raw_params", state_dict["params"])
        raw_bs = state_dict.get("raw_batch_stats", state_dict["batch_stats"])
        st = self._make_state(raw_p, raw_bs)
        ema_p = state_dict.get("ema_params")
        ema_bs = state_dict.get("ema_batch_stats")
        updates = state_dict.get("updates")
        repl = {}
        if ema_p is not None:
            repl["ema_params"] = jax.tree.map(jnp.asarray, ema_p)
        if ema_bs is not None:
            repl["ema_batch_stats"] = jax.tree.map(jnp.asarray, ema_bs)
        if updates is not None:
            repl["updates"] = jnp.asarray(np.asarray(updates), jnp.int32)
            repl["micro"] = jnp.asarray(np.asarray(
                state_dict.get("micro", updates)), jnp.int32)
        opt = state_dict.get("opt_state")
        if opt is not None:
            try:
                from flax import serialization
                repl["opt_state"] = serialization.from_state_dict(
                    st.opt_state, opt)
            except Exception:
                pass  # optimizer layout changed; keep fresh opt state
        if repl:
            st = st.replace(**repl)
        return replicate_tree(st, self.mesh)

    def lr_vector(self, lr: float, freeze_backbone: bool = False) -> jnp.ndarray:
        """Absolute per-group LRs [backbone, neck, head] for this step."""
        bb = 0.0 if freeze_backbone else lr * self.hyper["bb_mult"]
        return jnp.asarray([bb, lr * self.hyper["neck_mult"],
                            lr * self.hyper["head_mult"]], jnp.float32)

    def put_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        return shard_batch(self._keep_keys(batch), self.mesh)

    @staticmethod
    def _keep_keys(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        keys = ["image", "boxes", "labels", "mask"]
        for mk in ("masks", "masks_packed"):  # seg GT masks [B,M,Hp,Wp]
            if mk in batch:                   # (packed: [B,M,Hp,Wp/8])
                keys.append(mk)
        keep = {k: batch[k] for k in keys}
        if "image_id" in batch:  # padding images (id -1) are masked out of
            keep["img_valid"] = np.asarray(batch["image_id"]) >= 0  # val loss
        return keep

    def put_eval_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        """Validation placement. Multi-host pods bypass the mesh: every
        process evaluates the FULL val set, so pushing each host's identical
        batch through shard_batch would assemble a global array of n_proc
        duplicated copies whose batch-sharded outputs span non-addressable
        devices (np.asarray on the detections would raise). Locally-placed
        batches keep eval per-host and addressable; single-host runs keep
        the mesh (batch sharded over 'data' as before)."""
        from yololite_tpu.parallel.mesh import is_multiprocess
        if is_multiprocess(self.mesh):
            return {k: jax.device_put(np.asarray(v))
                    for k, v in self._keep_keys(batch).items()}
        return self.put_batch(batch)

    def local_eval_variables(self, variables):
        """Companion to put_eval_batch: pull mesh-replicated variables onto
        the process-local default device (a replicated jax.Array's shard 0
        is the full value) so the local eval jit doesn't mix global-mesh and
        local-device operands. No-op on single-host runs."""
        from yololite_tpu.parallel.mesh import is_multiprocess
        if not is_multiprocess(self.mesh):
            return variables
        def pull(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return jax.device_put(np.asarray(x.addressable_data(0)))
            return x
        return jax.tree.map(pull, variables)

    def _forward_train(self, params, batch_stats, x):
        """Returns (outs, protos_or_None, mutated batch_stats)."""
        import contextlib

        from yololite_tpu.ops.quant import fake_quant_training
        ctx = fake_quant_training() if self.qat else contextlib.nullcontext()
        with ctx:
            out, mut = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=True, mutable=["batch_stats"])
        if self.model.with_masks:
            outs, protos = out
        else:
            outs, protos = out, None
        return outs, protos, mut["batch_stats"]

    # ------------------------------------------------------------------ #
    def _train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                    lr_vec: jnp.ndarray) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        images = batch["image"]
        if self.device_augment:
            # photometric aug fused into the train graph (device_augment.py);
            # keyed by the micro-step counter -> deterministic and
            # resume-stable with no host RNG threading.
            key = jax.random.fold_in(self._aug_key, state.micro)
            images = photometric_augment(images, key)
        x = normalize_images(images, self.model.dtype)
        targets = {"boxes": batch["boxes"], "labels": batch["labels"],
                   "mask": batch["mask"]}
        gtm = gt_masks_from_batch(batch)
        if gtm is not None:
            targets["masks"] = gtm

        img_size = int(batch["image"].shape[1])

        def loss_fn(params):
            outs, protos, new_bs = self._forward_train(params, state.batch_stats, x)
            total, metrics = self.loss(outs, targets, protos, img_size=img_size)
            return total, (new_bs, metrics)

        (total, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        if self._groups is None:
            self._groups = group_index_tree(state.params)

        def apply_grads(grads, opt_state, params, n_updates):
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = apply_updates_grouped(params, updates, self._groups, lr_vec)
            if self.use_ema:
                ema_p = ema_update(state.ema_params, new_params, n_updates,
                                   self.ema_decay, self.ema_warmup)
                ema_bs = ema_update(state.ema_batch_stats, new_bs, n_updates,
                                    self.ema_decay, self.ema_warmup)
            else:
                ema_p, ema_bs = new_params, new_bs
            return new_params, new_opt, ema_p, ema_bs

        if self.accumulate == 1:
            n_updates = state.updates + 1
            new_params, new_opt, ema_p, ema_bs = apply_grads(
                grads, state.opt_state, state.params, n_updates)
            new_state = TrainState(params=new_params, batch_stats=new_bs,
                                   opt_state=new_opt, ema_params=ema_p,
                                   ema_batch_stats=ema_bs, updates=n_updates,
                                   grad_accum=None, micro=state.micro + 1)
        else:
            # gradient accumulation (V2 API `accumulate=` train arg)
            k = self.accumulate
            acc = jax.tree.map(lambda a, g: a + g, state.grad_accum, grads)
            do_apply = (state.micro + 1) % k == 0
            n_updates = state.updates + do_apply.astype(jnp.int32)

            def on_apply(_):
                mean_g = jax.tree.map(lambda a: a / k, acc)
                new_params, new_opt, ema_p, ema_bs = apply_grads(
                    mean_g, state.opt_state, state.params, n_updates)
                zeroed = jax.tree.map(jnp.zeros_like, acc)
                return new_params, new_opt, ema_p, ema_bs, zeroed

            def on_skip(_):
                return (state.params, state.opt_state, state.ema_params,
                        state.ema_batch_stats, acc)

            new_params, new_opt, ema_p, ema_bs, new_acc = jax.lax.cond(
                do_apply, on_apply, on_skip, None)
            new_state = TrainState(params=new_params, batch_stats=new_bs,
                                   opt_state=new_opt, ema_params=ema_p,
                                   ema_batch_stats=ema_bs, updates=n_updates,
                                   grad_accum=new_acc, micro=state.micro + 1)

        metrics = dict(metrics)
        metrics["total"] = total
        return new_state, metrics

    # ------------------------------------------------------------------ #
    def _eval_forward(self, params, batch_stats, images_u8):
        """Returns (outs list, protos_or_None)."""
        import contextlib

        from yololite_tpu.ops.quant import fake_quant_training
        x = normalize_images(images_u8, self.model.dtype)
        ctx = fake_quant_training() if self.qat else contextlib.nullcontext()
        with ctx:
            out = self.model.apply({"params": params, "batch_stats": batch_stats},
                                   x, train=False)
        if self.model.with_masks:
            return out
        return out, None

    def _detect(self, outs, protos, conf_th, iou_th, max_det, img_size=None):
        """decode -> score -> NMS (-> mask assembly); all on device."""
        from yololite_tpu.ops.masks import assemble_masks_batch
        nc = self.model.num_classes
        img_size = int(img_size or self.img_size)
        d = decode_anchorfree(outs, img_size,
                              num_classes=nc if self.model.with_masks else None)
        scores, classes = yolo_scores(d["obj"][..., 0].astype(jnp.float32),
                                      d["cls"].astype(jnp.float32))
        boxes, s, c, v, idx = batched_nms(d["box"].astype(jnp.float32), scores,
                                          classes, iou_th=iou_th,
                                          conf_th=conf_th, max_det=max_det)
        dets = {"boxes": boxes, "scores": s, "classes": c, "valid": v, "idx": idx}
        if protos is not None:
            coef = jnp.take_along_axis(d["coef"].astype(jnp.float32),
                                       idx[..., None], axis=1)   # [B,D,K]
            dets["masks"] = assemble_masks_batch(protos.astype(jnp.float32),
                                                 coef, boxes, float(img_size))
        return dets

    def _eval_step(self, variables: Dict[str, Any], batch: Dict[str, jnp.ndarray],
                   conf_th: float = 0.001, iou_th: float = 0.65, max_det: int = 300):
        """EMA-model forward -> val loss + decoded, NMS'd detections."""
        outs, protos = self._eval_forward(variables["params"],
                                          variables["batch_stats"],
                                          batch["image"])
        targets = {"boxes": batch["boxes"], "labels": batch["labels"],
                   "mask": batch["mask"]}
        gtm = gt_masks_from_batch(batch)
        if gtm is not None:
            targets["masks"] = gtm
        img_size = int(batch["image"].shape[1])
        total, metrics = self.loss(outs, targets, protos, img_size=img_size,
                                   img_valid=batch.get("img_valid"))
        dets = self._detect(outs, protos, conf_th, iou_th, max_det, img_size)
        metrics = dict(metrics)
        metrics["total"] = total
        return metrics, dets

    def _predict_step(self, variables, images_u8, conf_th: float = 0.25,
                      iou_th: float = 0.45, max_det: int = 300):
        outs, protos = self._eval_forward(variables["params"],
                                          variables["batch_stats"], images_u8)
        return self._detect(outs, protos, conf_th, iou_th, max_det,
                            int(images_u8.shape[1]))

    # ------------------------------------------------------------------ #
    def ema_variables(self, state: TrainState):
        if self.use_ema:
            return {"params": state.ema_params, "batch_stats": state.ema_batch_stats}
        return {"params": state.params, "batch_stats": state.batch_stats}
