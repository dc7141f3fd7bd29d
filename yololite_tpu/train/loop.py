"""The training loop: epochs, warmup, aug-taper, per-epoch COCO eval, artifacts.

Orchestration parity with reference tools/train.py:102-589:
  - merged_config.yaml dump (:118), seed (:113)
  - sanity-check image of the first batch (:291-292)
  - augmentation tapering: mosaic/cutmix off at 70% of epochs, all augs off
    after 90% (:326-331); separate best checkpoints per phase
    (best_model_state / best_no_aug, :318-320, :526-541)
  - manual warmup + epoch-stepped schedulers (:306-308, :381-388)
  - per-epoch: EMA-model val loss + decode+NMS -> COCO stats (:408-494)
  - metrics.csv append with the same column set (:505-518)
  - best/last/periodic checkpointing keyed on --save_by (:521-565)
  - loss_curve.png (:544-556), final plot_metrics + evaluate_model (:574-589)

TPU-first: one jitted train step (forward+loss+backward+AdamW+EMA) with the
batch sharded over the device mesh; the host loop only schedules LR, logs and
checkpoints.
"""

from __future__ import annotations

import os
import random
import time
from typing import Any, Dict

import numpy as np

import jax

from yololite_tpu.config.config import save_merged_config
from yololite_tpu.data.dataset import YoloDataset
from yololite_tpu.data.loader import DataLoader
from yololite_tpu.eval.coco import coco_eval_from_lists
from yololite_tpu.eval.evaluate import dets_to_coco, evaluate_model, gts_to_coco
from yololite_tpu.eval.plots import plot_metrics
from yololite_tpu.models.detector import build_model_from_config
from yololite_tpu.parallel.mesh import make_mesh
from yololite_tpu.train.checkpoint import (build_meta, load_checkpoint,
                                           save_checkpoint)
from yololite_tpu.train.schedulers import build_scheduler
from yololite_tpu.train.steps import Trainer
from yololite_tpu.utils.viz import save_val_debug, visualize_batch

CSV_HEADER = ["epoch", "AP", "AP50", "AP75", "APS", "APM", "APL", "AR",
              "train_loss", "val_loss", "lr_g0", "lr_g1", "lr_g2",
              "elapsed_s", "timestamp"]


def set_seed(seed: int = 1337):
    random.seed(seed)
    np.random.seed(seed)


def _free_device_batch(device_batch) -> None:
    """Explicitly release a consumed input batch's device buffers.

    Good hygiene on any backend (bounds the live-buffer set independent of
    GC timing). Note the 'axon' dev-tunnel platform leaks ~a batch of host
    memory per upload EVEN WITH explicit deletes (~1.8 GB/epoch at 640px;
    verified not-our-code: the identical run on the CPU backend holds flat
    at 2.15 GB RSS) — for >60-epoch runs in that environment, chunk the run
    with `resume`/`save_optimizer: true` (exact resume) across processes."""
    for v in device_batch.values():
        try:
            v.delete()
        except Exception:
            pass


def _write_json_atomic(path: str, data):
    import json
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2)
    os.replace(tmp, path)


def append_csv(path: str, header, row):
    new = not os.path.exists(path)
    with open(path, "a", encoding="utf-8") as f:
        if new:
            f.write(",".join(header) + "\n")
        f.write(",".join(str(x) for x in row) + "\n")


def _save_loss_curve(train_losses, val_losses, path):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure()
        plt.plot(train_losses, label="Train")
        plt.plot(val_losses, label="Val")
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        plt.legend()
        plt.title("Loss Curve")
        plt.savefig(path)
        plt.close()
    except Exception:
        pass


def train_from_config(config: Dict[str, Any], progress: bool = True) -> Dict[str, Any]:
    import jax.numpy as jnp

    tr = config["training"]
    # persistent XLA compile cache: chunked/resumed runs (and any re-run at
    # the same shapes) skip the multi-minute train-step compile entirely
    try:
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # non-fatal (e.g. cache already configured differently)
    set_seed(int(tr.get("seed", 1337)))
    log_dir = config.get("logging", {}).get("log_dir", "runs/default")
    os.makedirs(log_dir, exist_ok=True)
    save_merged_config(config, log_dir)
    from yololite_tpu.train.writers import MetricWriters
    writers = MetricWriters(log_dir, config.get("logging"))

    num_classes = int(config["model"]["num_classes"])
    img_size = int(tr.get("img_size", 640))
    epochs = int(tr.get("epochs", 100))
    batch_size = int(tr.get("batch_size", 16))
    use_augment = bool(tr.get("augment", True))
    use_resize = bool(tr.get("resize", False))
    mb_raw = tr.get("max_boxes", 100)
    if isinstance(mb_raw, str) and mb_raw.strip().lower() == "auto":
        # size the GT padding capacity M to the dataset: assignment cost is
        # proportional to M (BENCHMARK_TPU.md train-step attribution). Mosaic
        # tiles 4 images (+1 cutmix paste), so the train-time worst case is
        # 4*base+1 when augmentation is on.
        from yololite_tpu.data.dataset import max_instances_per_image
        base = max(max_instances_per_image(config["dataset"]["train_labels"]),
                   max_instances_per_image(config["dataset"]["val_labels"]), 1)
        eff = 4 * base + 1 if use_augment else base
        max_boxes = int(min(300, max(16, ((eff + 7) // 8) * 8)))
        print(f"max_boxes=auto -> {max_boxes} "
              f"(max {base} GT/image{', mosaic x4+1' if use_augment else ''})")
    else:
        max_boxes = int(mb_raw)
    class_names = config.get("dataset", {}).get("names")

    task = str(config["model"].get("task", tr.get("task", "detect"))).lower()
    if config["model"].get("with_masks"):
        task = "segment"
    cache_images = bool(tr.get("cache_images", False))
    cache_budget_mb = tr.get("cache_budget_mb")  # bounded LRU image cache
    device_augment = bool(tr.get("device_augment", False))
    # multi-host pods: each process ingests only its stripe of the train set
    # (disjoint local batches -> the global batch assembled by shard_batch is
    # a true sample without cross-host duplicates; label/image caches scale
    # 1/N per host). Val stays unsharded: every process evaluates the full
    # set so the metrics each host logs are the global ones.
    n_proc = jax.process_count()
    train_ds = YoloDataset(config["dataset"]["train_images"],
                           config["dataset"]["train_labels"],
                           img_size=img_size, is_train=True, augment=use_augment,
                           max_boxes=max_boxes, use_resize=use_resize, task=task,
                           cache_images=cache_images,
                           cache_budget_mb=cache_budget_mb,
                           photometric=not device_augment,
                           aug_preset=str(tr.get("aug_preset", "base")),
                           shard_index=jax.process_index() if n_proc > 1 else 0,
                           shard_count=n_proc if n_proc > 1 else 1,
                           want_rles=False)
    val_ds = YoloDataset(config["dataset"]["val_images"],
                         config["dataset"]["val_labels"],
                         img_size=img_size, is_train=False, augment=False,
                         max_boxes=max_boxes, use_resize=use_resize, task=task,
                         cache_images=cache_images,
                         cache_budget_mb=cache_budget_mb)
    num_workers = int(tr.get("num_workers", 4) or 0)
    train_loader = DataLoader(train_ds, batch_size, shuffle=True, drop_last=True,
                              seed=int(tr.get("seed", 1337)),
                              num_workers=num_workers)
    val_loader = DataLoader(val_ds, batch_size, shuffle=False, drop_last=False,
                            num_workers=num_workers)
    steps_per_epoch = max(1, len(train_loader))
    total_updates = steps_per_epoch * epochs

    # device mesh: data-parallel over all (or the requested number of)
    # devices; optional second "spatial" axis shards the image height dim
    # (activation sharding for large-image P6 workloads — GSPMD halo
    # exchange, parallel/mesh.py).
    n_sp = max(1, int(tr.get("spatial_parallel") or 1))
    n_dp = int(tr.get("data_parallel") or max(1, len(jax.devices()) // n_sp))
    mesh = None
    if n_dp * n_sp > 1:
        if batch_size % max(1, n_dp) == 0:
            mesh = make_mesh(n_dp, n_spatial=n_sp)
        else:
            print(f"[dp] batch_size {batch_size} not divisible by {n_dp} "
                  f"devices — running single-device")

    # bf16 compute when amp enabled (reference CUDA AMP -> TPU bf16)
    dtype = jnp.bfloat16 if bool(tr.get("amp", True)) else jnp.float32
    model = build_model_from_config(config, dtype=dtype)
    trainer = Trainer(model, config, total_updates=total_updates, mesh=mesh)
    state = trainer.init_state(seed=int(tr.get("seed", 1337)))

    # pretrained backbone init (parity with the reference's timm
    # `pretrained=True` default, model_v2.py:84): a backbone checkpoint
    # written by tools/import_backbone.py (torch/timm weights) or
    # tools/pretrain_backbone.py (classification pretraining on TPU).
    pre_bb = (config.get("model", {}) or {}).get("pretrained_backbone") \
        or tr.get("pretrained_backbone")
    if pre_bb:
        sd, bmeta = load_checkpoint(pre_bb)
        want = getattr(model, "backbone", None)
        have = (bmeta or {}).get("backbone")
        if have and want and have != want:
            raise ValueError(f"pretrained_backbone is for {have!r}, "
                             f"model uses {want!r}")
        from flax.core import unfreeze as _unf
        p = _unf(state.params)
        bs = _unf(state.batch_stats)
        p["backbone"] = sd["params"].get("backbone", sd["params"])
        bs["backbone"] = sd["batch_stats"].get("backbone", sd["batch_stats"])
        state = trainer.state_from_weights(p, bs)
        print(f"Initialized backbone from {pre_bb}")

    resume = tr.get("resume")
    if resume:
        sd, _meta = load_checkpoint(resume)
        if "opt_state" in sd or "ema_params" in sd:
            # exact resume (checkpoint written with save_optimizer: true)
            state = trainer.state_from_full(sd)
            print(f"Resumed FULL state (EMA/optimizer) from {resume}")
        else:
            state = trainer.state_from_weights(sd["params"], sd["batch_stats"])
            print(f"Resumed weights from {resume} (fresh EMA/optimizer — "
                  f"reference semantics)")

    scheduler = build_scheduler(config, steps_per_epoch)
    base_lr = float(tr.get("lr", 1e-3))
    # V2 API capability: freeze backbone for the first k epochs (bb LR = 0);
    # the reference V1 declares `freeze_backbone_epochs` but never implements it
    # (SURVEY.md "dead flags") — implemented here.
    freeze_epochs = int(tr.get("freeze_backbone_epochs",
                               tr.get("freeze_backbone", 0) or 0) or 0)
    save_every = int(tr.get("save_every", 25) or 25)
    eval_every = int(tr.get("eval_every", 1) or 1)
    save_by = tr.get("save_by") or "AP"
    num_anchors = model.get_num_anchors_per_level()

    weight_dir = os.path.join(log_dir, "weights")
    os.makedirs(weight_dir, exist_ok=True)
    best_ckpt = os.path.join(weight_dir, "best_model_state.ckpt")
    last_ckpt = os.path.join(weight_dir, "last_model_state.ckpt")
    best_no_aug = os.path.join(weight_dir, "best_no_aug.ckpt")

    # sanity-check image of the first batch
    try:
        first = next(iter(train_loader))
        visualize_batch(first, os.path.join(log_dir, "sanity_check.jpg"), class_names)
    except Exception as e:
        print(f"[sanity_check] skipped: {e}")

    best_metric, best_metric_no_aug = -1.0, -1.0
    train_losses, val_losses = [], []
    print(f"Training on {jax.devices()} | {len(train_ds)} train / {len(val_ds)} val "
          f"images | img={img_size} batch={batch_size} dp={mesh is not None}")

    # multi-scale training: random size per epoch from the configured list
    # (the reference declares `multi_scale_sizes` but never applies it —
    # SURVEY.md "dead flags"; implemented here, one cached graph per size)
    multi_scale = tr.get("multi_scale_sizes") or []
    ms_rng = np.random.RandomState(int(tr.get("seed", 1337)) + 99)

    # chunked exact resume: `start_epoch` (with `resume` + save_optimizer)
    # continues the LR schedule, aug taper and CSV numbering mid-run instead
    # of replaying warmup/cosine from zero — for environments where long runs
    # must be split across processes (see ARCHITECTURE.md tunnel notes).
    start_epoch = int(tr.get("start_epoch", 0) or 0)
    global_step = start_epoch * steps_per_epoch
    scheduler.fast_forward(start_epoch)
    # resume-stable data order: the loader keys its shuffle AND the host-aug
    # RNG by (seed + epoch), so a resumed chunk must start counting at the
    # global epoch, not 0 — otherwise epoch N after resume replays epoch 0's
    # order and the chunked trajectory diverges from an uninterrupted run.
    train_loader.epoch = start_epoch
    for _ in range(start_epoch):
        if multi_scale:  # burn the per-epoch size draws of skipped epochs
            ms_rng.randint(len(multi_scale))
    mosaic_tapered = False

    # fault injection (tests): simulate an abrupt kill (no cleanup, no
    # checkpoint flush) a few batches into epoch N+1, only in the process
    # that trained epoch N itself — the resumed chunk must not re-crash.
    _crash_after = int(os.environ.get("YOLOLITE_FAULT_CRASH_AFTER_EPOCH",
                                      0) or 0)

    for epoch in range(start_epoch, epochs):
        # ---- augmentation taper (train.py:326-331) ----
        if epoch >= int(epochs * 0.7) and use_augment and not mosaic_tapered:
            train_ds.set_mosaic_cutmix(0.0, 0.0)
            mosaic_tapered = True
        if epoch > int(epochs * 0.9) and use_augment:
            train_ds.set_augment(False)
            use_augment = False
        if multi_scale:
            size = int(multi_scale[ms_rng.randint(len(multi_scale))])
            if size != train_ds.img_size:
                train_ds.set_img_size(size)

        start = time.time()
        running = np.zeros(4)  # total, box, obj, cls
        nb = 0
        freeze_bb = epoch < freeze_epochs
        # --profile: jax.profiler trace of a few warm steps of epoch 1
        profiling = bool(tr.get("profile")) and epoch == 1
        # NOTE: metric readback syncs once per step. Deferring the sync to
        # epoch end (to overlap host prep with device compute) leaks host
        # memory without bound on tunneled backends (the client buffers every
        # enqueued execution until its results are read — observed 130 GB RSS
        # and an OOM kill after ~60 epochs); per-step readback also bounds
        # the dispatch queue. The host pipeline dominates epoch time on
        # 1-core hosts anyway, so the overlap bought nothing measurable.
        for batch in train_loader:
            if profiling and nb == 2:
                os.makedirs(os.path.join(log_dir, "profile"), exist_ok=True)
                jax.profiler.start_trace(os.path.join(log_dir, "profile"))
            lr = base_lr * scheduler.lr_factor(epoch, global_step)
            device_batch = trainer.put_batch(batch)
            state, metrics = trainer.train_step(
                state, device_batch, trainer.lr_vector(lr, freeze_bb))
            b = len(batch["image"])
            running += np.array([float(metrics["total"]), float(metrics["box"]),
                                 float(metrics["obj"]), float(metrics["cls"])]) / b
            _free_device_batch(device_batch)
            nb += 1
            global_step += 1
            if (_crash_after and epoch == _crash_after
                    and start_epoch < _crash_after and nb == 1):
                os._exit(23)  # fault injection: abrupt mid-epoch death
            if profiling and nb == 7:
                jax.profiler.stop_trace()
                profiling = False
                print(f"[profile] trace saved to {log_dir}/profile")
        avg_train = running[0] / max(1, nb)
        train_losses.append(avg_train)
        scheduler.end_epoch(epoch)

        # ---- validation: EMA model, val loss + COCO (train.py:408-494) ----
        # eval_every > 1 skips the COCO pass on most epochs (final epoch and
        # the no-aug taper tail always evaluate, so best-ckpt selection still
        # sees the strongest epochs). The reference evaluates every epoch.
        do_eval = (eval_every <= 1 or (epoch + 1) % eval_every == 0
                   or (epoch + 1) == epochs or not use_augment)
        variables = trainer.ema_variables(state)
        if do_eval:
            # multi-host: eval runs per-process on local devices with local
            # copies of the (replicated) EMA variables — see put_eval_batch.
            eval_vars = trainer.local_eval_variables(variables)
            coco_images, coco_anns, coco_dets = [], [], []
            ann_id, img_id = 1, 1
            v_running = 0.0
            vb_count = 0
            dbg_batch = random.randrange(max(1, len(val_loader)))
            for bi, batch in enumerate(val_loader):
                nvalid = int(batch.get("nvalid", len(batch["image"])))
                device_batch = trainer.put_eval_batch(batch)
                vmetrics, dets = trainer.eval_step(eval_vars, device_batch,
                                                   conf_th=0.1, iou_th=0.65)
                v_running += float(vmetrics["total"]) / max(1, nvalid)
                dets = {k: np.asarray(v) for k, v in dets.items()}
                _free_device_batch(device_batch)
                vb_count += 1
                if bi == dbg_batch and epoch + 1 > 5:
                    save_val_debug(batch["image"],
                                   {k: np.asarray(v) for k, v in dets.items()},
                                   log_dir, conf_th=0.3, names=class_names)
                imgs, anns, ann_id = gts_to_coco(batch, img_id, nvalid, img_size, ann_id)
                coco_images += imgs
                coco_anns += anns
                # per-epoch COCO is bbox-only (segm mAP runs in the final
                # evaluate_model); drop masks so they aren't accumulated all epoch
                coco_dets += dets_to_coco({k: np.asarray(v) for k, v in dets.items()
                                           if k != "masks"}, img_id, nvalid)
                img_id += nvalid
            avg_val = v_running / max(1, vb_count)
            scheduler.observe(avg_val)
            coco_stats = coco_eval_from_lists(coco_images, coco_anns, coco_dets,
                                              num_classes=num_classes)
        else:
            avg_val = float("nan")
            coco_stats = {k: float("nan") for k in
                          ("AP", "AP50", "AP75", "APS", "APM", "APL", "AR")}
        val_losses.append(avg_val)
        elapsed = time.time() - start

        lr_now = base_lr * scheduler.lr_factor(epoch + 1, global_step)
        hyper = trainer.hyper
        # atomic per-epoch metric JSONs (the reference defines these paths but
        # never writes them — tools/train.py:499-500; implemented here)
        if do_eval:
            _write_json_atomic(os.path.join(log_dir, "last_metrics.json"),
                               {"epoch": epoch + 1, **coco_stats,
                                "train_loss": avg_train, "val_loss": avg_val})
            if coco_stats.get(save_by, 0.0) >= max(best_metric, best_metric_no_aug):
                _write_json_atomic(os.path.join(log_dir, "best_metrics.json"),
                                   {"epoch": epoch + 1, **coco_stats})
        append_csv(os.path.join(log_dir, "metrics.csv"), CSV_HEADER, [
            epoch + 1, coco_stats["AP"], coco_stats["AP50"], coco_stats["AP75"],
            coco_stats["APS"], coco_stats["APM"], coco_stats["APL"],
            coco_stats["AR"], avg_train, avg_val,
            lr_now * hyper["bb_mult"], lr_now * hyper["neck_mult"],
            lr_now * hyper["head_mult"], elapsed,
            time.strftime("%Y-%m-%dT%H:%M:%S"),
        ])
        writers.write(epoch + 1, {
            "train/loss": avg_train, "val/loss": avg_val, "lr": lr_now,
            **({f"val/{k}": v for k, v in coco_stats.items()} if do_eval
               else {})})

        # ---- checkpointing (train.py:521-565) ----
        # training.checkpoint_backend: msgpack (default, single file) or
        # orbax_async (non-blocking dir writes for large DP runs; the step
        # loop never waits on disk).
        if str(tr.get("checkpoint_backend", "msgpack")) == "orbax_async":
            from yololite_tpu.train.checkpoint import \
                save_checkpoint_orbax_async as _save_ckpt
        else:
            _save_ckpt = save_checkpoint
        meta = build_meta(config, coco_stats, save_by, class_names, num_anchors)
        current = coco_stats.get(save_by, 0.0)
        if current > best_metric and use_augment:
            best_metric = current
            _save_ckpt(best_ckpt, variables["params"],
                       variables["batch_stats"], meta)
            print(f"✓ New best {save_by}={best_metric:.4f} saved to {best_ckpt}")
        if current > best_metric_no_aug and not use_augment:
            best_metric_no_aug = current
            _save_ckpt(best_no_aug, variables["params"],
                       variables["batch_stats"], meta)
            print(f"✓ New best (no-aug) {save_by}={best_metric_no_aug:.4f}")
        if (epoch + 1) % save_every == 0:
            _save_ckpt(os.path.join(weight_dir, f"epoch_{epoch + 1}.ckpt"),
                       variables["params"], variables["batch_stats"], meta)
        extra = None
        if bool(tr.get("save_optimizer", False)):
            from flax import serialization as _ser
            # top-level "params" are the deployed EMA weights; exact resume
            # additionally needs the RAW training weights the Adam moments
            # belong to (raw_params/raw_batch_stats), restored by
            # Trainer.state_from_full.
            extra = {"raw_params": state.params,
                     "raw_batch_stats": state.batch_stats,
                     "ema_params": state.ema_params,
                     "ema_batch_stats": state.ema_batch_stats,
                     "updates": state.updates,
                     "micro": state.micro,
                     "opt_state": _ser.to_state_dict(state.opt_state)}
        save_checkpoint(last_ckpt, variables["params"], variables["batch_stats"],
                        meta, extra_state=extra)
        _save_loss_curve(train_losses, val_losses,
                         os.path.join(log_dir, "loss_curve.png"))

        print(f"Epoch {epoch + 1}/{epochs} | train {avg_train:.4f} | "
              f"val {avg_val:.4f} | AP {coco_stats['AP']:.4f} "
              f"AP50 {coco_stats['AP50']:.4f} AP75 {coco_stats['AP75']:.4f} | "
              f"took {elapsed:.1f}s")

    writers.close()
    from yololite_tpu.train.checkpoint import wait_for_checkpoints
    wait_for_checkpoints()  # land any in-flight async orbax writes
    # ---- final plots + full evaluation on best ckpt (train.py:574-589) ----
    plot_metrics(os.path.join(log_dir, "metrics.csv"),
                 os.path.join(log_dir, "plots"), smooth=0.2, style="dark")
    load_path = best_ckpt if os.path.exists(best_ckpt) else (
        best_no_aug if os.path.exists(best_no_aug) else last_ckpt)
    results = {}
    if os.path.exists(load_path):
        sd, _ = load_checkpoint(load_path)
        variables = {"params": sd["params"], "batch_stats": sd["batch_stats"]}
        results = evaluate_model(trainer, variables, val_loader, log_dir,
                                 num_classes, img_size, class_names)
    results["best_metric"] = max(best_metric, best_metric_no_aug)
    results["log_dir"] = log_dir
    return results
