#!/usr/bin/env python
"""First-party backbone pretraining on TPU (classification, imagefolder).

The reference gets its accuracy from ImageNet-pretrained timm backbones
(model_v2.py:84 `pretrained=True`). When no torch checkpoint is available for
tools/import_backbone.py, this pretrains any zoo backbone from scratch on an
imagefolder dataset (root/train/<class>/*.jpg [, root/val/...]) and writes the
same backbone-checkpoint format that `model.pretrained_backbone` consumes.

One jitted train step (bf16 compute, cross-entropy + label smoothing, AdamW,
cosine LR with linear warmup, EMA of weights for the saved checkpoint);
host-side pipeline reuses the detection loader's image decoding.

    python tools/pretrain_backbone.py --data /data/imagenet_folder \
        --backbone mobilenetv4_conv_small_050 --epochs 90 --batch_size 256 \
        --img_size 224 --out weights/mnv4_050_pre.ckpt
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def list_imagefolder(root):
    """[(path, class_idx)], class names — torchvision ImageFolder layout."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    samples = []
    for ci, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for f in sorted(os.listdir(cdir)):
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp")):
                samples.append((os.path.join(cdir, f), ci))
    if not samples:
        raise FileNotFoundError(f"no images under {root}")
    return samples, classes


def make_batch(samples, idxs, img_size, rng, train=True):
    import cv2
    imgs = np.empty((len(idxs), img_size, img_size, 3), np.uint8)
    labels = np.empty((len(idxs),), np.int32)
    for j, i in enumerate(idxs):
        path, ci = samples[i]
        img = cv2.imread(path)
        if img is None:
            img = np.zeros((img_size, img_size, 3), np.uint8)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if train:
            # random resized crop (scale 0.35-1.0) + horizontal flip
            h, w = img.shape[:2]
            s = rng.uniform(0.35, 1.0)
            ar = rng.uniform(0.8, 1.25)
            ch = min(h, max(8, int(round((s * h * w / ar) ** 0.5))))
            cw = min(w, max(8, int(round(ch * ar))))
            y0 = rng.randint(0, h - ch + 1)
            x0 = rng.randint(0, w - cw + 1)
            img = img[y0:y0 + ch, x0:x0 + cw]
            if rng.rand() < 0.5:
                img = img[:, ::-1]
        img = cv2.resize(img, (img_size, img_size),
                         interpolation=cv2.INTER_LINEAR)
        imgs[j] = img
        labels[j] = ci
    return imgs, labels


def build_classifier(backbone_name, num_classes, dtype):
    import jax.numpy as jnp
    from flax import linen as nn
    from yololite_tpu.models.backbones import build_backbone

    class Classifier(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            bb, _ = build_backbone(backbone_name, dtype=dtype,
                                   module_name="backbone")
            feats = bb(x, train)
            h = jnp.mean(feats[-1].astype(jnp.float32), axis=(1, 2))
            return nn.Dense(num_classes, name="head")(h)

    return Classifier()


def pretrain(data, backbone, out, epochs=90, batch_size=256, img_size=224,
             lr=2e-3, weight_decay=0.05, smoothing=0.1, warmup_epochs=3,
             ema_decay=0.9995, seed=0, log_every=50):
    import jax
    import jax.numpy as jnp
    import optax

    from yololite_tpu.train.checkpoint import save_checkpoint
    from yololite_tpu.train.steps import normalize_images

    train_samples, classes = list_imagefolder(os.path.join(data, "train"))
    val_dir = os.path.join(data, "val")
    val_samples = (list_imagefolder(val_dir)[0]
                   if os.path.isdir(val_dir) else None)
    nc = len(classes)
    steps_per_epoch = max(1, len(train_samples) // batch_size)
    total_steps = steps_per_epoch * epochs

    model = build_classifier(backbone, nc, jnp.bfloat16)
    # unjitted flax init dispatches each op separately — run it on the host
    # backend (see models/detector.py:init_model host_init) and transfer
    try:
        _cpu = jax.devices("cpu")[0]
    except RuntimeError:
        _cpu = None
    import contextlib
    with (jax.default_device(_cpu) if _cpu is not None
          else contextlib.nullcontext()):
        variables = model.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1, img_size, img_size, 3),
                                         jnp.float32), train=False)
    variables = jax.device_put(jax.tree.map(np.asarray, variables))
    params, batch_stats = variables["params"], variables["batch_stats"]

    # decay_steps counts warmup+decay; clamp warmup so short (smoke-test)
    # schedules keep a positive cosine phase
    warmup_steps = min(max(1, warmup_epochs * steps_per_epoch),
                       max(1, total_steps // 2))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1))
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=weight_decay))
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.copy, params)
    ema_bs = jax.tree.map(jnp.copy, batch_stats)

    @jax.jit
    def train_step(params, batch_stats, opt_state, ema, ema_bs, step,
                   images_u8, labels):
        x = normalize_images(images_u8, jnp.bfloat16)

        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            logits = logits.astype(jnp.float32)
            onehot = optax.smooth_labels(
                jax.nn.one_hot(labels, nc), smoothing)
            loss = optax.softmax_cross_entropy(logits, onehot).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, (mut["batch_stats"], acc)

        (loss, (new_bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        d = jnp.minimum(ema_decay, (1.0 + step) / (10.0 + step))
        ema = jax.tree.map(lambda e, p: e * d + p * (1 - d), ema, params)
        ema_bs = jax.tree.map(lambda e, p: e * d + p * (1 - d), ema_bs, new_bs)
        return params, new_bs, opt_state, ema, ema_bs, loss, acc

    @jax.jit
    def eval_step(params, batch_stats, images_u8, labels):
        x = normalize_images(images_u8, jnp.bfloat16)
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False).astype(jnp.float32)
        return (logits.argmax(-1) == labels).sum()

    rng = np.random.RandomState(seed)
    step = 0
    t0 = time.time()
    for epoch in range(epochs):
        order = rng.permutation(len(train_samples))
        for b in range(steps_per_epoch):
            idxs = order[b * batch_size:(b + 1) * batch_size]
            imgs, labels = make_batch(train_samples, idxs, img_size, rng)
            (params, batch_stats, opt_state, ema, ema_bs, loss,
             acc) = train_step(params, batch_stats, opt_state, ema, ema_bs,
                               jnp.asarray(step, jnp.float32),
                               jnp.asarray(imgs), jnp.asarray(labels))
            step += 1
            if step % log_every == 0:
                print(f"epoch {epoch} step {step}/{total_steps} "
                      f"loss {float(loss):.4f} acc {float(acc):.3f} "
                      f"({(time.time() - t0):.0f}s)")
        if val_samples:
            correct = 0
            for b in range(0, len(val_samples), batch_size):
                idxs = list(range(b, min(b + batch_size, len(val_samples))))
                imgs, labels = make_batch(val_samples, idxs, img_size, rng,
                                          train=False)
                correct += int(eval_step(ema, ema_bs, jnp.asarray(imgs),
                                         jnp.asarray(labels)))
            print(f"epoch {epoch}: val top-1 {correct / len(val_samples):.4f}")

    meta = {"backbone": backbone, "source": "pretrain_backbone",
            "num_classes": nc, "epochs": epochs, "img_size": img_size,
            "classes": classes if nc <= 1000 else None}
    save_checkpoint(out, jax.tree.map(np.asarray, ema["backbone"]),
                    jax.tree.map(np.asarray, ema_bs["backbone"]), meta)
    print(f"wrote {out}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="imagefolder root (train/<class>/*.jpg [, val/])")
    ap.add_argument("--backbone", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=90)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--weight_decay", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    pretrain(args.data, args.backbone, args.out, epochs=args.epochs,
             batch_size=args.batch_size, img_size=args.img_size, lr=args.lr,
             weight_decay=args.weight_decay, seed=args.seed)


if __name__ == "__main__":
    main()
