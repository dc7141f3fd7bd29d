"""Optimizer construction with backbone/neck/head LR param groups.

Parity with reference tools/train.py:240-277:
  - groups: backbone (bb_lr_mult), neck (neck_lr_mult), head (head_lr_mult)
  - reference quirk preserved: only head3/head4/head5 count as "head"
    (train.py:256-258); head2/head6 land in the neck group (:260-261)
  - optimizers: adamw (default) / adam / sgd(momentum .9 nesterov)
  - weight decay applied to all groups (AdamW decoupled form)
  - grad clip by global norm (train.py:353-355)

Design: the LR arrives as a traced scalar each step (host-scheduled, see
schedulers.py). We run optax's direction transforms, then scale by
(-lr * group_mult) with a per-leaf multiplier tree.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax


def lr_mult_tree(params, bb_mult: float, neck_mult: float, head_mult: float):
    """Per-leaf LR multiplier pytree based on top-level module name."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path) -> float:
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top == "backbone":
            return bb_mult
        if top in ("head3", "head4", "head5"):
            return head_mult
        return neck_mult

    leaves = {jax.tree_util.keystr(p): label_of(p) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(lambda p, _: label_of(p), params), leaves


def build_optimizer(cfg: Dict[str, Any]):
    """Returns (direction_tx, hyper) where direction_tx maps grads->adam/sgd
    directions (incl. decoupled weight decay and grad clip)."""
    tr = cfg.get("training", {})
    name = str(tr.get("optimizer", "adamw")).lower()
    wd = float(tr.get("weight_decay", 1e-4) or 0.0)
    clip = float(tr.get("grad_clip", 0.0) or 0.0)

    chain = []
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    if name == "sgd":
        chain.append(optax.trace(decay=0.9, nesterov=True))
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
    elif name == "adam":
        chain.append(optax.scale_by_adam())
    else:  # adamw
        chain.append(optax.scale_by_adam())
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
    tx = optax.chain(*chain)
    hyper = {"base_lr": float(tr.get("lr", 1e-3)),
             "bb_mult": float(tr.get("bb_lr_mult", 1.0) or 1.0),
             "neck_mult": float(tr.get("neck_lr_mult", 1.0) or 1.0),
             "head_mult": float(tr.get("head_lr_mult", 1.0) or 1.0)}
    return tx, hyper


def apply_updates_grouped(params, updates, mults, lr: jnp.ndarray):
    """params <- params - lr * mult * direction."""
    scaled = jax.tree.map(lambda u, m: u * (-lr * m), updates, mults)
    return optax.apply_updates(params, scaled)
