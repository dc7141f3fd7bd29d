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

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax


GROUP_BACKBONE, GROUP_NECK, GROUP_HEAD = 0, 1, 2


def group_index_tree(params):
    """Per-leaf param-group index (0=backbone, 1=neck, 2=head) by module name."""

    def label_of(path) -> int:
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top == "backbone":
            return GROUP_BACKBONE
        if top in ("head3", "head4", "head5"):
            return GROUP_HEAD
        return GROUP_NECK

    return jax.tree_util.tree_map_with_path(lambda p, _: label_of(p), params)


def lr_mult_tree(params, bb_mult: float, neck_mult: float, head_mult: float):
    """Per-leaf LR multiplier pytree (kept for API compatibility)."""
    mults = (bb_mult, neck_mult, head_mult)
    idx = group_index_tree(params)
    return jax.tree.map(lambda i: mults[i], idx), None


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


def apply_updates_grouped(params, updates, group_idx, lr_vec: jnp.ndarray):
    """params <- params - lr_vec[group] * direction.

    `lr_vec` is a traced [3] array of absolute LRs (backbone, neck, head) —
    letting the host scheduler implement warmup, plateau and backbone freezing
    without recompiling."""
    scaled = jax.tree.map(lambda u, g: u * (-lr_vec[g]), updates, group_idx)
    return optax.apply_updates(params, scaled)
