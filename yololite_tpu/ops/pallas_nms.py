"""Pallas TPU kernel: fused greedy-NMS suppression.

The jitted NMS path (ops/nms.py) computes a [k,k] IoU matrix and runs a
fixpoint iteration as separate XLA HLOs, which materializes the IoU matrix to
HBM between steps of the while loop. This kernel fuses the whole suppression
stage per image in VMEM:

  grid = (B,); per program: boxes [k,4] + validity -> keep mask [k]
  - pairwise IoU on the VPU (k=256 -> a 256x256 f32 tile, 256 KB of VMEM)
  - exact greedy solution via the same fixpoint iteration
    keep(i) = valid(i) and no kept j<i with IoU(j,i) > thr,
    converging in <= suppression-chain-depth steps (lax.while_loop)

Used by `ops/nms.batched_nms(..., use_pallas=True)`; numerically identical to
the XLA path (tests/test_pallas_nms.py). Falls back to interpret mode off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _suppress_kernel(boxes_ref, valid_ref, keep_ref, *, iou_th: float):
    boxes = boxes_ref[0].astype(jnp.float32)            # block [1,k,4] -> [k,4]
    valid_f = valid_ref[0].astype(jnp.float32)          # block [1,1,k] -> [1,k]
    k = boxes.shape[0]

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    iou = inter / (area[:, None] + area[None, :] - inter + 1e-7)

    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # sup[j,i] = 1 when j<i and IoU>thr; one fixpoint step is then the
    # MXU matvec keep[1,k] @ sup[k,k] (Mosaic has no minor-dim insert for i1)
    sup_f = ((iou > iou_th) & (rows < cols)).astype(jnp.float32)

    def cond(state):
        keep_f, prev_f, it = state
        return jnp.logical_and(jnp.any(keep_f != prev_f), it < k)

    def body(state):
        keep_f, _, it = state
        suppressed = jnp.dot(keep_f, sup_f,
                             preferred_element_type=jnp.float32)  # [1,k]
        new_keep = valid_f * (suppressed <= 0.0).astype(jnp.float32)
        return new_keep, keep_f, it + 1

    keep_f, _, _ = jax.lax.while_loop(
        cond, body, (valid_f, jnp.zeros_like(valid_f), jnp.int32(0)))
    keep_ref[0] = (keep_f > 0.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("iou_th", "interpret"))
def pallas_greedy_keep(boxes: jnp.ndarray, valid: jnp.ndarray,
                       iou_th: float = 0.65, interpret: bool = False):
    """boxes [B,k,4] (class-shifted, score-desc), valid [B,k] bool -> keep [B,k]."""
    b, k, _ = boxes.shape
    # masks carry a singleton sublane dim so the (sublane, lane) block tiling
    # constraint is satisfied: blocks equal the full trailing array dims
    valid3 = valid.astype(jnp.int8).reshape(b, 1, k)
    out = pl.pallas_call(
        functools.partial(_suppress_kernel, iou_th=iou_th),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.int8),
        interpret=interpret,
    )(boxes, valid3)
    return out.reshape(b, k).astype(bool)
