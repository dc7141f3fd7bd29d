"""Exponential moving average of model variables (pytree EMA).

Parity with reference `ModelEMA` (tools/train.py:29-60):
  - decay ramp  d = decay * (1 - exp(-updates / warmup_limit))
  - warmup_limit = max(100, total_updates // 5)
  - float leaves: ema = ema * d + value * (1 - d); non-float copied.
The EMA weights are what get validated and checkpointed (train.py:391-394).

Implemented as a pure function over (params, batch_stats) pytrees so it fuses
into the jitted train step (no host round-trip per update).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_warmup_limit(total_updates: int) -> int:
    return max(100, int(total_updates) // 5)


def ema_update(ema_tree: Any, new_tree: Any, updates: jnp.ndarray,
               decay: float, warmup_limit: int) -> Any:
    """One EMA step. `updates` is the post-increment update counter (traced ok)."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / float(warmup_limit)))

    def upd(e, v):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return e * d + v.astype(e.dtype) * (1.0 - d)
        return v
    return jax.tree.map(upd, ema_tree, new_tree)
