"""Preferred-input-layout AOT compilation (kill the relayout copy).

XLA chooses an internal tiled layout for every program input; when the caller
feeds arrays in the default layout, the compiled program begins with a
relayout copy — a pure HBM-bandwidth tax (~0.8 ms/batch, ~6% of the edge_n
@640 b128 deploy step, measured 2026-08-17). The reference never faces this
(ONNX Runtime consumes host-layout numpy, export/infer_onnx.py:85-130); on
TPU the fix is to ask XLA which layout it wants (AUTO input layouts via the
AOT API) and `device_put` host data straight into it — H2D cost is unchanged.

Degrades gracefully: `compile_with_preferred_layouts` returns (None, None)
when the experimental layout API is unavailable or the backend rejects it,
and callers fall back to plain `jax.jit`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np


def _spec(a) -> jax.ShapeDtypeStruct:
    if isinstance(a, jax.ShapeDtypeStruct):
        return a
    return jax.ShapeDtypeStruct(np.shape(a), a.dtype)


def compile_with_preferred_layouts(fn, *example_args
                                   ) -> Tuple[Optional[Any], Optional[tuple]]:
    """AOT-compile `fn` letting XLA pick every input's layout.

    `example_args` are concrete arrays / ShapeDtypeStructs (pytrees allowed).
    Returns `(compiled, formats)` — `formats[i]` is a pytree of
    `jax.experimental.layout.Format` matching arg i, suitable for
    `jax.device_put(arr, fmt)` — or `(None, None)` if unsupported.
    The compiled executable also accepts default-layout inputs (the runtime
    inserts the relayout copy again), so feeding it is never wrong, only slow.
    """
    try:
        from jax.experimental.layout import Format, Layout
        auto = Format(Layout.AUTO)
        shardings = tuple(jax.tree.map(lambda _: auto, a) for a in example_args)
        specs = tuple(jax.tree.map(_spec, a) for a in example_args)
        compiled = jax.jit(fn, in_shardings=shardings).lower(*specs).compile()
        formats = compiled.input_formats[0]
        return compiled, tuple(formats)
    except Exception:
        return None, None


def place(tree, formats):
    """device_put every leaf of `tree` into its preferred Format."""
    return jax.tree.map(lambda a, f: jax.device_put(a, f), tree, formats)


def checked_call(compiled, fn):
    """Wrap an AOT executable with a permanent plain-jit fallback.

    Observed with the axon tunnel backend (r3): for some graphs
    `compiled.input_formats` disagrees with the layouts the executable
    actually requires, so the placed arguments are rejected with
    "Computation was compiled for input layouts that disagree..." at call
    time. jit accepts any input layout (it re-inserts the relayout copy),
    so correctness is never at risk — only the ~6% relayout saving is lost
    for that graph.
    """
    state = {}

    def call(variables, x):
        if "fb" in state:
            return state["fb"](variables, x)
        try:
            return compiled(variables, x)
        except ValueError:
            state["fb"] = jax.jit(fn)
            return state["fb"](variables, x)

    return call
