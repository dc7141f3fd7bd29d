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


def aot_compile_and_place(fn, *concrete_args):
    """AOT-compile with XLA-preferred input layouts AND return args placed to
    match what the executable actually accepts.

    Two-step dance, needed because `device_put(a, Format(...))` on the
    tunneled TPU backend silently IGNORES the requested layout for some
    arrays (observed r4: 1x1 conv kernels asked for transposed 96x96 tiles,
    got default — 17/284 args), after which the AUTO-layout executable
    rejects its own placement at call time:
      1. compile with AUTO input layouts, `place` the args into the preferred
         formats (best effort — most leaves land where XLA wants them);
      2. read back the layouts that actually materialized and, if any
         differ, re-compile pinned to THOSE — XLA then re-layouts only the
         handful of divergent arrays inside the program, keeping the
         relayout-copy saving for everything else.

    Returns (compiled, placed_args) or (None, None) when the layout API is
    unavailable (callers fall back to plain jit).

    Disabled on the tunneled `axon` dev backend: there, ANY executable
    compiled with explicit input Formats — preferred, achieved, or even the
    default layouts — fails at execution with `TPU backend error
    (InvalidArgument)` (r4 bisect, /tmp/layout_probe3: all four pinning
    variants failed while plain jit runs fine). Set YOLOLITE_AOT_LAYOUT=1 to
    force the path on (e.g. on a directly-attached TPU where the ~6-10%
    relayout saving is real and was measured in r2).
    """
    import os
    try:
        if not os.environ.get("YOLOLITE_AOT_LAYOUT"):
            import jax.extend
            pv = getattr(jax.extend.backend.get_backend(),
                         "platform_version", "")
            if "axon" in pv:
                return None, None
        from jax.experimental.layout import Format, Layout  # noqa: F401
        compiled, fmts = compile_with_preferred_layouts(
            fn, *(jax.tree.map(_spec, a) for a in concrete_args))
        if compiled is None:
            return None, None
        placed = tuple(place(a, f) for a, f in zip(concrete_args, fmts))
        actual = tuple(jax.tree.map(lambda x: x.format, p) for p in placed)
        none_leaf = lambda x: x is None  # noqa: E731 — align if any fmt=None
        flat_want = jax.tree_util.tree_leaves(fmts, is_leaf=none_leaf)
        flat_got = jax.tree_util.tree_leaves(actual, is_leaf=none_leaf)
        if any(w != g for w, g in zip(flat_want, flat_got)):
            specs = tuple(jax.tree.map(_spec, a) for a in concrete_args)
            compiled = jax.jit(fn, in_shardings=actual).lower(*specs).compile()
        return compiled, placed
    except Exception:
        return None, None


def const_weights_jit(fn, variables):
    """Bake the weights into the executable as compile-time constants.

    Tunnel-safe alternative to pinned-layout AOT (r5): `jax.jit` a wrapper
    that CLOSES OVER the weight pytree instead of taking it as an argument.
    Closed-over arrays are embedded in the lowered program as constants, so
    XLA owns their layout outright — the per-call weight relayout copies the
    AOT-layout path eliminated (r2, ~6-10% at edge_n@640 b128) disappear the
    same way, but with no explicit input Format anywhere, which is exactly
    the API the axon tunnel rejects (see `aot_compile_and_place` docstring).
    Only the activation input still arrives in the caller's default layout.

    Returns `call(x)`. Deploy-only: recompiles whenever the weights change.
    """
    v = jax.device_put(variables)
    return jax.jit(lambda x: fn(v, x))


def chain_iters(fn, variables, n_iters: int):
    """Wrap `fn(variables, x)` so ONE dispatch executes `n_iters` chained
    evaluations on device — per-dispatch (host/tunnel) overhead is paid once
    per window instead of once per step, so the timing measures the chip.

    Loop-invariant code motion would hoist a body that ignores the carry, so
    each iteration perturbs the input with a data-dependent uint8 scalar
    derived from the previous output (adds one elementwise pass over the
    input, ~3% of the edge_n@640 graph's 10 GB/batch traffic; numerics of
    iterations >0 are deliberately not meaningful — this is a timing
    harness). Weights ride as closure constants (`const_weights_jit`).

    Returns `call(x)` -> last iteration's output.
    """
    import jax.numpy as jnp
    from jax import lax

    v = jax.device_put(variables)

    def _seed_from(out):
        # cheap, genuinely data-dependent scalar (must not constant-fold:
        # it is the loop-carried dependency that pins the body in the loop)
        leaf = jax.tree_util.tree_leaves(out)[0]
        f = jnp.abs(jnp.ravel(leaf)[0].astype(jnp.float32))
        return lax.convert_element_type(jnp.mod(f, 2.0), jnp.uint8)

    def call(x):
        def body(carry, _):
            s, _prev = carry
            out = fn(v, (x + s).astype(x.dtype))
            return (_seed_from(out), out), None

        out0 = fn(v, x)
        (_, out), _ = lax.scan(body, (_seed_from(out0), out0), None,
                               length=n_iters - 1)
        return out

    return jax.jit(call)


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

    def _default_layout(tree):
        """Re-place custom-Format arrays into the backend's default layout.
        The caller's operands were `place`d into the (rejected) preferred
        formats; feeding those buffers to jax.jit on the tunneled backend
        fails at execution with `TPU backend error (InvalidArgument)`
        (observed r3/r4 — this, not the tunnel, was behind the stale
        BENCH_r03), so the fallback must normalize layouts first."""
        return jax.tree.map(
            lambda a: jax.device_put(np.asarray(a))
            if isinstance(a, jax.Array) else a, tree)

    def _x_default(x):
        # single-slot cache: steady-state callers (bench loops) pass the same
        # placed batch every call — convert it once, not per call (through a
        # tunneled backend a per-call host roundtrip would dwarf the step).
        c = state.get("xc")
        if c is None or c[0] is not x:
            state["xc"] = (x, _default_layout(x))
        return state["xc"][1]

    def call(variables, x):
        if "fb" in state:
            return state["fb"](state["vars"], _x_default(x))
        try:
            return compiled(variables, x)
        except ValueError as e:
            # Only the known layout-disagreement failure engages the
            # fallback; any other ValueError (bad caller input, API changes)
            # must surface, not silently turn into a recompile.
            if "layout" not in str(e).lower():
                raise
            import warnings
            warnings.warn(
                "AOT executable rejected its own preferred input layouts "
                f"({str(e)[:120]}...); falling back to jax.jit for this "
                "graph — the ~6% relayout saving is lost.", RuntimeWarning)
            state["fb"] = jax.jit(fn)
            # weights are reused across calls: normalize them once and cache
            state["vars"] = _default_layout(variables)
            return state["fb"](state["vars"], _x_default(x))

    return call
