"""First-party jaxpr -> ONNX compiler for the deploy op set.

Reference parity: export/export_onnx.py:179-332 exports "raw" and "decoded"
ONNX graphs for CPU inference (NMS stays host-side, tools/infer_onnx.py:143-233).
This module lowers the SAME jitted deploy functions this repo runs on TPU to an
opset-17 ONNX graph — no `onnx`/`tf2onnx` dependency: serialization rides
`deploy/onnx_proto.py`, execution/verification rides `deploy/onnx_run.py`.

Design: walk the closed jaxpr of the deploy function (weights closed over →
graph initializers), translate each first-order primitive to ONNX nodes,
inline higher-order primitives (pjit / custom_jvp / remat), and constant-fold
every equation whose inputs are all known constants (this eliminates iota /
anchor grids / normalization constants at emit time). Layouts: jax convs are
NHWC/HWIO; ONNX Conv is NCHW/OIHW — inputs get Transpose nodes, initializer
weights are pre-transposed in numpy at emit time.

The supported primitive set covers the full model zoo's inference graphs
(convs incl. depthwise/grouped, BN folded arithmetic, SiLU/HardSwish/ReLU6/
GELU, SE blocks, SPPF max-pool, FPN nearest-upsample via broadcast, decode).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yololite_tpu.deploy import onnx_proto as P

# jax dtype -> emitted ONNX dtype (bf16 demotes to f32: CPU deploy artifact)
_DT = {
    np.dtype(np.float32): np.dtype(np.float32),
    np.dtype(np.float64): np.dtype(np.float64),
    np.dtype(np.float16): np.dtype(np.float16),
    np.dtype(np.uint8): np.dtype(np.uint8),
    np.dtype(np.int8): np.dtype(np.int8),
    np.dtype(np.int32): np.dtype(np.int32),
    np.dtype(np.int64): np.dtype(np.int64),
    np.dtype(np.uint32): np.dtype(np.uint32),
    np.dtype(np.bool_): np.dtype(np.bool_),
}


def _onnx_dtype(jax_dtype) -> np.dtype:
    d = np.dtype(jax_dtype) if not str(jax_dtype).startswith("bfloat16") else None
    if d is None or str(jax_dtype) == "bfloat16":
        return np.dtype(np.float32)
    if d not in _DT:
        raise NotImplementedError(f"onnx export: unsupported dtype {jax_dtype}")
    return _DT[d]


def _np_const(v) -> np.ndarray:
    a = np.asarray(v)
    if a.dtype == np.dtype("V2") or str(a.dtype) == "bfloat16":
        a = np.asarray(v, np.float32)
    return a


class _Emitter:
    def __init__(self, opset: int, dyn_batch: Optional[int] = None):
        self.opset = opset
        # dynamic-batch export: the traced leading batch extent. Shape-baking
        # ops rewrite a leading dim equal to this into batch-polymorphic form
        # (Reshape 0/-1, Expand 1, Slice huge-end) so one artifact serves any
        # batch size — reference parity with torch.onnx dynamic_axes
        # (export/export_onnx.py:303-309).
        self.dyn_batch = dyn_batch
        self.nodes: List[dict] = []
        self.initializers: Dict[str, np.ndarray] = {}
        self.value_infos: List[dict] = []
        self._n = 0
        # var (jax core.Var) -> ("t", name, shape, dtype) | ("c", np.ndarray)
        self.env: Dict[Any, tuple] = {}

    # -- naming ---------------------------------------------------------
    def fresh(self, hint: str = "t") -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def add_init(self, arr: np.ndarray, hint: str = "const") -> str:
        name = self.fresh(hint)
        self.initializers[name] = np.ascontiguousarray(arr)
        return name

    def node(self, op: str, inputs: Sequence[str], n_out: int = 1,
             hint: Optional[str] = None, **attrs) -> List[str]:
        outs = [self.fresh(hint or op.lower()) for _ in range(n_out)]
        self.nodes.append({
            "op_type": op,
            "input": list(inputs),
            "output": outs,
            "name": f"{op}_{self._n}",
            "attribute": [P.attr(k, v) for k, v in attrs.items()],
        })
        return outs

    # -- env helpers -----------------------------------------------------
    def read(self, v):
        """jax atom -> env entry."""
        if isinstance(v, jax.extend.core.Literal):
            return ("c", _np_const(v.val))
        return self.env[v]

    def is_const(self, v) -> bool:
        return self.read(v)[0] == "c"

    def const_val(self, v) -> np.ndarray:
        return self.read(v)[1]

    def name_of(self, v, hint: str = "const") -> str:
        """ONNX tensor name for an atom; materializes consts as initializers."""
        e = self.read(v)
        if e[0] == "t":
            return e[1]
        arr = e[1]
        key = ("__litcache__", arr.tobytes(), str(arr.dtype), arr.shape)
        cached = self.env.get(key)
        if cached is not None:
            return cached[1]
        name = self.add_init(arr, hint)
        self.env[key] = ("t", name, arr.shape, arr.dtype)
        return name

    def bind_out(self, var, name: str):
        shape = tuple(var.aval.shape)
        dtype = _onnx_dtype(var.aval.dtype)
        self.env[var] = ("t", name, shape, dtype)
        # dynamic batch: intermediate static-shape hints would be wrong for
        # other batch sizes (and batch-derived dims like B*C can't be named);
        # value_info is optional, so omit it and let runtimes infer.
        if self.dyn_batch is None:
            self.value_infos.append(P.value_info(name, dtype, shape))

    # -- dynamic-batch helpers -------------------------------------------
    def dyn_reshape_target(self, in_shape, out_shape, ctx: str):
        """Batch-polymorphic Reshape target. Leading dim == traced batch on
        both sides -> 0 (copy); a leading batch-multiple (pool collapse)
        -> -1; batch appearing elsewhere is unsupported."""
        tgt = [int(d) for d in out_shape]
        B = self.dyn_batch
        if B is None:
            return tgt
        if B in tgt[1:]:
            # conservative: a non-leading dim numerically equal to the traced
            # batch — can't tell static coincidence from a moved batch axis
            raise NotImplementedError(
                f"dynamic-batch onnx export: batch-sized dim in a non-leading "
                f"position of a {ctx} reshape (in={tuple(in_shape)}, "
                f"out={tuple(out_shape)}, traced batch={B}); trace with an "
                f"example batch that differs from every static dim")
        if tgt and tgt[0] == B:
            tgt[0] = 0 if (in_shape and int(in_shape[0]) == B) else -1
        elif tgt and tgt[0] % B == 0 and in_shape and int(in_shape[0]) % B == 0:
            tgt[0] = -1  # batch-derived leading dim (e.g. B*C pool collapse)
        return tgt

    def shape_of(self, v) -> Tuple[int, ...]:
        e = self.read(v)
        return tuple(e[1].shape) if e[0] == "c" else tuple(e[2])

    def i64(self, values, hint: str) -> str:
        return self.add_init(np.asarray(values, np.int64), hint)


# higher-order primitives to inline
_INLINE = {"pjit", "jit", "closed_call", "custom_jvp_call", "custom_vjp_call",
           "custom_jvp_call_jaxpr", "remat", "checkpoint", "custom_vjp_call_jaxpr"}

_UNARY = {
    "exp": "Exp", "log": "Log", "tanh": "Tanh", "logistic": "Sigmoid",
    "abs": "Abs", "neg": "Neg", "sqrt": "Sqrt", "floor": "Floor",
    "ceil": "Ceil", "round": "Round", "sign": "Sign", "erf": "Erf",
    "not": "Not", "stop_gradient": "Identity", "copy": "Identity",
}

_BINARY = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div", "max": "Max",
    "min": "Min", "pow": "Pow", "and": "And", "or": "Or", "xor": "Xor",
    "eq": "Equal", "lt": "Less", "le": "LessOrEqual", "gt": "Greater",
    "ge": "GreaterOrEqual",
}


def _inv_perm(p: Sequence[int]) -> List[int]:
    inv = [0] * len(p)
    for i, d in enumerate(p):
        inv[d] = i
    return inv


def _emit_eqn(em: _Emitter, eqn) -> None:
    prim = eqn.primitive.name
    params = eqn.params

    # ---- higher-order: inline the sub-jaxpr --------------------------------
    if prim in _INLINE:
        inner = (params.get("jaxpr") or params.get("call_jaxpr") or
                 params.get("fun_jaxpr"))
        if inner is None:
            raise NotImplementedError(f"onnx export: cannot inline {prim}")
        closed = inner if hasattr(inner, "jaxpr") else None
        ijaxpr = closed.jaxpr if closed is not None else inner
        consts = closed.consts if closed is not None else []
        sub_env_entries = [em.read(v) for v in eqn.invars]
        for cv, cval in zip(ijaxpr.constvars, consts):
            em.env[cv] = ("c", _np_const(cval))
        for iv, entry in zip(ijaxpr.invars, sub_env_entries):
            em.env[iv] = entry
        for ie in ijaxpr.eqns:
            _emit_eqn(em, ie)
        for ov, iv in zip(eqn.outvars, ijaxpr.outvars):
            em.env[ov] = em.read(iv)
        return

    # ---- constant folding ---------------------------------------------------
    if all(em.is_const(v) for v in eqn.invars):
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            vals = [jnp.asarray(em.const_val(v)) for v in eqn.invars]
            out = eqn.primitive.bind(*vals, **params)
        outs = out if eqn.primitive.multiple_results else [out]
        for ov, o in zip(eqn.outvars, outs):
            em.env[ov] = ("c", _np_const(o))
        return

    ins = [em.name_of(v) for v in eqn.invars]
    out_var = eqn.outvars[0]

    def emit(op: str, inputs, **attrs):
        (o,) = em.node(op, inputs, hint=prim, **attrs)
        em.bind_out(out_var, o)

    # ---- elementwise ---------------------------------------------------------
    if prim in _UNARY:
        emit(_UNARY[prim], ins)
    elif prim in _BINARY:
        emit(_BINARY[prim], ins)
    elif prim == "ne":
        (e,) = em.node("Equal", ins)
        emit("Not", [e])
    elif prim == "rsqrt":
        (s,) = em.node("Sqrt", ins)
        emit("Reciprocal", [s])
    elif prim == "log1p":
        one = em.add_init(np.ones((), _onnx_dtype(eqn.invars[0].aval.dtype)))
        (a,) = em.node("Add", [ins[0], one])
        emit("Log", [a])
    elif prim == "expm1":
        (e,) = em.node("Exp", ins)
        one = em.add_init(np.ones((), _onnx_dtype(eqn.invars[0].aval.dtype)))
        emit("Sub", [e, one])
    elif prim == "integer_pow":
        y = np.asarray(params["y"], _onnx_dtype(eqn.invars[0].aval.dtype))
        emit("Pow", [ins[0], em.add_init(y, "exponent")])
    elif prim == "square":
        emit("Mul", [ins[0], ins[0]])
    elif prim == "select_n":
        if len(ins) != 3:
            raise NotImplementedError("onnx export: select_n with >2 cases")
        emit("Where", [ins[0], ins[2], ins[1]])
    elif prim == "clamp":  # lax.clamp(lo, x, hi)
        (m,) = em.node("Max", [ins[1], ins[0]])
        emit("Min", [m, ins[2]])
    elif prim == "convert_element_type":
        to = _onnx_dtype(params["new_dtype"])
        emit("Cast", ins, to=int(P.DTYPE_TO_ONNX[to]))

    # ---- shape ops ------------------------------------------------------------
    elif prim in ("reshape", "squeeze", "expand_dims"):
        if prim == "reshape" and params.get("dimensions") is not None:
            raise NotImplementedError("onnx export: reshape with dimensions")
        tgt = em.dyn_reshape_target(em.shape_of(eqn.invars[0]),
                                    out_var.aval.shape, prim)
        emit("Reshape", [ins[0], em.i64(tgt, "shape")])
    elif prim == "transpose":
        emit("Transpose", ins, perm=[int(d) for d in params["permutation"]])
    elif prim == "broadcast_in_dim":
        tgt = [int(d) for d in params["shape"]]
        bdims = [int(d) for d in params["broadcast_dimensions"]]
        in_shape = em.shape_of(eqn.invars[0])
        interim = [1] * len(tgt)
        for i, d in enumerate(bdims):
            interim[d] = int(in_shape[i])
        cur = ins[0]
        if list(in_shape) != interim:
            rtgt = em.dyn_reshape_target(in_shape, interim, "broadcast")
            (cur,) = em.node("Reshape", [cur, em.i64(rtgt, "shape")])
        if interim != tgt:
            if em.dyn_batch is not None:
                # Expand = mutual broadcast: a 1 in the given shape keeps the
                # input's extent, so replacing a leading batch-sized target
                # with 1 is batch-polymorphic whether the batch extent comes
                # from the input (kept) or from downstream broadcasting
                # (a [1,...] operand broadcasts against [N,...] later).
                if em.dyn_batch in tgt[1:]:
                    raise NotImplementedError(
                        "dynamic-batch onnx export: batch-sized dim in a "
                        f"non-leading broadcast target {tuple(tgt)}")
                if tgt and tgt[0] == em.dyn_batch:
                    tgt = [1] + tgt[1:]
            (cur,) = em.node("Expand", [cur, em.i64(tgt, "shape")])
        if list(in_shape) == interim and interim == tgt:
            (cur,) = em.node("Identity", [cur])
        em.bind_out(out_var, cur)
    elif prim == "concatenate":
        emit("Concat", ins, axis=int(params["dimension"]))
    elif prim == "slice":
        if params.get("strides") is None:
            steps = [1] * len(params["start_indices"])
        else:
            steps = [int(s) for s in params["strides"]]
        starts = [int(s) for s in params["start_indices"]]
        ends = [int(s) for s in params["limit_indices"]]
        if em.dyn_batch is not None:
            in_shape = em.shape_of(eqn.invars[0])
            if in_shape and int(in_shape[0]) == em.dyn_batch:
                if starts[0] != 0 or ends[0] != int(in_shape[0]) or steps[0] != 1:
                    raise NotImplementedError(
                        "dynamic-batch onnx export: slicing the batch axis")
                ends[0] = 2 ** 62  # full-axis: ONNX clamps oversized ends
        axes = list(range(len(starts)))
        emit("Slice", [ins[0], em.i64(starts, "starts"), em.i64(ends, "ends"),
                       em.i64(axes, "axes"), em.i64(steps, "steps")])
    elif prim == "rev":
        dims = [int(d) for d in params["dimensions"]]
        shape = em.shape_of(eqn.invars[0])
        starts = [int(shape[d]) - 1 for d in dims]
        ends = [-(int(shape[d]) + 1) for d in dims]
        steps = [-1] * len(dims)
        emit("Slice", [ins[0], em.i64(starts, "starts"), em.i64(ends, "ends"),
                       em.i64(dims, "axes"), em.i64(steps, "steps")])
    elif prim == "pad":
        cfg = params["padding_config"]
        if any(i != 0 for _, _, i in cfg):
            raise NotImplementedError("onnx export: interior padding")
        los = [int(l) for l, _, _ in cfg]
        his = [int(h) for _, h, _ in cfg]
        cur = ins[0]
        if any(l < 0 for l in los) or any(h < 0 for h in his):
            # negative padding = slice
            shape = em.shape_of(eqn.invars[0])
            starts = [max(0, -l) for l in los]
            ends = [int(shape[d]) + min(0, his[d]) for d in range(len(his))]
            (cur,) = em.node("Slice", [cur, em.i64(starts, "starts"),
                                       em.i64(ends, "ends"),
                                       em.i64(list(range(len(los))), "axes"),
                                       em.i64([1] * len(los), "steps")])
            los = [max(0, l) for l in los]
            his = [max(0, h) for h in his]
        if any(los) or any(his):
            pads = em.i64(los + his, "pads")
            (cur,) = em.node("Pad", [cur, pads, em.name_of(eqn.invars[1])],
                             mode=b"constant")
        else:
            (cur,) = em.node("Identity", [cur])
        em.bind_out(out_var, cur)

    # ---- reductions ------------------------------------------------------------
    elif prim in ("reduce_sum", "reduce_max", "reduce_min", "reduce_prod"):
        axes = [int(a) for a in params["axes"]]
        if prim == "reduce_sum":
            emit("ReduceSum", [ins[0], em.i64(axes, "axes")], keepdims=0)
        else:  # axes are an attribute through opset 17 for Max/Min/Prod
            op = {"reduce_max": "ReduceMax", "reduce_min": "ReduceMin",
                  "reduce_prod": "ReduceProd"}[prim]
            emit(op, ins, axes=axes, keepdims=0)
    elif prim == "argmax" or prim == "argmin":
        op = "ArgMax" if prim == "argmax" else "ArgMin"
        (a,) = em.node(op, ins, axis=int(params["axes"][0]), keepdims=0)
        to = _onnx_dtype(out_var.aval.dtype)
        emit("Cast", [a], to=int(P.DTYPE_TO_ONNX[to]))

    # ---- conv / pool / matmul ----------------------------------------------------
    elif prim == "conv_general_dilated":
        _emit_conv(em, eqn, ins)
    elif prim == "reduce_window_max":
        _emit_pool(em, eqn, ins, "MaxPool")
    elif prim == "reduce_window_sum":
        _emit_pool(em, eqn, ins, "SumPool")
    elif prim == "dot_general":
        _emit_dot(em, eqn, ins)
    elif prim == "gather":
        _emit_gather(em, eqn, ins)
    else:
        raise NotImplementedError(
            f"onnx export: unsupported primitive '{prim}' "
            f"(params: {list(params)}). The deploy graphs only use the "
            f"documented op set; NMS-format graphs are not ONNX-exportable — "
            f"use fmt='raw'/'decoded' with host NMS (reference parity).")


def _emit_conv(em: _Emitter, eqn, ins):
    p = eqn.params
    dn = p["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    nd = len(lhs_spec)
    if nd != 4:
        raise NotImplementedError("onnx export: only 2D convs")
    if any(d != 1 for d in p["lhs_dilation"]):
        raise NotImplementedError("onnx export: transposed conv")
    if p.get("batch_group_count", 1) != 1:
        raise NotImplementedError("onnx export: batch_group_count != 1")

    # input -> NCHW
    x = ins[0]
    in_perm = [lhs_spec[0], lhs_spec[1]] + list(lhs_spec[2:])
    if in_perm != [0, 1, 2, 3]:
        (x,) = em.node("Transpose", [x], perm=in_perm)

    # weight -> OIHW (pre-transpose in numpy when it is a constant)
    w_perm = [rhs_spec[0], rhs_spec[1]] + list(rhs_spec[2:])
    wv = eqn.invars[1]
    if em.is_const(wv):
        w_arr = em.const_val(wv)
        if str(w_arr.dtype) == "bfloat16":
            w_arr = w_arr.astype(np.float32)
        w = em.add_init(np.ascontiguousarray(np.transpose(w_arr, w_perm)),
                        "weight")
    else:
        w = em.name_of(wv)
        if w_perm != [0, 1, 2, 3]:
            (w,) = em.node("Transpose", [w], perm=w_perm)

    pads = [int(p["padding"][0][0]), int(p["padding"][1][0]),
            int(p["padding"][0][1]), int(p["padding"][1][1])]
    (y,) = em.node(
        "Conv", [x, w],
        strides=[int(s) for s in p["window_strides"]],
        pads=pads,
        dilations=[int(d) for d in p["rhs_dilation"]],
        group=int(p["feature_group_count"]))

    # NCHW -> out layout: position out_spec[k] receives NCHW axis k
    out_perm = [0] * 4
    out_perm[0], out_perm[1] = out_spec[0], out_spec[1]
    out_perm[2], out_perm[3] = out_spec[2], out_spec[3]
    inv = _inv_perm(out_perm)
    if inv != [0, 1, 2, 3]:
        (y,) = em.node("Transpose", [y], perm=inv)
    em.bind_out(eqn.outvars[0], y)


def _emit_pool(em: _Emitter, eqn, ins, kind: str):
    p = eqn.params
    wd = [int(d) for d in p["window_dimensions"]]
    ws = [int(s) for s in p["window_strides"]]
    pad = [tuple(int(v) for v in pr) for pr in p["padding"]]
    r = len(wd)
    if any(d != 1 for d in p.get("base_dilation", (1,) * r)):
        raise NotImplementedError("onnx export: pool base dilation")
    if any(d != 1 for d in p.get("window_dilation", (1,) * r)):
        raise NotImplementedError("onnx export: pool window dilation")
    in_shape = em.shape_of(eqn.invars[0])
    out_shape = tuple(eqn.outvars[0].aval.shape)
    # pooled axes = window/stride/padding not identity
    sp = [i for i in range(r) if wd[i] != 1 or ws[i] != 1 or pad[i] != (0, 0)]
    if len(sp) > 2:
        raise NotImplementedError(f"onnx export: pool over {len(sp)} axes")
    if not sp:
        sp = [r - 2, r - 1] if r >= 2 else [0]
    if len(sp) == 1:
        # promote a neighbor as a size-1 pooled axis to reach 2D form
        other = sp[0] - 1 if sp[0] > 0 else sp[0] + 1
        sp = sorted([sp[0], other])
    batchish = [i for i in range(r) if i not in sp]
    perm = batchish + sp
    x = ins[0]
    if perm != list(range(r)):
        (x,) = em.node("Transpose", [x], perm=perm)
    # collapse batch dims to [N, 1, H, W] for ONNX's 4-D pooling
    nbatch = int(np.prod([in_shape[i] for i in batchish], initial=1))
    hw = [int(in_shape[sp[0]]), int(in_shape[sp[1]])]
    collapse = [nbatch, 1] + hw
    if em.dyn_batch is not None and 0 in batchish \
            and int(in_shape[0]) == em.dyn_batch:
        collapse[0] = -1  # batch-derived leading dim (B * other batchish)
    (x,) = em.node("Reshape", [x, em.i64(collapse, "shape")])
    kattrs = dict(
        kernel_shape=[wd[sp[0]], wd[sp[1]]],
        strides=[ws[sp[0]], ws[sp[1]]],
        pads=[pad[sp[0]][0], pad[sp[1]][0], pad[sp[0]][1], pad[sp[1]][1]])
    if kind == "MaxPool":
        (y,) = em.node("MaxPool", [x], **kattrs)
    else:  # SumPool = AveragePool * window_size (count_include_pad)
        (y,) = em.node("AveragePool", [x], count_include_pad=1, **kattrs)
        scale = em.add_init(
            np.asarray(wd[sp[0]] * wd[sp[1]],
                       _onnx_dtype(eqn.outvars[0].aval.dtype)))
        (y,) = em.node("Mul", [y, scale])
    # back to batch dims + pooled dims, then invert the transpose
    permuted_out = [int(out_shape[i]) for i in perm]
    if em.dyn_batch is not None and perm[0] == 0 \
            and permuted_out[0] == em.dyn_batch:
        if em.dyn_batch in permuted_out[1:]:
            raise NotImplementedError(
                "dynamic-batch onnx export: batch-sized non-leading pool dim")
        permuted_out[0] = -1
    (y,) = em.node("Reshape", [y, em.i64(permuted_out, "shape")])
    inv = _inv_perm(perm)
    if inv != list(range(r)):
        (y,) = em.node("Transpose", [y], perm=inv)
    em.bind_out(eqn.outvars[0], y)


def _emit_gather(em: _Emitter, eqn, ins):
    """lax.gather -> ONNX Gather node(s).

    Supports the canonical constant-index "take in place" forms that
    jnp.take / strided basic indexing lower to:
      - single axis: batch dims of the indices replace the gathered axis;
      - multiple axes with a SEPARABLE constant index grid (e.g. the Focus
        stem's x[:, ::2, ::2] space-to-depth slice) -> one Gather per axis.
    """
    p = eqn.params
    dn = p["dimension_numbers"]
    ss = [int(s) for s in p["slice_sizes"]]
    idxv = eqn.invars[1]
    op_shape = em.shape_of(eqn.invars[0])
    r = len(op_shape)
    gathered = [int(a) for a in dn.start_index_map]
    m = len(gathered)

    def unsupported(why: str):
        raise NotImplementedError(
            f"onnx export: general lax.gather ({why}) — only constant-index "
            f"in-place takes are supported; rewrite dynamic gathers as "
            f"one-hot matmuls (the TPU-preferred form), which export as "
            f"Einsum")

    if not em.is_const(idxv):
        unsupported("dynamic indices")
    if getattr(dn, "operand_batching_dims", ()):
        unsupported("operand batching dims")
    if tuple(dn.collapsed_slice_dims) != tuple(sorted(gathered)):
        unsupported("non-collapsed slice dims")
    if gathered != sorted(gathered):
        unsupported("unsorted start_index_map")
    if any(ss[a] != 1 for a in gathered) or any(
            ss[i] != op_shape[i] for i in range(r) if i not in gathered):
        unsupported("partial slice sizes")

    idx = em.const_val(idxv)
    if idx.shape[-1] != m or idx.ndim - 1 != m:
        unsupported(f"index shape {idx.shape} for {m} axes")
    # in-place semantics: batch dim a of the indices must land at position
    # gathered[a]; the kept operand dims occupy the remaining positions
    if tuple(dn.offset_dims) != tuple(i for i in range(r) if i not in gathered):
        unsupported(f"offset_dims {dn.offset_dims}")
    # separability: idx[..., a] may vary only along its own batch dim a
    per_axis = []
    for a in range(m):
        comp = idx[..., a]
        lead = comp[(0,) * a + (slice(None),) + (0,) * (m - 1 - a)]
        expect = lead.reshape([1] * a + [-1] + [1] * (m - 1 - a))
        if not np.array_equal(comp, np.broadcast_to(expect, comp.shape)):
            unsupported("non-separable index grid")
        per_axis.append(lead.astype(np.int64))

    y = ins[0]
    for a, k in enumerate(gathered):
        lead = per_axis[a]
        if (lead < 0).any() or (lead >= op_shape[k]).any():
            unsupported("out-of-bounds indices")
        iname = em.add_init(lead, "indices")
        (y,) = em.node("Gather", [y, iname], axis=k)
    em.bind_out(eqn.outvars[0], y)


def _emit_dot(em: _Emitter, eqn, ins):
    """dot_general -> Einsum (opset >= 12)."""
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lshape = em.shape_of(eqn.invars[0])
    rshape = em.shape_of(eqn.invars[1])
    letters = "abcdefghijklmnopqrstuvwxyz"
    it = iter(letters)
    lsub = [""] * len(lshape)
    rsub = [""] * len(rshape)
    for i, j in zip(lb, rb):
        c = next(it)
        lsub[i] = c
        rsub[j] = c
    for i, j in zip(lc, rc):
        c = next(it)
        lsub[i] = c
        rsub[j] = c
    out = [lsub[i] for i in lb]
    for i in range(len(lshape)):
        if not lsub[i]:
            lsub[i] = next(it)
            out.append(lsub[i])
    for j in range(len(rshape)):
        if not rsub[j]:
            rsub[j] = next(it)
            out.append(rsub[j])
    eq = f"{''.join(lsub)},{''.join(rsub)}->{''.join(out)}"
    (y,) = em.node("Einsum", ins, equation=eq.encode("utf-8"))
    em.bind_out(eqn.outvars[0], y)


# -----------------------------------------------------------------------------
# public API
# -----------------------------------------------------------------------------


def export_fn_to_onnx(fn, example_args, out_path: str, *,
                      input_names: Optional[Sequence[str]] = None,
                      output_names: Optional[Sequence[str]] = None,
                      model_name: str = "yololite_tpu",
                      doc: str = "", opset: int = 17,
                      dynamic_batch: bool = False,
                      batch_dim_name: str = "batch") -> str:
    """Trace `fn(*example_args)` and compile its jaxpr to an ONNX file.

    Closed-over arrays (model weights) become graph initializers; positional
    args become graph inputs. Returns `out_path`.

    dynamic_batch=True emits a batch-polymorphic graph: every graph
    input/output whose leading dim equals the traced batch gets a symbolic
    `dim_param` and all shape-baking ops (Reshape/Expand/Slice/pool
    collapses) are rewritten to batch-polymorphic forms — reference parity
    with torch.onnx `dynamic_axes` (export/export_onnx.py:303-309). The
    example batch must be >= 2 and should differ from every static model dim
    (channels, classes) so batch extents are unambiguous in traced shapes;
    exports are verified by running the artifact at a different batch size.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example_args)
    jaxpr = closed.jaxpr

    dyn_b = None
    if dynamic_batch:
        lead = [int(v.aval.shape[0]) for v in jaxpr.invars
                if len(v.aval.shape) > 0]
        if not lead or len(set(lead)) != 1:
            raise ValueError("dynamic_batch: graph inputs disagree on the "
                             f"leading (batch) dim: {lead}")
        dyn_b = lead[0]
        if dyn_b < 2:
            raise ValueError("dynamic_batch: trace with example batch >= 2 "
                             "(batch 1 is indistinguishable from broadcast "
                             "dims in traced shapes)")

    em = _Emitter(opset, dyn_batch=dyn_b)
    flat_args, _ = jax.tree.flatten(example_args)
    if input_names is None:
        input_names = [f"input_{i}" for i in range(len(flat_args))]
    assert len(input_names) == len(jaxpr.invars), (
        f"{len(input_names)} names for {len(jaxpr.invars)} graph inputs")

    def _io_shape(shape):
        if dyn_b is not None and len(shape) > 0 and int(shape[0]) == dyn_b:
            return (batch_dim_name,) + tuple(int(d) for d in shape[1:])
        return tuple(int(d) for d in shape)

    graph_inputs = []
    for name, var in zip(input_names, jaxpr.invars):
        dtype = _onnx_dtype(var.aval.dtype)
        em.env[var] = ("t", name, tuple(var.aval.shape), dtype)
        graph_inputs.append(P.value_info(name, dtype, _io_shape(var.aval.shape)))
    for cv, cval in zip(jaxpr.constvars, closed.consts):
        em.env[cv] = ("c", _np_const(cval))

    for eqn in jaxpr.eqns:
        _emit_eqn(em, eqn)

    out_leaves, out_tree = jax.tree.flatten(out_shape)
    if output_names is None:
        if len(out_leaves) == 1:
            output_names = ["output"]
        else:
            output_names = [f"output_{i}" for i in range(len(out_leaves))]
    assert len(output_names) == len(jaxpr.outvars)

    graph_outputs = []
    for name, var in zip(output_names, jaxpr.outvars):
        e = em.read(var)
        if e[0] == "c":  # fully folded output: emit as Identity-of-initializer
            src = em.name_of(var)
            (src,) = em.node("Identity", [src])
        else:
            src = e[1]
        em.nodes.append({"op_type": "Identity", "input": [src],
                         "output": [name], "name": f"out_{name}",
                         "attribute": []})
        dtype = _onnx_dtype(var.aval.dtype)
        graph_outputs.append(P.value_info(name, dtype,
                                          _io_shape(var.aval.shape)))

    graph = {
        "name": model_name,
        "node": em.nodes,
        "initializer": [P.tensor_proto(n, a) for n, a in em.initializers.items()],
        "input": graph_inputs,
        "output": graph_outputs,
        "value_info": em.value_infos,
    }
    model = {
        "ir_version": 8,
        "producer_name": "yololite_tpu",
        "producer_version": "1.0",
        "graph": graph,
        "opset_import": [{"domain": "", "version": opset}],
        "doc_string": doc,
        "metadata_props": [
            {"key": "out_tree", "value": json.dumps(str(out_tree))}],
    }
    data = P.serialize_model(model)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(data)
    return out_path
