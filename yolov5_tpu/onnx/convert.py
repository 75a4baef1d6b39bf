"""jaxpr -> ONNX converter.

Exports any jittable function over this framework's primitive vocabulary to
an ONNX (opset 13) model, with no ``onnx``/``torch`` dependency — the
serialization is :mod:`yolov5_tpu.onnx.proto`.

Design notes (TPU-native, not a torch-tracer port — the reference exports
ONNX by tracing its torch modules, /root/reference/export.py:327-372):

- **Trace once**: ``jax.make_jaxpr`` gives the full static graph; every
  primitive maps to 1-3 ONNX nodes. All model variants (ghost, transformer,
  segment, classify) export through the same 20-odd primitive handlers —
  there is no per-module export code to keep in sync with the layer zoo.

- **Pending-permutation layout pass**: JAX computes in NHWC, ONNX
  convolutions require NCHW. Every traced value carries a lazy physical
  permutation (``perm``: physical = logical.transpose(perm)). ``Conv`` /
  ``MaxPool`` produce values pending in NCHW; elementwise ops, concat,
  slice and pad *propagate* the permutation by remapping their axes instead
  of materializing a Transpose. A Transpose node is emitted only when two
  layouts genuinely meet (reshape boundaries, graph outputs), so the
  emitted graph is natively NCHW rather than Transpose soup.

- **Host const-folding**: any equation whose inputs are all host constants
  is evaluated eagerly (the Detect decode's iota grids, anchor tables and
  stride constants collapse into initializers).

- **Upsample pattern**: jnp's nearest-upsample traces as
  broadcast_in_dim + reshape; the pair is pattern-matched to a single ONNX
  ``Resize`` (nearest/floor, matching repeat semantics).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.extend import core as jcore

from . import proto

# values all-constant-input equations are folded for; everything cheap/shape-y
_FOLDABLE = True  # fold any primitive whose inputs are all host constants


class UnsupportedPrimitive(NotImplementedError):
    pass


def _np(x):
    return np.asarray(x)


class _Builder:
    def __init__(self):
        self.nodes: list[bytes] = []
        self.initializers: list[bytes] = []
        self._init_names: set[str] = set()
        self._n = 0
        # var id -> record; records:
        #   ("g", name, perm)          graph value; physical = logical.transpose(perm)
        #   ("c", np.ndarray)          host constant (exact logical shape)
        #   ("bc", arr, full_shape)    host constant, rank-matched with 1s
        self.vals: dict[int, tuple] = {}
        self._const_cache: dict[tuple, str] = {}

    # -- naming -----------------------------------------------------------
    def fresh(self, hint="t"):
        self._n += 1
        return f"{hint}_{self._n}"

    def emit(self, op, inputs, outputs=None, attrs=None, hint=None):
        out = outputs or [self.fresh(hint or op.lower())]
        self.nodes.append(proto.node(op, inputs, out, name=self.fresh(f"n_{op}"),
                                     attrs=attrs))
        return out[0] if len(out) == 1 else out

    def add_initializer(self, arr: np.ndarray, hint="const"):
        key = (arr.dtype.str, arr.shape, arr.tobytes())
        if key in self._const_cache:
            return self._const_cache[key]
        name = self.fresh(hint)
        self.initializers.append(proto.tensor(name, arr))
        self._init_names.add(name)
        self._const_cache[key] = name
        return name

    def i64(self, values, hint="shape"):
        return self.add_initializer(np.asarray(values, np.int64), hint)

    # -- value access -----------------------------------------------------
    def record(self, var, rec):
        self.vals[id(var)] = rec

    def rec_of(self, var):
        if isinstance(var, jcore.Literal):
            return ("c", _np(var.val))
        return self.vals[id(var)]

    def is_const(self, var):
        return self.rec_of(var)[0] in ("c", "bc")

    def const_value(self, var, full=False):
        rec = self.rec_of(var)
        if rec[0] == "c":
            return rec[1]
        if rec[0] == "bc":
            return np.broadcast_to(rec[1], rec[2]) if full else rec[1]
        raise ValueError("not a constant")

    def perm_of(self, var):
        rec = self.rec_of(var)
        return rec[2] if rec[0] == "g" else None

    def get(self, var, perm=None, hint="w"):
        """ONNX name for `var` with physical layout logical.transpose(perm)."""
        rec = self.rec_of(var)
        if rec[0] in ("c", "bc"):
            arr = rec[1]
            if perm is not None and arr.ndim == len(perm):
                arr = np.transpose(arr, perm)
            return self.add_initializer(np.ascontiguousarray(arr), hint)
        _, name, cur = rec
        if cur == perm or (cur is None and perm is None):
            return name
        ndim = len(cur or perm)
        cur_ = cur or tuple(range(ndim))
        new_ = perm or tuple(range(ndim))
        q = tuple(cur_.index(d) for d in new_)
        if q == tuple(range(ndim)):
            return name
        return self.emit("Transpose", [name], attrs={"perm": list(q)}, hint="tr")

    def align(self, invars):
        """Pick a common physical perm for an elementwise op's inputs: the
        first graph input's pending perm wins; everything else is converted
        (consts host-side). Returns (names, perm)."""
        perm = None
        for v in invars:
            if not self.is_const(v):
                perm = self.perm_of(v)
                break
        names = []
        for v in invars:
            rec = self.rec_of(v)
            if rec[0] in ("c", "bc"):
                arr = rec[1]
                if perm is not None and arr.ndim == len(perm):
                    arr = np.ascontiguousarray(np.transpose(arr, perm))
                names.append(self.add_initializer(arr, "c"))
            else:
                names.append(self.get(v, perm))
        return names, perm


# ---------------------------------------------------------------------------


def _inline_call_params(eqn):
    for key in ("jaxpr", "call_jaxpr"):
        sub = eqn.params.get(key)
        if sub is not None:
            if hasattr(sub, "jaxpr"):  # ClosedJaxpr
                return sub.jaxpr, sub.consts
            return sub, []
    return None, None


def _fold(b: _Builder, eqn):
    """Evaluate an all-constant equation host-side."""
    invals = [jnp.asarray(b.const_value(v, full=True)) for v in eqn.invars]
    with jax.default_device(jax.devices("cpu")[0]):
        out = eqn.primitive.bind(*invals, **eqn.params)
    outs = out if eqn.primitive.multiple_results else [out]
    for var, val in zip(eqn.outvars, outs):
        b.record(var, ("c", _np(val)))


_ELTWISE = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
    "max": "Max", "min": "Min", "pow": "Pow",
    "gt": "Greater", "ge": "GreaterOrEqual", "lt": "Less",
    "le": "LessOrEqual", "eq": "Equal", "and": "And", "or": "Or",
    "xor": "Xor",
}
_UNARY = {
    "logistic": "Sigmoid", "exp": "Exp", "tanh": "Tanh", "log": "Log",
    "sqrt": "Sqrt", "neg": "Neg", "abs": "Abs", "floor": "Floor",
    "ceil": "Ceil", "sign": "Sign", "is_finite": None,
}


def _conv(b: _Builder, eqn):
    dn = eqn.params["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    if any(d != 1 for d in eqn.params.get("lhs_dilation", (1, 1))):
        raise UnsupportedPrimitive("transposed convolution (lhs_dilation>1)")
    groups = eqn.params["feature_group_count"]
    if eqn.params.get("batch_group_count", 1) != 1:
        raise UnsupportedPrimitive("batch_group_count > 1")
    perm_in = (lhs_spec[0], lhs_spec[1], *lhs_spec[2:])
    x = b.get(eqn.invars[0], perm_in)
    wvar = eqn.invars[1]
    if not b.is_const(wvar):
        raise UnsupportedPrimitive("non-constant conv weights")
    w = b.const_value(wvar, full=True)
    # rhs_spec = (out_feature, in_feature, *spatial) indices into w's dims
    w = np.ascontiguousarray(np.transpose(w, (rhs_spec[0], rhs_spec[1], *rhs_spec[2:])))
    wname = b.add_initializer(w.astype(np.float32, copy=False), "weight")
    pad = eqn.params["padding"]  # ((lo, hi), ...) per spatial dim
    attrs = {
        "strides": list(eqn.params["window_strides"]),
        "pads": [p[0] for p in pad] + [p[1] for p in pad],
        "dilations": list(eqn.params.get("rhs_dilation", (1,) * len(pad))),
        "group": groups,
        "kernel_shape": list(w.shape[2:]),
    }
    out = b.emit("Conv", [x, wname], attrs=attrs, hint="conv")
    out_perm = (out_spec[0], out_spec[1], *out_spec[2:])
    ndim = len(out_perm)
    if out_perm == tuple(range(ndim)):
        out_perm = None
    b.record(eqn.outvars[0], ("g", out, out_perm))


def _maxpool(b: _Builder, eqn):
    wd = eqn.params["window_dimensions"]
    ws = eqn.params["window_strides"]
    pad = eqn.params["padding"]
    if any(d != 1 for d in eqn.params.get("base_dilation", (1,) * len(wd))) or \
       any(d != 1 for d in eqn.params.get("window_dilation", (1,) * len(wd))):
        raise UnsupportedPrimitive("dilated reduce_window")
    # identify spatial dims (window > 1 or padded); batch/channel have window 1
    spatial = [i for i in range(len(wd)) if wd[i] != 1 or pad[i] != (0, 0) or ws[i] != 1]
    others = [i for i in range(len(wd)) if i not in spatial]
    if len(spatial) > 2:
        raise UnsupportedPrimitive(f"reduce_window over {len(spatial)} spatial dims")
    if len(spatial) < 2:  # degenerate 1x1 pool: pick trailing dims
        spatial = ([others.pop()] + spatial)[-2:]
    perm = (*others, *spatial)
    x = b.get(eqn.invars[0], perm)
    attrs = {
        "kernel_shape": [wd[i] for i in spatial],
        "strides": [ws[i] for i in spatial],
        "pads": [pad[i][0] for i in spatial] + [pad[i][1] for i in spatial],
    }
    out = b.emit("MaxPool", [x], attrs=attrs, hint="pool")
    b.record(eqn.outvars[0], ("g", out, None if perm == tuple(range(len(wd))) else perm))


def _dot_general(b: _Builder, eqn):
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars
    lshape = lhs.aval.shape
    rshape = rhs.aval.shape
    lfree = [d for d in range(len(lshape)) if d not in lc and d not in lb]
    rfree = [d for d in range(len(rshape)) if d not in rc and d not in rb]
    lperm = (*lb, *lfree, *lc)
    rperm = (*rb, *rc, *rfree)
    a = b.get(lhs, None if lperm == tuple(range(len(lshape))) else lperm, hint="mm_a")
    c = b.get(rhs, None if rperm == tuple(range(len(rshape))) else rperm, hint="mm_b")
    bdims = [lshape[d] for d in lb]
    m = int(np.prod([lshape[d] for d in lfree])) if lfree else 1
    k = int(np.prod([lshape[d] for d in lc])) if lc else 1
    n = int(np.prod([rshape[d] for d in rfree])) if rfree else 1
    a2 = b.emit("Reshape", [a, b.i64([*bdims, m, k])], hint="mm_ar") \
        if (len(lfree), len(lc)) != (1, 1) else a
    c2 = b.emit("Reshape", [c, b.i64([*bdims, k, n])], hint="mm_br") \
        if (len(rc), len(rfree)) != (1, 1) else c
    mm = b.emit("MatMul", [a2, c2], hint="mm")
    out_shape = eqn.outvars[0].aval.shape
    if tuple(out_shape) != (*bdims, m, n):
        mm = b.emit("Reshape", [mm, b.i64(list(out_shape))], hint="mm_or")
    b.record(eqn.outvars[0], ("g", mm, None))


def _broadcast(b: _Builder, eqn):
    shape = tuple(eqn.params["shape"])
    bdims = tuple(eqn.params["broadcast_dimensions"])
    (v,) = eqn.invars
    if b.is_const(v):
        arr = b.const_value(v)
        rank_matched = np.reshape(
            arr, [arr.shape[bdims.index(d)] if d in bdims else 1 for d in range(len(shape))]
        ) if arr.ndim else arr
        b.record(eqn.outvars[0], ("bc", _np(rank_matched), shape))
        return
    # graph value: Reshape to rank-matched-with-1s, then Expand
    in_shape = v.aval.shape
    rm_shape = [in_shape[bdims.index(d)] if d in bdims else 1 for d in range(len(shape))]
    x = b.get(v, None)
    r = b.emit("Reshape", [x, b.i64(rm_shape)], hint="bc_r")
    if tuple(rm_shape) != shape:
        r = b.emit("Expand", [r, b.i64(list(shape))], hint="bc_e")
    b.record(eqn.outvars[0], ("g", r, None))


def _find_upsample_chains(eqns):
    """Nearest-upsample traces as a three-equation chain:
      x:(B,H,W,C) -bcast(0,1,3,5)-> (B,H,1,W,1,C)
                  -bcast(identity)-> (B,H,f,W,f,C)
                  -reshape-> (B,H*f,W*f,C)
    Returns (skip: set of eqn ids to elide, resize: id(reshape eqn) ->
    (src_var, fh, fw))."""
    uses: dict[int, list] = {}
    for eqn in eqns:
        for v in eqn.invars:
            if not isinstance(v, jcore.Literal):
                uses.setdefault(id(v), []).append(eqn)

    def sole_consumer(var, prim):
        consumers = uses.get(id(var), [])
        if len(consumers) == 1 and consumers[0].primitive.name == prim:
            return consumers[0]
        return None

    skip, resize = set(), {}
    for eqn in eqns:
        if eqn.primitive.name != "broadcast_in_dim":
            continue
        src = eqn.invars[0]
        if isinstance(src, jcore.Literal) or len(src.aval.shape) != 4:
            continue
        B, H, W, C = src.aval.shape
        if tuple(eqn.params["broadcast_dimensions"]) != (0, 1, 3, 5) or \
                tuple(eqn.params["shape"]) != (B, H, 1, W, 1, C):
            continue
        b2 = sole_consumer(eqn.outvars[0], "broadcast_in_dim")
        if b2 is None or tuple(b2.params["broadcast_dimensions"]) != tuple(range(6)):
            continue
        shape2 = tuple(b2.params["shape"])
        fh, fw = shape2[2], shape2[4]
        if shape2 != (B, H, fh, W, fw, C):
            continue
        rs = sole_consumer(b2.outvars[0], "reshape")
        if rs is None or rs.params.get("dimensions") is not None or \
                tuple(rs.params["new_sizes"]) != (B, H * fh, W * fw, C):
            continue
        skip.update((id(eqn), id(b2)))
        resize[id(rs)] = (src, fh, fw)
    return skip, resize


def _emit_resize(b: _Builder, rs_eqn, up):
    src, fh, fw = up
    # Resize wants NCHW; logical is NHWC
    x = b.get(src, (0, 3, 1, 2))
    scales = b.add_initializer(np.array([1.0, 1.0, float(fh), float(fw)], np.float32),
                               "scales")
    roi = b.add_initializer(np.zeros(0, np.float32), "roi")
    out = b.emit("Resize", [x, roi, scales],
                 attrs={"mode": "nearest", "nearest_mode": "floor",
                        "coordinate_transformation_mode": "asymmetric"},
                 hint="resize")
    b.record(rs_eqn.outvars[0], ("g", out, (0, 3, 1, 2)))


def _process_eqn(b: _Builder, eqn, skip, resize):
    p = eqn.primitive.name
    if id(eqn) in skip:  # interior of a matched upsample chain
        return
    if id(eqn) in resize:
        _emit_resize(b, eqn, resize[id(eqn)])
        return

    # inline nested jit / remat / custom derivatives
    sub, consts = _inline_call_params(eqn)
    if sub is not None:
        for cv, cval in zip(sub.constvars, consts):
            b.record(cv, ("c", _np(cval)))
        for inner, outer in zip(sub.invars, eqn.invars):
            b.record(inner, b.rec_of(outer))
        inner_skip, inner_resize = _find_upsample_chains(sub.eqns)
        for ieqn in sub.eqns:
            _process_eqn(b, ieqn, inner_skip, inner_resize)
        for inner, outer in zip(sub.outvars, eqn.outvars):
            b.record(outer, b.rec_of(inner))
        return

    if all(b.is_const(v) for v in eqn.invars) and _FOLDABLE and \
            not eqn.primitive.multiple_results:
        _fold(b, eqn)
        return

    if p in ("stop_gradient", "copy", "device_put"):
        b.record(eqn.outvars[0], b.rec_of(eqn.invars[0]))
        return

    if p == "convert_element_type":
        names, perm = b.align(eqn.invars)
        to = proto.onnx_dtype(np.dtype(eqn.params["new_dtype"]))
        out = b.emit("Cast", names, attrs={"to": to}, hint="cast")
        b.record(eqn.outvars[0], ("g", out, perm))
        return

    if p in _ELTWISE:
        names, perm = b.align(eqn.invars)
        out = b.emit(_ELTWISE[p], names, hint=p)
        b.record(eqn.outvars[0], ("g", out, perm))
        return

    if p in _UNARY and _UNARY[p]:
        names, perm = b.align(eqn.invars)
        out = b.emit(_UNARY[p], names, hint=p)
        b.record(eqn.outvars[0], ("g", out, perm))
        return

    if p in ("ne", "not"):
        names, perm = b.align(eqn.invars)
        if p == "ne":
            e = b.emit("Equal", names, hint="eq")
            out = b.emit("Not", [e], hint="ne")
        else:
            out = b.emit("Not", names, hint="not")
        b.record(eqn.outvars[0], ("g", out, perm))
        return

    if p == "rsqrt":
        names, perm = b.align(eqn.invars)
        s = b.emit("Sqrt", names, hint="sqrt")
        out = b.emit("Reciprocal", [s], hint="rsqrt")
        b.record(eqn.outvars[0], ("g", out, perm))
        return

    if p == "log1p":
        names, perm = b.align(eqn.invars)
        one = b.add_initializer(np.array(1.0, np.float32))
        a = b.emit("Add", [names[0], one], hint="l1p_a")
        out = b.emit("Log", [a], hint="log1p")
        b.record(eqn.outvars[0], ("g", out, perm))
        return

    if p == "integer_pow":
        names, perm = b.align(eqn.invars)
        y = int(eqn.params["y"])
        if y == 2:
            out = b.emit("Mul", [names[0], names[0]], hint="sq")
        else:
            e = b.add_initializer(np.array(float(y), np.float32))
            out = b.emit("Pow", [names[0], e], hint="pow")
        b.record(eqn.outvars[0], ("g", out, perm))
        return

    if p == "select_n":
        if len(eqn.invars) != 3:
            raise UnsupportedPrimitive("select_n with >2 cases")
        names, perm = b.align(eqn.invars)
        out = b.emit("Where", [names[0], names[2], names[1]], hint="where")
        b.record(eqn.outvars[0], ("g", out, perm))
        return

    if p == "conv_general_dilated":
        _conv(b, eqn)
        return

    if p == "reduce_window_max":
        _maxpool(b, eqn)
        return

    if p == "dot_general":
        _dot_general(b, eqn)
        return

    if p == "concatenate":
        axis = eqn.params["dimension"]
        names, perm = b.align(eqn.invars)
        ax = perm.index(axis) if perm is not None else axis
        out = b.emit("Concat", names, attrs={"axis": int(ax)}, hint="cat")
        b.record(eqn.outvars[0], ("g", out, perm))
        return

    if p == "broadcast_in_dim":
        _broadcast(b, eqn)
        return

    if p == "reshape":
        dims = eqn.params.get("dimensions")
        perm_in = tuple(dims) if dims is not None else None
        x = b.get(eqn.invars[0], perm_in)
        out = b.emit("Reshape", [x, b.i64(list(eqn.params["new_sizes"]))], hint="reshape")
        b.record(eqn.outvars[0], ("g", out, None))
        return

    if p == "slice":
        if any(s != 1 for s in (eqn.params.get("strides") or [])):
            strides = list(eqn.params["strides"])
        else:
            strides = [1] * len(eqn.params["start_indices"])
        perm = b.perm_of(eqn.invars[0])
        x = b.get(eqn.invars[0], perm)
        starts = list(eqn.params["start_indices"])
        ends = list(eqn.params["limit_indices"])
        if perm is not None:
            starts = [starts[d] for d in perm]
            ends = [ends[d] for d in perm]
            strides = [strides[d] for d in perm]
        out = b.emit("Slice", [x, b.i64(starts, "starts"), b.i64(ends, "ends"),
                               b.i64(list(range(len(starts))), "axes"),
                               b.i64(strides, "steps")], hint="slice")
        b.record(eqn.outvars[0], ("g", out, perm))
        return

    if p == "pad":
        cfg = eqn.params["padding_config"]
        if any(i != 0 for _, _, i in cfg):
            raise UnsupportedPrimitive("interior padding")
        if any(lo < 0 or hi < 0 for lo, hi, _ in cfg):
            raise UnsupportedPrimitive("negative padding")
        perm = b.perm_of(eqn.invars[0])
        x = b.get(eqn.invars[0], perm)
        order = perm or range(len(cfg))
        pads = [cfg[d][0] for d in order] + [cfg[d][1] for d in order]
        cval = b.get(eqn.invars[1], None, hint="padv")
        out = b.emit("Pad", [x, b.i64(pads, "pads"), cval], hint="pad")
        b.record(eqn.outvars[0], ("g", out, perm))
        return

    if p in ("reduce_sum", "reduce_max", "reduce_min", "reduce_prod"):
        axes = list(eqn.params["axes"])
        x = b.get(eqn.invars[0], None)
        op = {"reduce_sum": "ReduceSum", "reduce_max": "ReduceMax",
              "reduce_min": "ReduceMin", "reduce_prod": "ReduceProd"}[p]
        if op == "ReduceSum":  # opset 13: axes is an input
            out = b.emit(op, [x, b.i64(axes, "axes")], attrs={"keepdims": 0}, hint="rsum")
        else:
            out = b.emit(op, [x], attrs={"axes": axes, "keepdims": 0}, hint="rmax")
        b.record(eqn.outvars[0], ("g", out, None))
        return

    if p == "transpose":
        permutation = tuple(eqn.params["permutation"])
        rec = b.rec_of(eqn.invars[0])
        if rec[0] in ("c", "bc"):
            b.record(eqn.outvars[0],
                     ("c", np.transpose(b.const_value(eqn.invars[0], full=True),
                                        permutation)))
            return
        _, name, p_old = rec
        ndim = len(permutation)
        p_old = p_old or tuple(range(ndim))
        inv = [0] * ndim
        for j, d in enumerate(permutation):
            inv[d] = j
        p_new = tuple(inv[d] for d in p_old)
        b.record(eqn.outvars[0],
                 ("g", name, None if p_new == tuple(range(ndim)) else p_new))
        return

    if p == "squeeze":
        x = b.get(eqn.invars[0], None)
        out = b.emit("Reshape", [x, b.i64(list(eqn.outvars[0].aval.shape))],
                     hint="squeeze")
        b.record(eqn.outvars[0], ("g", out, None))
        return

    raise UnsupportedPrimitive(
        f"primitive '{p}' has no ONNX lowering (params: {list(eqn.params)})")


def to_onnx(fn, *example_args, input_names=None, output_names=None,
            model_name="yolov5_tpu", doc="", metadata=None) -> bytes:
    """Trace ``fn(*example_args)`` and serialize it as an ONNX model."""
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    b = _Builder()

    flat_in, _ = jax.tree.flatten(example_args)
    input_names = input_names or [f"input_{i}" for i in range(len(jaxpr.invars))]
    graph_inputs = []
    for name, var, ex in zip(input_names, jaxpr.invars, flat_in):
        b.record(var, ("g", name, None))
        graph_inputs.append(proto.value_info(
            name, proto.onnx_dtype(np.dtype(ex.dtype)), list(var.aval.shape)))

    for cv, cval in zip(jaxpr.constvars, closed.consts):
        b.record(cv, ("c", _np(cval)))

    skip, resize = _find_upsample_chains(jaxpr.eqns)
    for eqn in jaxpr.eqns:
        _process_eqn(b, eqn, skip, resize)

    output_names = output_names or [f"output_{i}" for i in range(len(jaxpr.outvars))]
    graph_outputs = []
    for name, var in zip(output_names, jaxpr.outvars):
        rec = b.rec_of(var)
        if rec[0] in ("c", "bc"):
            cname = b.add_initializer(
                np.ascontiguousarray(b.const_value(var, full=True)), "out_const")
            b.emit("Identity", [cname], outputs=[name])
        else:
            flat_name = b.get(var, None)
            if flat_name != name:
                b.emit("Identity", [flat_name], outputs=[name])
        graph_outputs.append(proto.value_info(
            name, proto.onnx_dtype(np.dtype(var.aval.dtype)), list(var.aval.shape)))

    g = proto.graph(b.nodes, model_name, graph_inputs, graph_outputs,
                    b.initializers)
    return proto.model(g, opset=13, doc=doc, metadata=metadata)
