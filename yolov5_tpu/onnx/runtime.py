"""Mini ONNX runtime (numpy/torch CPU) for the op subset this framework emits.

Two jobs:
  1. verify exported models numerically against the JAX forward
     (tests/test_onnx.py) — the image has no onnxruntime;
  2. back the ``.onnx`` suffix in :class:`yolov5_tpu.infer.Detector`, the
     DetectMultiBackend analog (reference models/common.py:519-531 runs
     ONNX via onnxruntime).

torch (CPU) provides the conv/pool kernels; everything else is numpy.
Only ops produced by :mod:`yolov5_tpu.onnx.convert` are implemented — this
is a verification/portability tool, not a general runtime (XLA is the
production path).
"""

from __future__ import annotations

import numpy as np

from . import proto


def _torch():
    import torch
    return torch


def _conv(x, w, *b_, attrs):
    torch = _torch()
    pads = attrs.get("pads", [0, 0, 0, 0])
    n = len(pads) // 2
    lo, hi = pads[:n], pads[n:]
    xt = torch.from_numpy(np.ascontiguousarray(x))
    if lo != hi:  # torch conv wants symmetric padding; pre-pad instead
        pad = []
        for i in reversed(range(n)):
            pad += [lo[i], hi[i]]
        xt = torch.nn.functional.pad(xt, pad)
        padding = 0
    else:
        padding = tuple(lo)
    out = torch.nn.functional.conv2d(
        xt, torch.from_numpy(np.ascontiguousarray(w)),
        bias=torch.from_numpy(np.ascontiguousarray(b_[0])) if b_ else None,
        stride=tuple(attrs.get("strides", [1] * n)),
        padding=padding,
        dilation=tuple(attrs.get("dilations", [1] * n)),
        groups=attrs.get("group", 1),
    )
    return out.numpy()


def _maxpool(x, attrs):
    torch = _torch()
    pads = attrs.get("pads", [0, 0, 0, 0])
    n = len(pads) // 2
    lo, hi = pads[:n], pads[n:]
    xt = torch.from_numpy(np.ascontiguousarray(x))
    if any(pads):
        pad = []
        for i in reversed(range(n)):
            pad += [lo[i], hi[i]]
        xt = torch.nn.functional.pad(xt, pad, value=float("-inf"))
    out = torch.nn.functional.max_pool2d(
        xt, kernel_size=tuple(attrs["kernel_shape"]),
        stride=tuple(attrs.get("strides", attrs["kernel_shape"])))
    return out.numpy()


def _resize(x, roi, scales, attrs):
    assert attrs.get("mode", "nearest") == "nearest"
    fh, fw = int(scales[2]), int(scales[3])
    return np.repeat(np.repeat(x, fh, axis=2), fw, axis=3)


def _slice(x, starts, ends, axes=None, steps=None):
    nd = x.ndim
    axes = list(range(nd)) if axes is None else [int(a) % nd for a in axes]
    steps = [1] * len(starts) if steps is None else [int(s) for s in steps]
    sl = [slice(None)] * nd
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        st, en = int(st), int(en)
        en = min(en, x.shape[ax]) if en >= 0 else en
        sl[ax] = slice(st, en, sp)
    return x[tuple(sl)]


def _pad(x, pads, value=None):
    n = x.ndim
    lo, hi = pads[:n], pads[n:]
    cv = float(value) if value is not None and np.ndim(value) == 0 else \
        (float(np.asarray(value).reshape(())) if value is not None else 0.0)
    return np.pad(x, list(zip(lo, hi)), constant_values=cv)


def _reshape(x, shape):
    shape = [int(s) for s in shape]
    shape = [x.shape[i] if s == 0 else s for i, s in enumerate(shape)]
    return x.reshape(shape)


class Runtime:
    """Execute a parsed ONNX model: ``Runtime(model_bytes)(images=...)``."""

    def __init__(self, model_bytes: bytes):
        self.model = proto.parse_model(model_bytes)
        self.graph = self.model.graph
        # own the initializer buffers: parse_model returns views into the
        # input bytes, which torch refuses as non-writable tensors
        self.graph.initializers = {
            k: np.array(v) for k, v in self.graph.initializers.items()}
        self.input_names = [n for n, _, _ in self.graph.inputs]
        self.output_names = [n for n, _, _ in self.graph.outputs]

    def __call__(self, *args, **feeds):
        env: dict[str, np.ndarray] = dict(self.graph.initializers)
        for name, val in zip(self.input_names, args):
            feeds[name] = val
        for name in self.input_names:
            if name not in feeds:
                raise ValueError(f"missing input {name!r}")
            env[name] = np.asarray(feeds[name])
        for node in self.graph.nodes:
            ins = [env[i] for i in node.inputs if i]
            out = self._run_node(node, ins)
            outs = out if isinstance(out, (list, tuple)) else [out]
            for name, val in zip(node.outputs, outs):
                env[name] = np.asarray(val)
        return [env[n] for n in self.output_names]

    def _run_node(self, node: proto.Node, ins):
        op, a = node.op_type, node.attrs
        if op == "Conv":
            return _conv(*ins, attrs=a)
        if op == "MaxPool":
            return _maxpool(ins[0], a)
        if op == "Resize":
            return _resize(*ins, attrs=a)
        if op == "Sigmoid":
            return 1.0 / (1.0 + np.exp(-ins[0].astype(np.float64))) \
                .astype(ins[0].dtype)
        if op == "Mul":
            return ins[0] * ins[1]
        if op == "Add":
            return ins[0] + ins[1]
        if op == "Sub":
            return ins[0] - ins[1]
        if op == "Div":
            return ins[0] / ins[1]
        if op == "Max":
            return np.maximum(ins[0], ins[1])
        if op == "Min":
            return np.minimum(ins[0], ins[1])
        if op == "Pow":
            return np.power(ins[0], ins[1]).astype(ins[0].dtype)
        if op == "Sqrt":
            return np.sqrt(ins[0])
        if op == "Reciprocal":
            return 1.0 / ins[0]
        if op == "Exp":
            return np.exp(ins[0])
        if op == "Log":
            return np.log(ins[0])
        if op == "Tanh":
            return np.tanh(ins[0])
        if op == "Neg":
            return -ins[0]
        if op == "Abs":
            return np.abs(ins[0])
        if op == "Floor":
            return np.floor(ins[0])
        if op == "Ceil":
            return np.ceil(ins[0])
        if op == "Sign":
            return np.sign(ins[0])
        if op == "Where":
            return np.where(ins[0], ins[1], ins[2])
        if op == "Greater":
            return ins[0] > ins[1]
        if op == "GreaterOrEqual":
            return ins[0] >= ins[1]
        if op == "Less":
            return ins[0] < ins[1]
        if op == "LessOrEqual":
            return ins[0] <= ins[1]
        if op == "Equal":
            return ins[0] == ins[1]
        if op == "Not":
            return ~ins[0]
        if op == "And":
            return ins[0] & ins[1]
        if op == "Or":
            return ins[0] | ins[1]
        if op == "Xor":
            return ins[0] ^ ins[1]
        if op == "Cast":
            return ins[0].astype(proto.np_dtype(a["to"]))
        if op == "Concat":
            return np.concatenate(ins, axis=a["axis"])
        if op == "Reshape":
            return _reshape(ins[0], ins[1])
        if op == "Transpose":
            return np.transpose(ins[0], a["perm"])
        if op == "Slice":
            return _slice(*ins)
        if op == "Pad":
            return _pad(ins[0], [int(v) for v in ins[1]],
                        ins[2] if len(ins) > 2 else None)
        if op == "Expand":
            return np.broadcast_to(ins[0], np.broadcast_shapes(
                ins[0].shape, tuple(int(s) for s in ins[1])))
        if op == "MatMul":
            return np.matmul(ins[0], ins[1])
        if op == "Gemm":
            alpha, beta = a.get("alpha", 1.0), a.get("beta", 1.0)
            x = ins[0].T if a.get("transA") else ins[0]
            w = ins[1].T if a.get("transB") else ins[1]
            out = alpha * (x @ w)
            return out + beta * ins[2] if len(ins) > 2 else out
        if op in ("ReduceSum", "ReduceMax", "ReduceMin", "ReduceProd"):
            fn = {"ReduceSum": np.sum, "ReduceMax": np.max,
                  "ReduceMin": np.min, "ReduceProd": np.prod}[op]
            axes = a.get("axes")
            if axes is None and len(ins) > 1:
                axes = [int(v) for v in ins[1]]
            keep = bool(a.get("keepdims", 1))
            return fn(ins[0], axis=tuple(axes) if axes else None, keepdims=keep)
        if op == "Softmax":
            ax = a.get("axis", -1)
            e = np.exp(ins[0] - np.max(ins[0], axis=ax, keepdims=True))
            return e / np.sum(e, axis=ax, keepdims=True)
        if op == "Clip":
            lo = ins[1] if len(ins) > 1 else None
            hi = ins[2] if len(ins) > 2 else None
            return np.clip(ins[0], lo, hi)
        if op == "Identity":
            return ins[0]
        if op == "BatchNormalization":
            x, scale, bias, mean, var = ins
            eps = a.get("epsilon", 1e-5)
            shape = [1, -1] + [1] * (x.ndim - 2)
            return (x - mean.reshape(shape)) / np.sqrt(var.reshape(shape) + eps) \
                * scale.reshape(shape) + bias.reshape(shape)
        raise NotImplementedError(f"mini-runtime: op {op!r}")
