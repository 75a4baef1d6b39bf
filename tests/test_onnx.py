"""ONNX stack: protobuf codec, jaxpr->ONNX converter, mini-runtime.

The image has no ``onnx``/``onnxruntime``, so correctness is pinned two ways:
  1. the wire codec is cross-validated against torch's C++ ONNX serializer
     (parse a torch-exported model with OUR reader);
  2. exported models are executed by the in-house mini-runtime and compared
     numerically against the JAX forward.
Reference contract being reproduced: export.py:327-372 (ONNX) and
models/common.py:519-531 (ONNX inference backend).
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov5_tpu.onnx import proto, to_onnx
from yolov5_tpu.onnx.runtime import Runtime


def _ops(model_bytes):
    g = proto.parse_model(model_bytes).graph
    return [n.op_type for n in g.nodes]


# ---------------------------------------------------------------------------
# codec


def test_reader_parses_torch_serialized_onnx():
    """Field-number ground truth: torch's C++ exporter writes real ONNX
    protobuf; our reader must decode it exactly."""
    torch = pytest.importorskip("torch")
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    onnx_proto_utils._add_onnxscript_fn = lambda p, c: p  # skip onnx import
    m = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, stride=2, padding=1),
        torch.nn.BatchNorm2d(8),
        torch.nn.SiLU(),
    ).eval()
    buf = io.BytesIO()
    torch.onnx.export(m, torch.zeros(1, 3, 32, 32), buf, opset_version=13,
                      input_names=["images"], output_names=["out"], dynamo=False)
    model = proto.parse_model(buf.getvalue())
    assert model.producer == "pytorch"
    assert model.opset == 13
    g = model.graph
    assert [n for n, _, _ in g.inputs] == ["images"]
    assert g.inputs[0][1] == proto.FLOAT and g.inputs[0][2] == [1, 3, 32, 32]
    ops = [n.op_type for n in g.nodes]
    assert ops == ["Conv", "Sigmoid", "Mul"]  # torch folds the BN
    conv = g.nodes[0]
    assert conv.attrs["strides"] == [2, 2] and conv.attrs["pads"] == [1, 1, 1, 1]
    w = g.initializers[conv.inputs[1]]
    assert w.shape == (8, 3, 3, 3) and w.dtype == np.float32


def test_writer_reader_roundtrip():
    w = np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)
    nodes = [
        proto.node("Conv", ["x", "w"], ["y"], name="c0",
                   attrs={"strides": [1, 1], "pads": [0, 0, 0, 0], "group": 1}),
        proto.node("Sigmoid", ["y"], ["out"], name="s0"),
    ]
    g = proto.graph(nodes, "tiny",
                    [proto.value_info("x", proto.FLOAT, [1, 3, 4, 4])],
                    [proto.value_info("out", proto.FLOAT, [1, 2, 3, 3])],
                    [proto.tensor("w", w)])
    data = proto.model(g, opset=13, metadata={"stride": "32"})
    m = proto.parse_model(data)
    assert m.opset == 13 and m.ir_version == 8
    assert m.metadata == {"stride": "32"}
    assert [n.op_type for n in m.graph.nodes] == ["Conv", "Sigmoid"]
    assert m.graph.nodes[0].attrs["strides"] == [1, 1]
    np.testing.assert_array_equal(m.graph.initializers["w"], w)
    assert m.graph.outputs[0] == ("out", proto.FLOAT, [1, 2, 3, 3])


def test_negative_int_attribute_roundtrip():
    n = proto.parse_wire(proto.node("Concat", ["a"], ["b"], attrs={"axis": -1}))
    name, val = proto._parse_attribute(n[5][0])
    assert name == "axis" and val == -1


# ---------------------------------------------------------------------------
# converter + runtime vs JAX


def _export_and_check(fwd, example, atol, rtol, n_outputs=1):
    data = to_onnx(fwd, example, input_names=["images"])
    rt = Runtime(data)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, example.shape, np.uint8).astype(example.dtype)
    ref = jax.jit(fwd)(jnp.asarray(img))
    refs = [np.asarray(r) for r in (ref if isinstance(ref, (tuple, list)) else [ref])]
    outs = rt(img)
    assert len(outs) == len(refs) == n_outputs
    for r, o in zip(refs, outs):
        assert r.shape == o.shape
        np.testing.assert_allclose(o, r, atol=atol, rtol=rtol)
    return data


def test_detect_export_matches_jax():
    from yolov5_tpu.models.yolo import DetectionModel

    m = DetectionModel("yolov5n", fused=True)
    v = m.variables

    def fwd(img):
        x = img.astype(jnp.float32) / 255.0
        return m.decode(m.apply(v, x, train=False))

    data = _export_and_check(fwd, jnp.zeros((1, 160, 160, 3), jnp.uint8),
                             atol=2e-3, rtol=2e-3)
    ops = _ops(data)
    # layout pass: NCHW-native graph, upsamples matched to Resize
    assert ops.count("Resize") == 2
    assert "Expand" not in ops
    assert ops.count("Transpose") <= 12
    assert ops.count("Conv") == 60


def test_classify_export_matches_jax():
    from yolov5_tpu.models.yolo import ClassificationModel

    m = ClassificationModel("yolov5n", fused=True)
    v = m.variables

    def fwd(img):
        x = img.astype(jnp.float32) / 255.0
        return m.apply(v, x, train=False)

    _export_and_check(fwd, jnp.zeros((1, 128, 128, 3), jnp.uint8),
                      atol=1e-3, rtol=1e-3)


def test_segment_export_matches_jax():
    from yolov5_tpu.models.yolo import SegmentationModel

    m = SegmentationModel("yolov5n-seg", fused=True)
    v = m.variables

    def fwd(img):
        x = img.astype(jnp.float32) / 255.0
        maps, protos = m.apply(v, x, train=False)
        return m.decode(maps), protos

    _export_and_check(fwd, jnp.zeros((1, 160, 160, 3), jnp.uint8),
                      atol=2e-3, rtol=2e-3, n_outputs=2)


def test_leaky_relu_variant_export():
    """LeakyReLU traces as ge + select_n -> GreaterOrEqual + Where."""
    from yolov5_tpu.models.yolo import DetectionModel

    m = DetectionModel("yolov5s-LeakyReLU", fused=True)
    v = m.variables

    def fwd(img):
        x = img.astype(jnp.float32) / 255.0
        return m.decode(m.apply(v, x, train=False))

    data = _export_and_check(fwd, jnp.zeros((1, 128, 128, 3), jnp.uint8),
                             atol=2e-3, rtol=2e-3)
    ops = _ops(data)
    assert "GreaterOrEqual" in ops and "Where" in ops


def test_small_function_export():
    """Exporter is model-agnostic: any jittable fn over the primitive set."""

    def fn(x):
        y = jnp.concatenate([x, -x], axis=-1)
        y = jnp.maximum(y, 0.1 * y)
        return jnp.tanh(y).sum(axis=(1, 2))

    ex = jnp.ones((2, 8, 8, 3), jnp.float32)
    data = to_onnx(fn, ex)
    out = Runtime(data)(np.linspace(-1, 1, 2 * 8 * 8 * 3, dtype=np.float32)
                        .reshape(2, 8, 8, 3))[0]
    ref = np.asarray(fn(jnp.linspace(-1, 1, 2 * 8 * 8 * 3, dtype=jnp.float32)
                        .reshape(2, 8, 8, 3)))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_const_folding_collapses_decode_grids():
    """iota/arith chains with no data dependence become initializers, not
    runtime subgraphs."""

    def fn(x):
        grid = jnp.stack(jnp.meshgrid(jnp.arange(4.0), jnp.arange(4.0)), -1)
        return x + grid.reshape(1, 4, 4, 2)

    data = to_onnx(fn, jnp.zeros((1, 4, 4, 2), jnp.float32))
    ops = _ops(data)
    assert ops == ["Add"] or ops == ["Add", "Identity"]


def test_cv2_dnn_backend_matches_mini_runtime(tmp_path):
    """A third independent execution engine: OpenCV's DNN module runs the
    exported graph (the reference's --dnn backend, models/common.py:515-517)
    and must agree with both the mini-runtime and JAX."""
    cv2 = pytest.importorskip("cv2")
    if not hasattr(cv2, "dnn"):
        pytest.skip("cv2 built without dnn")

    from yolov5_tpu.export import run as export_run
    from yolov5_tpu.infer import Detector

    arts = export_run(cfg="yolov5n", imgsz=64, include=("onnx",),
                      output_dir=str(tmp_path))
    w = str(arts["onnx"])
    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)

    det_rt = Detector(w)
    det_dnn = Detector(w, dnn=True)
    assert det_rt.backend == "onnx" and det_dnn.backend == "onnx-dnn"
    out_rt = np.asarray(det_rt._forward(None, im), np.float32)
    out_dnn = np.asarray(det_dnn._forward(None, im), np.float32)
    assert out_rt.shape == out_dnn.shape
    np.testing.assert_allclose(out_dnn, out_rt, atol=2e-3, rtol=2e-3)
    # metadata (names/nc) survives the dnn path: parsed via our codec
    assert det_dnn.nc == det_rt.nc
