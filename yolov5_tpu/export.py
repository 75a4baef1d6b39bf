"""Model export pipeline.

The reference ships a 12-format exporter built around torch tracing
(/root/reference/export.py). The JAX-native equivalents:

| format       | artifact                      | via                     |
|--------------|-------------------------------|-------------------------|
| ckpt         | .ckpt msgpack (fused, EMA)    | native                  |
| stablehlo    | .stablehlo serialized module  | jax.export              |
| saved_model  | TF SavedModel dir             | jax2tf                  |
| tflite       | .tflite flatbuffer (+int8)    | TFLiteConverter         |
| onnx         | .onnx (opset 13, NCHW graph)  | yolov5_tpu.onnx (native)|

ONNX needs no external toolchain: yolov5_tpu/onnx/ traces the jaxpr and
emits the protobuf directly (verified against torch's serializer and an
in-house mini-runtime — see tests/test_onnx.py). TensorRT / CoreML /
OpenVINO / paddle need toolchains absent from this zero-egress image;
`export_formats()` reports them unavailable with the reason instead of
failing cryptically (the reference's try_export contract,
export.py:182-221). StableHLO is the portable interchange format here — it
is what those toolchains increasingly consume.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def export_formats():
    """Format table: (name, suffix, available, note)."""
    try:
        import tensorflow  # noqa: F401

        tf_ok, tf_note = True, ""
    except ImportError:
        tf_ok, tf_note = False, "tensorflow not installed"
    return [
        ("ckpt", ".ckpt", True, "native inference checkpoint (fused)"),
        ("stablehlo", ".stablehlo", True, "jax.export serialized StableHLO"),
        ("saved_model", "_saved_model", tf_ok, tf_note or "jax2tf"),
        ("pb", ".pb", tf_ok, tf_note or "frozen GraphDef"),
        ("tflite", ".tflite", tf_ok, tf_note or "fp16/int8"),
        ("onnx", ".onnx", True, "native jaxpr->ONNX emitter (opset 13)"),
        ("engine", ".engine", False, "TensorRT is CUDA-only; n/a on TPU"),
        ("coreml", ".mlmodel", False, "coremltools unavailable"),
        ("openvino", "_openvino_model", False, "openvino unavailable"),
        ("paddle", "_paddle_model", False, "paddle unavailable"),
    ]


def try_export(fn):
    """Isolate per-format failures, report size+time (reference export.py:182)."""

    def wrapper(*args, **kwargs):
        name = fn.__name__.replace("export_", "")
        t0 = time.time()
        try:
            out = fn(*args, **kwargs)
            p = Path(out)
            size = (sum(f.stat().st_size for f in p.rglob("*")) if p.is_dir()
                    else p.stat().st_size) / 1e6
            print(f"export {name}: ok, {out} ({size:.1f} MB, {time.time() - t0:.1f}s)")
            return out
        except Exception as e:
            print(f"export {name}: FAILED after {time.time() - t0:.1f}s: {e}")
            return None

    return wrapper


def _build_forward(weights, cfg, imgsz, batch_size, with_nms=False,
                   conf_thres=0.25, iou_thres=0.45, max_det=100,
                   normalize_boxes=False):
    """(fn, variables, example input, model) for export: uint8 NHWC in,
    decoded (bs, N, no) out (or NMS'd padded boxes).

    normalize_boxes: divide xywh by imgsz so every output channel lies in
    ~[0, 1] — required for int8 quantization, where per-tensor scales cannot
    represent pixel coords and confidences in one tensor (the reference's
    TFDetect normalizes for exactly this reason, models/tf.py xy/=imgsz);
    the TFLite backend rescales on load."""
    from yolov5_tpu.infer import Detector
    from yolov5_tpu.ops.nms import non_max_suppression

    det = Detector(weights, cfg=cfg, imgsz=imgsz, fuse=True)
    model, variables = det.model, det.variables
    # export the canonical graph: the phase-packed stem (layers.Conv.pack)
    # is a TPU runtime optimization; exported artifacts stay portable
    model.module = model.module.clone(packed_stem=False)

    def forward(images):
        x = images.astype(jnp.float32) / 255.0
        maps = model.module.apply(variables, x, train=False)
        if normalize_boxes:
            # normalize PER LEVEL inside decode (anchors/stride pre-divided
            # by imgsz) so no pixel-range tensor exists anywhere near the
            # output: TFLite's scale propagation pins one per-tensor scale
            # across concat/slice chains, and a post-concat divide leaves a
            # pixel-space tensor pinned to a 0-1 scale (saturating boxes)
            from yolov5_tpu.models.layers import decode as _decode

            anchors_n = [np.asarray(a, np.float32) / imgsz
                         for a in model.anchors]
            strides_n = [float(s) / imgsz for s in model.stride]
            pred = _decode(maps, anchors_n, strides_n, jnp.float32,
                           nc=model.nc)
        else:
            pred = model.decode(maps)
        if not with_nms:
            return pred
        d = non_max_suppression(pred, conf_thres=conf_thres,
                                iou_thres=iou_thres, max_det=max_det,
                                max_nms=1024)
        return d.boxes, d.scores, d.classes.astype(jnp.int32), d.valid

    example = jnp.zeros((batch_size, imgsz, imgsz, 3), jnp.uint8)
    return forward, variables, example, model


@try_export
def export_ckpt(forwardless, file):
    """Fused inference checkpoint (the strip_optimizer equivalent)."""
    from flax import serialization

    det_model, variables, meta = forwardless
    payload = {
        "params": jax.tree.map(np.asarray, variables["params"]),
        "batch_stats": jax.tree.map(np.asarray, variables.get("batch_stats", {})),
        "ema_params": None, "ema_stats": None, "fused": True,
    }
    file = Path(file)
    file.write_bytes(serialization.msgpack_serialize(payload))
    Path(str(file) + ".json").write_text(json.dumps(meta, indent=1, default=str))
    return file


@try_export
def export_stablehlo(forward, example, file):
    exp = jax.export.export(jax.jit(forward))(example)
    data = exp.serialize()
    file = Path(file)
    file.write_bytes(data)
    # also drop readable MLIR alongside
    Path(str(file) + ".mlir").write_text(exp.mlir_module())
    return file


@try_export
def export_onnx(forward, example, file, meta=None):
    """ONNX via the in-house jaxpr converter (yolov5_tpu/onnx/) — the image
    has no onnx package, so the protobuf is emitted directly (reference
    export.py:327-372 does this through torch.onnx + the onnx pip pkg)."""
    from yolov5_tpu.onnx import to_onnx

    data = to_onnx(forward, example, input_names=["images"],
                   model_name=Path(file).stem,
                   doc="yolov5_tpu ONNX export",
                   metadata={k: json.dumps(v, default=str)
                             for k, v in (meta or {}).items()})
    file = Path(file)
    file.write_bytes(data)
    return file


@try_export
def export_saved_model(forward, example, file):
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fn = tf.function(
        # multi-platform lowering: the artifact must run on CPU servers and
        # TFLite, not just the TPU this process happens to sit on
        jax2tf.convert(forward, with_gradient=False,
                       native_serialization_platforms=("cpu", "tpu")),
        autograph=False,
        input_signature=[tf.TensorSpec(example.shape, tf.uint8, name="images")],
    )
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, str(file))
    return file


@try_export
def export_pb(forward, example, file):
    """Frozen TensorFlow GraphDef (reference export.py:793-816 keras2pb):
    the jax2tf function's concrete graph with variables folded to constants,
    written as a binary .pb. Loadable via wrap_function/import_graph_def —
    the Detector's .pb backend does exactly that."""
    import tensorflow as tf
    from jax.experimental import jax2tf
    from tensorflow.python.framework.convert_to_constants import (
        convert_variables_to_constants_v2,
    )

    tf_fn = tf.function(
        jax2tf.convert(forward, with_gradient=False,
                       native_serialization_platforms=("cpu", "tpu")),
        autograph=False,
        input_signature=[tf.TensorSpec(example.shape, tf.uint8, name="images")],
    )
    frozen = convert_variables_to_constants_v2(tf_fn.get_concrete_function())
    frozen.graph.as_graph_def()
    file = Path(file)
    tf.io.write_graph(graph_or_graph_def=frozen.graph,
                      logdir=str(file.parent), name=file.name, as_text=False)
    return file


def gd_outputs(gd):
    """Output node names of a GraphDef: nodes nobody consumes, minus NoOps
    (the reference's ultralytics gd_outputs, models/common.py:599)."""
    name_list, input_list = [], []
    for node in gd.node:
        name_list.append(node.name)
        input_list.extend(node.input)
    return sorted(f"{x}:0" for x in list(set(name_list) - set(input_list))
                  if not x.startswith("NoOp"))


@try_export
def export_tflite(saved_model_dir, file, int8=False, rep_data=None):
    import tensorflow as tf

    conv = tf.lite.TFLiteConverter.from_saved_model(str(saved_model_dir))
    conv.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    if int8:
        conv.optimizations = [tf.lite.Optimize.DEFAULT]
        if rep_data is not None:
            def rep():
                for x in rep_data:
                    yield [x]
            conv.representative_dataset = rep
    data = conv.convert()
    Path(file).write_bytes(data)
    return Path(file)


def _representative_images(data, shape, n=100):
    """Up to n letterboxed uint8 batches from the dataset's train split for
    int8 calibration (reference export.py:819-860 representative dataset)."""
    try:
        from yolov5_tpu.data.letterbox import letterbox
        from yolov5_tpu.utils.general import check_dataset

        data_dict = check_dataset(data)
        split = data_dict.get("train") or data_dict.get("val")
        import glob as _glob

        from pathlib import Path as _P

        root = _P(split)
        files = sorted(
            f for f in (root.rglob("*") if root.is_dir()
                        else map(_P, _glob.glob(str(root))))
            if f.suffix.lower() in {".jpg", ".jpeg", ".png", ".bmp"})[:n]
        if not files:
            return None
        import cv2

        bs, s = shape[0], shape[1]
        out = []
        for f in files:
            im = cv2.imread(str(f))
            if im is None:
                continue
            lb = letterbox(im[..., ::-1], (s, s))[0]
            out.append(np.broadcast_to(lb[None], shape).astype(np.uint8).copy())
        return out or None
    except Exception as e:
        print(f"int8 calibration data unavailable ({e}); using random")
        return None


def run(weights="", cfg="yolov5s", imgsz=640, batch_size=1,
        include=("ckpt", "stablehlo"), with_nms=False, int8=False,
        output_dir=None, name=None, data=None):
    """Export orchestrator (reference export.py run(), :1285-1488).

    data: dataset yaml — when given with int8, the TFLite calibration uses
    up to 100 REAL letterboxed images from its train split (the reference's
    representative_dataset_gen, export.py:819-860) instead of random noise.
    """
    avail = {n: ok for n, _, ok, _ in export_formats()}
    for fmt in include:
        if fmt not in avail:
            raise ValueError(f"unknown format {fmt}")
        if not avail[fmt]:
            note = next(x[3] for x in export_formats() if x[0] == fmt)
            print(f"skipping {fmt}: {note}")
    include = [f for f in include if avail[f]]

    forward, variables, example, model = _build_forward(
        weights, cfg, imgsz, batch_size, with_nms=with_nms)
    stem = name or (Path(weights).stem if weights else str(cfg))
    out_dir = Path(output_dir or (Path(weights).parent if weights else "runs/export"))
    out_dir.mkdir(parents=True, exist_ok=True)

    meta = {"cfg": model.cfg if isinstance(model.cfg, dict) else str(model.cfg),
            "nc": model.nc, "names": model.names, "stride": list(model.stride),
            "imgsz": imgsz, "with_nms": with_nms, "format": "yolov5_tpu-export"}
    artifacts = {}
    if "ckpt" in include:
        artifacts["ckpt"] = export_ckpt((model, variables, meta),
                                        out_dir / f"{stem}.fused.ckpt")
    if "stablehlo" in include:
        artifacts["stablehlo"] = export_stablehlo(forward, example,
                                                  out_dir / f"{stem}.stablehlo")
        if artifacts["stablehlo"]:
            Path(str(artifacts["stablehlo"]) + ".json").write_text(
                json.dumps(meta, indent=1, default=str))
    if "onnx" in include:
        artifacts["onnx"] = export_onnx(forward, example,
                                        out_dir / f"{stem}.onnx", meta=meta)
    sm_dir = None
    # int8 tflite builds its own normalized-box saved_model below; only
    # export the fp32 one when it is itself requested or fp32 tflite needs it
    if "saved_model" in include or ("tflite" in include and not int8):
        sm_dir = export_saved_model(forward, example, out_dir / f"{stem}_saved_model")
        artifacts["saved_model"] = sm_dir
        if sm_dir:
            (Path(sm_dir) / "yolov5_tpu_meta.json").write_text(
                json.dumps(meta, indent=1, default=str))
    if "pb" in include:
        artifacts["pb"] = export_pb(forward, example, out_dir / f"{stem}.pb")
        if artifacts["pb"]:
            Path(str(artifacts["pb"]) + ".json").write_text(
                json.dumps(meta, indent=1, default=str))
    if "tflite" in include and (sm_dir or int8):
        rep = None
        src_dir = sm_dir
        tfl_meta = meta
        if int8:
            rep = _representative_images(data, example.shape) if data else None
            if rep is None:
                rng = np.random.default_rng(0)
                rep = [rng.integers(0, 255, example.shape,
                                    dtype=np.uint8).astype(np.uint8)
                       for _ in range(8)]
            # int8 needs the normalized-box graph (see _build_forward)
            fwd_n, _, _, _ = _build_forward(weights, cfg, imgsz, batch_size,
                                            with_nms=with_nms,
                                            normalize_boxes=True)
            src_dir = export_saved_model(fwd_n, example,
                                         out_dir / f"{stem}_saved_model_int8")
            tfl_meta = dict(meta, normalized=True)
        if src_dir:
            artifacts["tflite"] = export_tflite(
                src_dir, out_dir / f"{stem}{'-int8' if int8 else ''}.tflite",
                int8=int8, rep_data=rep)
        if artifacts.get("tflite"):
            Path(str(artifacts["tflite"]) + ".json").write_text(
                json.dumps(tfl_meta, indent=1, default=str))
    return artifacts
