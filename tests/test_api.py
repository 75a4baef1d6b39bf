"""API-level tests: hub loading, TTA shapes, evolve mutation bounds, COCO
json output, serve handler, export availability table, model_info."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

TINY = {
    "nc": 2,
    "depth_multiple": 0.33,
    "width_multiple": 0.125,
    "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]],
    "backbone": [
        [-1, 1, "Conv", [64, 6, 2, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 1, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 1, "SPPF", [512, 5]],
    ],
    "head": [
        [-1, 1, "Conv", [256, 1, 1]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 4], 1, "Concat", [1]],
        [-1, 1, "C3", [256, False]],
        [[10, 7], 1, "Detect", ["nc", "anchors"]],
    ],
}


def test_hub_list_and_load():
    from yolov5_tpu import hub

    models = hub.list_models()
    assert "yolov5s" in models and "yolov3" in models and "yolov5s-seg" in models
    assert len(models) >= 25


def test_export_formats_table():
    from yolov5_tpu.export import export_formats

    table = {n: ok for n, _, ok, _ in export_formats()}
    assert table["ckpt"] and table["stablehlo"]
    assert not table["engine"]  # TensorRT n/a, reported not crashed


def test_detector_tta(tmp_path):
    from yolov5_tpu.infer import Detector

    det = Detector("", cfg=TINY, imgsz=64, fuse=False)
    im = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    d_plain = det(im, conf_thres=0.0001, max_nms=256, max_det=10)
    d_tta = det(im, conf_thres=0.0001, max_nms=256, max_det=10, augment=True)
    assert d_plain.boxes.shape == d_tta.boxes.shape == (1, 10, 4)


def test_evolve_mutation_bounds(rng):
    from yolov5_tpu.train.evolve import META, mutate, select_parent
    from yolov5_tpu.utils.hyp import load_hyp

    base = load_hyp(None)
    for _ in range(20):
        child = mutate(base, rng)
        for k, (_, lo, hi) in META.items():
            if k in child:
                assert lo <= child[k] <= hi, (k, child[k])
    # parent selection prefers higher fitness
    hist = [(0.1, {"lr0": 0.01}), (0.9, {"lr0": 0.02})]
    picks = [select_parent(hist, rng)["lr0"] for _ in range(50)]
    assert picks.count(0.02) > picks.count(0.01)


def test_model_info():
    from yolov5_tpu.models import DetectionModel
    from yolov5_tpu.utils.profile import model_info

    m = DetectionModel(TINY)
    info = model_info(m, imgsz=64, verbose=False)
    assert info["parameters"] > 1e4
    assert info["layers"] == 12


def test_serve_handler(tmp_path):
    from yolov5_tpu.infer import Detector
    from yolov5_tpu.serve import make_handler
    from http.server import ThreadingHTTPServer

    det = Detector("", cfg=TINY, imgsz=64, fuse=False)
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler({"tiny": det}, api_key="k", conf_thres=0.001))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.loads(r.read())["models"] == ["tiny"]
        # image post
        im = np.random.default_rng(0).integers(0, 255, (80, 60, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".jpg", im)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/object-detection/tiny",
            data=buf.tobytes(), method="POST",
            headers={"X-API-Key": "k", "Content-Type": "image/jpeg"})
        with urllib.request.urlopen(req) as r:
            rows = json.loads(r.read())
        assert isinstance(rows, list)
        for row in rows:
            assert set(row) == {"xmin", "ymin", "xmax", "ymax", "confidence",
                                "class", "name"}
        # bad key
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/object-detection/tiny",
            data=buf.tobytes(), method="POST", headers={"X-API-Key": "wrong"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req2)
        assert e.value.code == 401
    finally:
        server.shutdown()


def test_coco_json_output(tmp_path, rng):
    from yolov5_tpu.data.dataset import create_loader
    from yolov5_tpu.data.synthetic import generate_shapes_dataset
    from yolov5_tpu.eval.evaluator import evaluate
    from yolov5_tpu.models import DetectionModel

    cfg = generate_shapes_dataset(tmp_path / "d", n_images=4, img_size=64, seed=0)
    m = DetectionModel(TINY, nc=3)
    _, loader = create_loader(cfg["train"], img_size=64, batch_size=2,
                              augment=False, workers=1, max_labels=8)
    out = evaluate(m, m.variables, loader, conf_thres=0.0001, max_nms=128,
                   max_det=10, save_json=tmp_path / "preds.json")
    rows = json.loads((tmp_path / "preds.json").read_text())
    assert isinstance(rows, list)
    if rows:
        assert set(rows[0]) == {"image_id", "category_id", "bbox", "score"}
        assert len(rows[0]["bbox"]) == 4


def test_val_speed_and_study_tasks(tmp_path, rng):
    """--task speed / --task study protocols (reference val.py:450,474-528)."""
    import yaml

    from yolov5_tpu.data.synthetic import generate_shapes_dataset
    from yolov5_tpu.eval.evaluator import run_speed, run_study

    cfg = generate_shapes_dataset(tmp_path / "d", n_images=4, img_size=64,
                                  seed=0)
    cfg["nc"] = 3
    data = tmp_path / "d.yaml"
    data.write_text(yaml.safe_dump(
        {k: str(v) for k, v in cfg.items() if k != "names"}
        | {"names": cfg["names"], "nc": 3}))

    res = run_speed(str(data), cfg=TINY, imgsz=64, verbose=False, workers=1,
                    rect=False)
    assert res["speed_total_ms"] > 0 and "map" in res

    out = run_study(str(data), cfg=TINY, imgsz_range=(32, 64, 32),
                    batch_size=2, project=str(tmp_path), name="study",
                    verbose=False, workers=1, rect=False)
    assert len(out) == 2 and out[0]["imgsz"] == 32 and out[1]["imgsz"] == 64
    txts = list((tmp_path / "study").glob("study_*.txt"))
    assert len(txts) == 1
    arr = np.loadtxt(txts[0], ndmin=2)
    assert arr.shape == (2, 8)
    assert (tmp_path / "study" / "study.png").exists()


def test_results_api(tmp_path, rng):
    from PIL import Image

    from yolov5_tpu.infer import Detector
    from yolov5_tpu.results import predict

    det = Detector("", cfg=TINY, imgsz=64, fuse=False)
    arr = rng.integers(0, 255, (100, 80, 3), dtype=np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p)
    pil = Image.fromarray(arr)
    r = predict(det, [str(p), arr, pil], conf_thres=0.0001, max_det=5)
    assert len(r) == 3
    recs = r.records()
    assert len(recs) == 3
    for rec in recs:
        for row in rec:
            assert 0 <= row["xmin"] <= 80 and 0 <= row["ymax"] <= 100
    dfs = r.pandas()
    assert len(dfs) == 3
    out = r.save(tmp_path / "render")
    assert len(list(out.glob("*.jpg"))) == 3
    crops = r.crop()
    assert isinstance(crops, list)


def test_tf_backend_detector(tmp_path):
    """Export TINY to SavedModel + TFLite, reload through Detector, compare
    detections with the native JAX backend."""
    tf = pytest.importorskip("tensorflow")  # noqa: F841

    from yolov5_tpu.export import run as export_run
    from yolov5_tpu.infer import Detector
    from yolov5_tpu.ops.nms import detections_to_numpy
    from yolov5_tpu.utils.checkpoint import save_checkpoint
    from yolov5_tpu.train.trainer import TrainState
    from yolov5_tpu.train.optim import EMAState
    from yolov5_tpu.models import DetectionModel
    import jax

    # make a loadable ckpt of the TINY model
    m = DetectionModel(TINY)
    state = TrainState(
        jnp.zeros((), jnp.int32), m.variables["params"],
        m.variables.get("batch_stats", {}), None,
        EMAState(m.variables["params"], m.variables.get("batch_stats", {}),
                 jnp.zeros((), jnp.int32)))
    ckpt = tmp_path / "tiny.ckpt"
    save_checkpoint(ckpt, jax.device_get(state), m)

    arts = export_run(weights=str(ckpt), imgsz=64, include=("saved_model", "tflite"),
                      output_dir=tmp_path)
    assert arts.get("saved_model") and arts.get("tflite")

    im = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    det_jax = Detector(str(ckpt), imgsz=64)
    det_sm = Detector(str(arts["saved_model"]), imgsz=64)
    det_tl = Detector(str(arts["tflite"]), imgsz=64)
    assert det_sm.backend == "saved_model" and det_sm.nc == 2
    r_jax = detections_to_numpy(det_jax(im, conf_thres=0.001, max_nms=128, max_det=10))[0]
    r_sm = detections_to_numpy(det_sm(im, conf_thres=0.001, max_nms=128, max_det=10))[0]
    r_tl = detections_to_numpy(det_tl(im, conf_thres=0.001, max_nms=128, max_det=10))[0]
    assert r_sm.shape == r_jax.shape == r_tl.shape
    if len(r_jax):
        np.testing.assert_allclose(r_sm[:, :4], r_jax[:, :4], atol=2.0)


def test_ensemble_concat():
    from yolov5_tpu.infer import Detector, Ensemble
    from yolov5_tpu.ops.nms import detections_to_numpy

    d1 = Detector("", cfg=TINY, imgsz=64, fuse=False)
    d2 = Detector("", cfg=TINY, imgsz=64, fuse=False)
    ens = Ensemble([d1, d2])
    im = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    p1 = d1._forward(d1.variables, im)
    pe = ens._forward(None, im)
    assert pe.shape[1] == 2 * p1.shape[1]
    out = ens(im, conf_thres=0.0001, max_nms=128, max_det=10)
    assert out.boxes.shape == (1, 10, 4)


def test_param_activations():
    import jax
    from yolov5_tpu.models.layers import AconC, FReLU, DWConvTranspose2d

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 4)), jnp.float32)
    for mod in (AconC(), FReLU()):
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        y = mod.apply(v, x, train=False)
        assert y.shape == x.shape
    up = DWConvTranspose2d(4, 2, 2)
    v = up.init(jax.random.PRNGKey(0), x)
    y = up.apply(v, x)
    assert y.shape[1] > x.shape[1]  # spatially upsampled


def _tiny_ckpt(tmp_path):
    """Save a loadable TINY-detection checkpoint, return its path."""
    from yolov5_tpu.utils.checkpoint import save_checkpoint
    from yolov5_tpu.train.trainer import TrainState
    from yolov5_tpu.train.optim import EMAState
    from yolov5_tpu.models import DetectionModel
    import jax

    m = DetectionModel(TINY)
    state = TrainState(
        jnp.zeros((), jnp.int32), m.variables["params"],
        m.variables.get("batch_stats", {}), None,
        EMAState(m.variables["params"], m.variables.get("batch_stats", {}),
                 jnp.zeros((), jnp.int32)))
    ckpt = tmp_path / "tiny.ckpt"
    save_checkpoint(ckpt, jax.device_get(state), m)
    return ckpt


def test_pb_backend_detector(tmp_path):
    """Frozen-GraphDef export round-trip: .pb output matches the native JAX
    decode (reference export.py:793-816 + DetectMultiBackend pb branch,
    models/common.py:545-561)."""
    pytest.importorskip("tensorflow")

    from yolov5_tpu.export import run as export_run
    from yolov5_tpu.infer import Detector

    ckpt = _tiny_ckpt(tmp_path)
    arts = export_run(weights=str(ckpt), imgsz=64, include=("pb",),
                      output_dir=tmp_path)
    assert arts.get("pb") and arts["pb"].stat().st_size > 1000

    im = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    det_jax = Detector(str(ckpt), imgsz=64)
    det_pb = Detector(str(arts["pb"]), imgsz=64)
    assert det_pb.backend == "pb" and det_pb.nc == 2
    ref = np.asarray(det_jax._forward(det_jax.variables, jnp.asarray(im)), np.float32)
    out = np.asarray(det_pb._forward(None, jnp.asarray(im)), np.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


def test_tflite_int8_export(tmp_path):
    """int8 TFLite exports with the normalized-box graph and its backend
    rescales to pixel space: objectness ranking correlates with the float
    model and boxes land within quantization error (reference
    export.py:819-860)."""
    pytest.importorskip("tensorflow")

    from yolov5_tpu.export import run as export_run
    from yolov5_tpu.infer import Detector

    ckpt = _tiny_ckpt(tmp_path)
    arts = export_run(weights=str(ckpt), imgsz=64, include=("tflite",),
                      int8=True, output_dir=tmp_path)
    assert arts.get("tflite") and "int8" in str(arts["tflite"])

    im = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    det_jax = Detector(str(ckpt), imgsz=64)
    det_i8 = Detector(str(arts["tflite"]), imgsz=64)
    ref = np.asarray(det_jax._forward(det_jax.variables, jnp.asarray(im)), np.float32)
    out = np.asarray(det_i8._forward(None, jnp.asarray(im)), np.float32)
    assert out.shape == ref.shape
    # boxes come back in PIXEL space (meta normalized flag + backend rescale)
    assert float(out[..., :4].max()) > 2.0, "boxes still normalized: rescale lost"
    corr = float(np.corrcoef(out[..., 4].ravel(), ref[..., 4].ravel())[0, 1])
    assert corr > 0.9
