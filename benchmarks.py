#!/usr/bin/env python
"""Benchmark all export formats + optional mAP floors
(the reference benchmarks.py:51-210 equivalent).

For each available export format: export yolov5n (or --weights), verify its
outputs numerically against the native JAX forward, time it, and — when a
dataset is given — run validation and assert the --hard-fail mAP floor.
"""

import argparse
import json
import time

import numpy as np


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="", help=".ckpt to benchmark (else random yolov5n)")
    p.add_argument("--cfg", default="yolov5n")
    p.add_argument("--imgsz", type=int, default=320)
    p.add_argument("--data", default=None, help="dataset yaml for mAP check")
    p.add_argument("--hard-fail", type=float, default=None, help="min mAP50-95")
    p.add_argument("--output-dir", default="runs/benchmarks")
    return p.parse_args()


def main():
    opt = parse_opt()
    import jax.numpy as jnp

    from yolov5_tpu.export import export_formats, run as export_run
    from yolov5_tpu.infer import Detector
    from yolov5_tpu.utils.profile import chain_time

    det = Detector(opt.weights, cfg=opt.cfg, imgsz=opt.imgsz)
    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, (1, opt.imgsz, opt.imgsz, 3), dtype=np.uint8)
    ref = np.asarray(det._forward(det.variables, jnp.asarray(im)), np.float32)

    def fp_gate(out):
        """fp-format parity: bounded max-diff (TPU-vs-CPU conv drift) AND
        output correlation >= 0.99 (reference-style strictness — a graph
        bug shows up as decorrelation even when the range stays bounded)."""
        if out.shape != ref.shape:
            return False, -1.0, -1.0
        diff = float(np.abs(out - ref).max())
        corr = float(np.corrcoef(out.ravel(), ref.ravel())[0, 1])
        return (diff < 3.0 and corr > 0.99), diff, corr

    arts = export_run(weights=opt.weights, cfg=opt.cfg, imgsz=opt.imgsz,
                      include=tuple(n for n, _, ok, _ in export_formats() if ok),
                      output_dir=opt.output_dir)
    rows = []
    t = chain_time(lambda x: det._forward(det.variables, x), (jnp.asarray(im),), k=5)
    rows.append({"format": "jax (native)", "ok": True, "ms": round(t * 1000, 2),
                 "max_abs_diff": 0.0})

    if arts.get("saved_model"):
        import tensorflow as tf

        mod = tf.saved_model.load(str(arts["saved_model"]))
        out = np.asarray(mod.f(tf.constant(im)), np.float32)
        # TPU f32 convs use internal bf16 passes; a few px of drift vs CPU
        # execution is expected, not an export bug — hence max-diff < 3 px,
        # plus the 0.99 correlation gate
        ok, diff, corr = fp_gate(out)
        t0 = time.perf_counter()
        for _ in range(5):
            mod.f(tf.constant(im))
        rows.append({"format": "saved_model", "ok": ok,
                     "ms": round((time.perf_counter() - t0) / 5 * 1000, 2),
                     "max_abs_diff": round(diff, 5), "corr": round(corr, 5)})

    if arts.get("tflite"):
        import tensorflow as tf

        interp = tf.lite.Interpreter(model_path=str(arts["tflite"]))
        interp.allocate_tensors()
        inp = interp.get_input_details()[0]
        outd = interp.get_output_details()[0]
        interp.set_tensor(inp["index"], im)
        t0 = time.perf_counter()
        interp.invoke()
        out = interp.get_tensor(outd["index"]).astype(np.float32)
        ok, diff, corr = fp_gate(out)
        rows.append({"format": "tflite", "ok": ok,
                     "ms": round((time.perf_counter() - t0) * 1000, 2),
                     "max_abs_diff": round(diff, 5), "corr": round(corr, 5)})

    if arts.get("pb"):
        # frozen GraphDef through the Detector's pb backend (wrap_function)
        pbdet = Detector(str(arts["pb"]), imgsz=opt.imgsz)
        out = np.asarray(pbdet._forward(None, jnp.asarray(im)), np.float32)
        ok, diff, corr = fp_gate(out)
        t0 = time.perf_counter()
        for _ in range(5):
            pbdet._forward(None, jnp.asarray(im))
        rows.append({"format": "pb (frozen graph)", "ok": ok,
                     "ms": round((time.perf_counter() - t0) / 5 * 1000, 2),
                     "max_abs_diff": round(diff, 5), "corr": round(corr, 5)})

    # int8 TFLite: quantized boxes are ~1-2 px coarse by design, so parity is
    # asserted on mAP (below, when --data given), not raw max-diff
    arts_int8 = export_run(weights=opt.weights, cfg=opt.cfg, imgsz=opt.imgsz,
                           include=("tflite",), int8=True, data=opt.data,
                           output_dir=opt.output_dir, name=None)
    if arts_int8.get("tflite"):
        i8det = Detector(str(arts_int8["tflite"]), imgsz=opt.imgsz)
        out = np.asarray(i8det._forward(None, jnp.asarray(im)), np.float32)
        corr = (float(np.corrcoef(out[..., 4].ravel(),
                                  ref[..., 4].ravel())[0, 1])
                if out.shape == ref.shape else -1.0)
        t0 = time.perf_counter()
        i8det._forward(None, jnp.asarray(im))
        rows.append({"format": "tflite-int8", "ok": corr > 0.9,
                     "ms": round((time.perf_counter() - t0) * 1000, 2),
                     "obj_corr": round(corr, 4)})
        arts["tflite-int8"] = arts_int8["tflite"]

    if arts.get("onnx"):
        from yolov5_tpu.onnx.runtime import Runtime
        from pathlib import Path

        rt = Runtime(Path(arts["onnx"]).read_bytes())
        t0 = time.perf_counter()
        out = rt(im)[0].astype(np.float32)
        ok, diff, corr = fp_gate(out)
        rows.append({"format": "onnx (mini-runtime)", "ok": ok,
                     "ms": round((time.perf_counter() - t0) * 1000, 2),
                     "max_abs_diff": round(diff, 5), "corr": round(corr, 5)})
        try:
            import cv2

            net = cv2.dnn.readNetFromONNX(str(arts["onnx"]))
            net.setInput(im)
            t0 = time.perf_counter()
            out = net.forward().astype(np.float32)
            ok, diff, corr = fp_gate(out)
            rows.append({"format": "onnx (cv2.dnn)", "ok": ok,
                         "ms": round((time.perf_counter() - t0) * 1000, 2),
                         "max_abs_diff": round(diff, 5), "corr": round(corr, 5)})
        except Exception as e:  # noqa: BLE001 — optional backend, report & move on
            rows.append({"format": "onnx (cv2.dnn)", "ok": False,
                         "note": f"unavailable: {e}"})

    if arts.get("stablehlo"):
        rows.append({"format": "stablehlo", "ok": True, "ms": None,
                     "max_abs_diff": None, "note": "serialized module artifact"})

    map_result = None
    floor_failures = []
    if opt.data:
        from yolov5_tpu.eval.evaluator import run as val_run

        # per-format validation with an ABSOLUTE mAP floor (reference
        # benchmarks.py:139-142 + ci-testing.yml:41-44: every exported
        # format must clear the same hard floor — including int8, which
        # gets no relative-window leniency)
        val_targets = {"native": None}
        for k in ("saved_model", "tflite", "pb", "onnx", "tflite-int8"):
            if arts.get(k):
                val_targets[k] = str(arts[k])
        for fmt, w in val_targets.items():
            r = val_run(data=opt.data,
                        weights=opt.weights if w is None else w,
                        cfg=opt.cfg, imgsz=opt.imgsz,
                        batch_size=32 if w is None else 1, verbose=False)
            ok = opt.hard_fail is None or r["map"] > opt.hard_fail
            rows.append({"format": f"val ({fmt})", "ok": ok,
                         "map50_95": round(r["map"], 4)})
            if not ok:
                floor_failures.append((fmt, round(r["map"], 4)))
            if fmt == "native":
                map_result = r

    print(json.dumps(rows, indent=1))
    if opt.hard_fail is not None:
        assert not floor_failures, (
            f"formats below the mAP floor {opt.hard_fail}: {floor_failures}")
        # numeric-parity gates are hard failures too (skip backends that
        # reported themselves unavailable rather than wrong)
        parity_bad = [r["format"] for r in rows
                      if not r.get("ok") and "unavailable" not in str(r.get("note", ""))]
        assert not parity_bad, f"format parity gates failed: {parity_bad}"
        n_val = sum(1 for r in rows if str(r.get("format", "")).startswith("val ("))
        print(f"mAP floor {opt.hard_fail} passed for all {n_val} validated formats")


if __name__ == "__main__":
    main()
