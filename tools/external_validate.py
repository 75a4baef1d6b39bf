#!/usr/bin/env python
"""One-command real-world validation — run this wherever network egress
exists (the build sandbox has none, so these three checks cannot run in CI
here; everything they need is scripted below).

Steps (each skippable, each reported):

1. **real-weights import**: download the reference's released yolov5s.pt
   (data/scripts/download_weights.sh), import it through
   models/weights.import_torch_weights, and smoke the decoded forward.
2. **real-COCO val**: download COCO val2017 (data/scripts/get_coco.sh --val),
   run the evaluator at the published protocol (640px, conf 0.001, iou 0.65,
   reference README.md:244) and compare mAP50-95 against the published 37.4
   (reference README.md:228) within --tolerance.
3. **pycocotools cross-check** (pip install pycocotools):
   a. RLE codec: eval/rle.py encode/decode vs pycocotools.mask on random
      masks (bit-identical counts strings required);
   b. COCOEvalLite vs COCOeval on the val run's detections JSON (bbox mode,
      |delta mAP| < 0.002);
   c. segm: polygons_to_rle vs pycocotools.mask.frPyObjects IoU > 0.99.

Usage:
  python tools/external_validate.py                  # all steps
  python tools/external_validate.py --steps weights pycoco
  python tools/external_validate.py --coco-dir ../datasets/coco  # pre-mounted

Exit code 0 = every *requested and runnable* step passed; a step whose
dependency (network, package) is missing reports SKIP and does not fail the
run unless --strict.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = REPO / "yolov5_tpu" / "data" / "scripts"
PUBLISHED = {"yolov5s": 37.4, "yolov5n": 28.0, "yolov5m": 45.4}  # README.md:227-229


def _report(results, name, status, detail=""):
    results.append((name, status, detail))
    print(f"[{status:^4}] {name}: {detail}")


def step_weights(results, model="yolov5s"):
    pt = REPO / f"{model}.pt"
    if not pt.exists():
        r = subprocess.run(["bash", str(SCRIPTS / "download_weights.sh")],
                           cwd=REPO, capture_output=True, text=True)
        if not pt.exists():
            _report(results, "weights-import", "SKIP",
                    f"download failed (no egress?): {r.stderr.strip()[-200:]}")
            return None
    import numpy as np

    from yolov5_tpu.infer import Detector

    det = Detector(str(pt), imgsz=640)
    im = np.random.default_rng(0).integers(0, 255, (1, 640, 640, 3),
                                           dtype=np.uint8)
    out = np.asarray(det(im, conf_thres=0.25).boxes)
    finite = np.isfinite(out).all()
    _report(results, "weights-import", "PASS" if finite else "FAIL",
            f"{model}.pt imported, decoded forward finite={bool(finite)}")
    return str(pt) if finite else None


def step_coco_val(results, weights, coco_dir=None, tolerance=1.0,
                  model="yolov5s"):
    if weights is None:
        _report(results, "coco-val", "SKIP", "no imported weights")
        return None
    data_yaml = REPO / "yolov5_tpu" / "data" / "configs" / "coco.yaml"
    val_dir = Path(coco_dir or (REPO.parent / "datasets" / "coco")) / "images" / "val2017"
    if not val_dir.exists():
        r = subprocess.run(["bash", str(SCRIPTS / "get_coco.sh"), "--val"],
                           cwd=REPO, capture_output=True, text=True)
        if not val_dir.exists():
            _report(results, "coco-val", "SKIP",
                    f"COCO download failed (no egress?): {r.stderr.strip()[-200:]}")
            return None
    from yolov5_tpu.eval.evaluator import run as val_run

    json_out = REPO / "runs" / "external_validate" / "coco_preds.json"
    res = val_run(data=str(data_yaml), weights=weights, imgsz=640,
                  conf_thres=0.001, iou_thres=0.65, save_json=str(json_out),
                  coco91=True, verbose=True)
    published = PUBLISHED.get(model, 37.4)
    delta = abs(100 * res["map"] - published)
    _report(results, "coco-val", "PASS" if delta <= tolerance else "FAIL",
            f"mAP50-95 {100 * res['map']:.1f} vs published {published} "
            f"(|delta| {delta:.2f} <= {tolerance})")
    return str(json_out)


def step_pycocotools(results, preds_json=None, coco_dir=None):
    try:
        from pycocotools import mask as pm
        from pycocotools.coco import COCO  # noqa: F401
        from pycocotools.cocoeval import COCOeval
    except ImportError:
        _report(results, "pycocotools", "SKIP",
                "pip install pycocotools to run this step")
        return

    import numpy as np

    from yolov5_tpu.eval.rle import (mask_to_rle, polygons_to_rle, rle_area,
                                     rle_iou, rle_to_mask)

    # (a) codec bit-parity on random masks
    rng = np.random.default_rng(0)
    ok = True
    for _ in range(200):
        h, w = int(rng.integers(1, 200)), int(rng.integers(1, 200))
        m = (rng.random((h, w)) > rng.random()).astype(np.uint8)
        ours = mask_to_rle(m)
        theirs = pm.encode(np.asfortranarray(m))
        ok &= ours["counts"] == theirs["counts"].decode()
        ok &= np.array_equal(rle_to_mask(ours), pm.decode(theirs))
        ok &= rle_area(ours) == int(pm.area(theirs))
        iou_o = rle_iou([ours], [ours])[0, 0]
        iou_t = float(pm.iou([theirs], [theirs], [0])[0][0])
        ok &= abs(iou_o - iou_t) < 1e-9
    _report(results, "pycoco-rle-codec", "PASS" if ok else "FAIL",
            "200 random masks, bit-identical counts + decode + area + IoU")

    # (b) COCOEvalLite vs COCOeval on the real detections json
    ann = Path(coco_dir or (REPO.parent / "datasets" / "coco")) / \
        "annotations" / "instances_val2017.json"
    if preds_json and Path(preds_json).exists() and ann.exists():
        from yolov5_tpu.eval.coco import COCOEvalLite

        coco_gt = COCO(str(ann))
        coco_dt = coco_gt.loadRes(str(preds_json))
        ce = COCOeval(coco_gt, coco_dt, "bbox")
        ce.evaluate(), ce.accumulate(), ce.summarize()
        gt_list = [dict(g, category_id=g["category_id"])
                   for g in coco_gt.loadAnns(coco_gt.getAnnIds())]
        lite = COCOEvalLite(gt_list, json.loads(Path(preds_json).read_text())) \
            .evaluate().accumulate().summarize()
        delta = abs(lite["map"] - ce.stats[0])
        _report(results, "pycoco-cocoeval", "PASS" if delta < 2e-3 else "FAIL",
                f"COCOEvalLite {lite['map']:.4f} vs pycocotools "
                f"{ce.stats[0]:.4f} (|delta| {delta:.4f} < 0.002)")
    else:
        _report(results, "pycoco-cocoeval", "SKIP",
                "needs the coco-val step's json + instances_val2017.json")

    # (c) polygon rasterization parity
    ok = True
    for _ in range(50):
        k = int(rng.integers(3, 12))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(10, 80, k)
        c = rng.uniform(90, 110, 2)
        poly = np.stack([c[0] + rad * np.cos(ang), c[1] + rad * np.sin(ang)], 1)
        ours = rle_to_mask(polygons_to_rle([poly], 200, 200))
        theirs = pm.decode(pm.merge(pm.frPyObjects([poly.ravel().tolist()],
                                                   200, 200)))
        inter = (ours & theirs).sum()
        union = (ours | theirs).sum()
        ok &= union == 0 or inter / union > 0.99
    _report(results, "pycoco-frpoly", "PASS" if ok else "FAIL",
            "50 random polygons, IoU > 0.99 vs frPyObjects")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", nargs="+", default=["weights", "coco", "pycoco"],
                   choices=["weights", "coco", "pycoco"])
    p.add_argument("--model", default="yolov5s")
    p.add_argument("--coco-dir", default=None,
                   help="pre-mounted COCO root (skips the download)")
    p.add_argument("--tolerance", type=float, default=1.0,
                   help="allowed |mAP - published| in points (default 1.0)")
    p.add_argument("--strict", action="store_true",
                   help="SKIPped steps fail the run too")
    opt = p.parse_args()

    results = []
    weights = preds = None
    if "weights" in opt.steps:
        weights = step_weights(results, opt.model)
    if "coco" in opt.steps:
        preds = step_coco_val(results, weights, opt.coco_dir, opt.tolerance,
                              opt.model)
    if "pycoco" in opt.steps:
        step_pycocotools(results, preds, opt.coco_dir)

    fails = [n for n, s, _ in results if s == "FAIL"]
    skips = [n for n, s, _ in results if s == "SKIP"]
    print(f"\n{len(results)} checks: "
          f"{len(results) - len(fails) - len(skips)} passed, "
          f"{len(fails)} failed, {len(skips)} skipped")
    sys.exit(1 if fails or (opt.strict and skips) else 0)


if __name__ == "__main__":
    main()
