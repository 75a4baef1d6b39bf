"""COCOEvalLite: hand-computable cases + cross-validation against the
in-house ap_per_class/process_batch pipeline (the two independent AP
implementations must agree)."""

import numpy as np

from yolov5_tpu.eval.coco import COCOEvalLite, score_detections_json
from yolov5_tpu.eval.metrics import ap_per_class, process_batch


def _gt(image_id, cid, x, y, w, h, crowd=False):
    return {"image_id": image_id, "category_id": cid, "bbox": [x, y, w, h],
            "iscrowd": crowd}


def _dt(image_id, cid, x, y, w, h, score):
    return {"image_id": image_id, "category_id": cid, "bbox": [x, y, w, h],
            "score": score}


def test_perfect_detections():
    gt = [_gt(1, 0, 10, 10, 50, 40), _gt(1, 0, 100, 100, 30, 30)]
    dt = [_dt(1, 0, 10, 10, 50, 40, 0.9), _dt(1, 0, 100, 100, 30, 30, 0.8)]
    s = COCOEvalLite(gt, dt).evaluate().accumulate().summarize()
    assert s["map"] == 1.0 and s["map50"] == 1.0 and s["ar100"] == 1.0


def test_one_tp_one_fp():
    # one exact match + one pure FP at lower score: P/R curve is
    # (r=.5, p=1), (r=.5, p=.5) -> 101-pt AP = 51/101 fractions of recall
    # points <= 0.5 at precision 1
    gt = [_gt(1, 0, 10, 10, 50, 40), _gt(1, 0, 200, 200, 30, 30)]
    dt = [_dt(1, 0, 10, 10, 50, 40, 0.9), _dt(1, 0, 300, 10, 20, 20, 0.8)]
    s = COCOEvalLite(gt, dt).evaluate().accumulate().summarize()
    expected = np.mean([1.0 if r <= 0.5 else 0.0 for r in np.linspace(0, 1, 101)])
    np.testing.assert_allclose(s["map50"], expected, atol=1e-9)
    assert s["ar100"] == 0.5


def test_localization_quality_spreads_over_thresholds():
    # IoU ~0.6 match: counts at thresholds .5/.55/.6, not above
    gt = [_gt(1, 0, 0, 0, 100, 100)]
    dt = [_dt(1, 0, 0, 25, 100, 100, 0.9)]  # IoU = 75/125 = 0.6
    ev = COCOEvalLite(gt, dt).evaluate().accumulate()
    ap_t = np.array([ev.precision[t, :, 0, 0, 2].mean() for t in range(10)])
    assert (ap_t[:3] > 0.99).all() and (ap_t[3:] == 0.0).all()


def test_crowd_gt_absorbs_without_penalty():
    # a det fully inside a crowd region matches it (IoA) and is ignored
    gt = [_gt(1, 0, 0, 0, 200, 200, crowd=True), _gt(1, 0, 300, 300, 40, 40)]
    dt = [_dt(1, 0, 50, 50, 30, 30, 0.95), _dt(1, 0, 300, 300, 40, 40, 0.9)]
    s = COCOEvalLite(gt, dt).evaluate().accumulate().summarize()
    assert s["map"] == 1.0  # crowd det neither TP nor FP


def test_area_ranges_partition():
    gt = [_gt(1, 0, 0, 0, 20, 20), _gt(1, 0, 50, 50, 50, 50),
          _gt(1, 0, 200, 200, 120, 120)]
    dt = [_dt(1, 0, 0, 0, 20, 20, 0.9), _dt(1, 0, 50, 50, 50, 50, 0.9),
          _dt(1, 0, 200, 200, 120, 120, 0.9)]
    s = COCOEvalLite(gt, dt).evaluate().accumulate().summarize()
    assert s["map_small"] == 1.0 and s["map_medium"] == 1.0 and s["map_large"] == 1.0


def test_max_dets_cap():
    # 3 GT, 3 perfect dets but maxDet=1 truncates recall
    gt = [_gt(1, 0, i * 100, 0, 40, 40) for i in range(3)]
    dt = [_dt(1, 0, i * 100, 0, 40, 40, 0.9 - 0.1 * i) for i in range(3)]
    ev = COCOEvalLite(gt, dt).evaluate().accumulate()
    assert ev.recall[0, 0, 0, 0] == (1 / 3)  # maxDet=1
    assert ev.recall[0, 0, 0, 2] == 1.0      # maxDet=100


def _random_scene(rng, n_images=12, nc=3, per_img=6, iou_noise=0.15,
                  miss_rate=0.2, low_conf_fps=10):
    """GT + detections with a dense low-confidence FP tail, mimicking real
    conf-0.001 eval curves (where the two AP conventions agree; on sparse
    curves the reference's linear tail interpolation inflates AP vs COCO's
    step function — a known, documented divergence)."""
    gts, dts = [], []
    for i in range(n_images):
        for _ in range(per_img):
            w, h = rng.uniform(20, 120, 2)
            x, y = rng.uniform(0, 500, 2)
            c = int(rng.integers(0, nc))
            gts.append(_gt(i, c, x, y, w, h))
            if rng.random() > miss_rate:
                dx, dy = rng.uniform(-iou_noise, iou_noise, 2) * np.array([w, h])
                dts.append(_dt(i, c, x + dx, y + dy, w, h,
                               float(rng.uniform(0.3, 1.0))))
            else:  # missed GT still gets a bad low-conf candidate
                dts.append(_dt(i, c, x + 0.6 * w, y + 0.6 * h, w, h,
                               float(rng.uniform(0.01, 0.1))))
        for _ in range(low_conf_fps):
            dts.append(_dt(i, int(rng.integers(0, nc)),
                           *rng.uniform(0, 500, 2), *rng.uniform(10, 80, 2),
                           float(rng.uniform(0.001, 0.2))))
    return gts, dts


def test_cross_validates_inhouse_ap(rng):
    """Two independent AP implementations (COCO protocol vs the reference-
    style ap_per_class over process_batch matches) must agree closely on a
    random scene."""
    gts, dts = _random_scene(rng)
    coco = score_detections_json(dts, gts)

    # in-house pipeline on the same scene
    iouv = np.linspace(0.5, 0.95, 10)
    stats = []
    img_ids = sorted({g["image_id"] for g in gts})
    for i in img_ids:
        g = [x for x in gts if x["image_id"] == i]
        d = [x for x in dts if x["image_id"] == i]
        labels = np.array(
            [[x["category_id"], x["bbox"][0], x["bbox"][1],
              x["bbox"][0] + x["bbox"][2], x["bbox"][1] + x["bbox"][3]]
             for x in g], np.float32).reshape(-1, 5)
        pred = np.array(
            [[x["bbox"][0], x["bbox"][1], x["bbox"][0] + x["bbox"][2],
              x["bbox"][1] + x["bbox"][3], x["score"], x["category_id"]]
             for x in d], np.float32).reshape(-1, 6)
        correct = process_batch(pred, labels, iouv)
        stats.append((correct, pred[:, 4], pred[:, 5], labels[:, 0]))
    tp = np.concatenate([s[0] for s in stats])
    conf = np.concatenate([s[1] for s in stats])
    pcls = np.concatenate([s[2] for s in stats])
    tcls = np.concatenate([s[3] for s in stats])
    res = ap_per_class(tp, conf, pcls, tcls)
    inhouse_map = float(res["ap"].mean())
    inhouse_map50 = float(res["ap"][:, 0].mean())

    assert abs(coco["map"] - inhouse_map) < 0.03, (coco["map"], inhouse_map)
    assert abs(coco["map50"] - inhouse_map50) < 0.03, (coco["map50"], inhouse_map50)
