"""Metric correctness: AP golden cases, matching semantics, confusion matrix."""

import numpy as np
import pytest

from yolov5_tpu.eval.metrics import (
    ConfusionMatrix,
    ap_per_class,
    compute_ap,
    fitness,
    process_batch,
)

IOUV = np.linspace(0.5, 0.95, 10)


def test_compute_ap_perfect():
    ap, _, _ = compute_ap(np.array([1.0]), np.array([1.0]))
    assert ap == pytest.approx(1.0, abs=0.01)


def test_compute_ap_half():
    # one TP then one FP: precision [1, 0.5], recall [0.5, 0.5] on 2 gts.
    # 101-pt interp credits the plateau at r<=0.5 fully, then the envelope
    # decays: ap lands between 0.5 (step) and 0.75 (full trapezoid)
    ap, _, _ = compute_ap(np.array([0.5, 0.5]), np.array([1.0, 0.5]))
    assert 0.5 < ap < 0.75


def test_process_batch_perfect_match():
    det = np.array([[10, 10, 50, 50, 0.9, 1.0]])
    lab = np.array([[1.0, 10, 10, 50, 50]])
    tp = process_batch(det, lab, IOUV)
    assert tp.shape == (1, 10)
    assert tp.all()  # exact box matches at every IoU threshold


def test_process_batch_wrong_class():
    det = np.array([[10, 10, 50, 50, 0.9, 0.0]])
    lab = np.array([[1.0, 10, 10, 50, 50]])
    assert not process_batch(det, lab, IOUV).any()


def test_process_batch_unique_matching():
    """Two detections on one gt: only the higher-IoU one is TP."""
    det = np.array(
        [[10, 10, 50, 50, 0.9, 0.0], [12, 12, 52, 52, 0.8, 0.0]]
    )
    lab = np.array([[0.0, 10, 10, 50, 50]])
    tp = process_batch(det, lab, IOUV)
    assert tp[0, 0] and not tp[1, 0]


def test_ap_per_class_perfect_detector():
    n = 20
    tp = np.ones((n, 10), bool)
    conf = np.linspace(0.9, 0.5, n)
    cls = np.zeros(n)
    res = ap_per_class(tp, conf, cls, target_cls=np.zeros(n))
    assert res["ap"][0, 0] == pytest.approx(1.0, abs=0.02)
    assert res["p"][0] > 0.95 and res["r"][0] > 0.95


def test_ap_per_class_all_fp():
    n = 10
    tp = np.zeros((n, 10), bool)
    res = ap_per_class(tp, np.linspace(0.9, 0.5, n), np.zeros(n), np.zeros(n))
    assert res["ap"][0, 0] == pytest.approx(0.0, abs=0.01)


def test_fitness_weights():
    assert fitness([0, 0, 1.0, 0]) == pytest.approx(0.1)
    assert fitness([0, 0, 0, 1.0]) == pytest.approx(0.9)
    assert fitness([1, 1, 0, 0]) == pytest.approx(0.0)


def test_confusion_matrix():
    cm = ConfusionMatrix(nc=2)
    det = np.array([[10, 10, 50, 50, 0.9, 0.0], [60, 60, 90, 90, 0.8, 1.0]])
    lab = np.array([[0.0, 10, 10, 50, 50], [0.0, 60, 60, 90, 90]])
    cm.process_batch(det, lab)
    assert cm.matrix[0, 0] == 1  # correct class 0
    assert cm.matrix[1, 0] == 1  # class 0 gt predicted as class 1
    # missed gt -> background column
    cm2 = ConfusionMatrix(nc=2)
    cm2.process_batch(np.zeros((0, 6)), lab)
    assert cm2.matrix[2, 0] == 2
