"""Golden-value and property tests for box geometry ops."""

import numpy as np
import pytest

from yolov5_tpu.ops import (
    bbox_iou,
    bbox_ioa,
    box_iou,
    clip_boxes,
    scale_boxes,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywh,
    xyxy2xywhn,
)
from yolov5_tpu.ops.boxes import make_divisible, smooth_bce, wh_iou


def test_xywh_xyxy_roundtrip(rng):
    xywh = rng.uniform(10, 100, (32, 4)).astype(np.float32)
    back = np.asarray(xyxy2xywh(xywh2xyxy(xywh)))
    np.testing.assert_allclose(back, xywh, rtol=1e-5, atol=1e-4)


def test_xywh2xyxy_golden():
    out = np.asarray(xywh2xyxy(np.array([[10.0, 20.0, 4.0, 6.0]])))
    np.testing.assert_allclose(out, [[8.0, 17.0, 12.0, 23.0]])


def test_xywhn_roundtrip(rng):
    xyxy = np.sort(rng.uniform(0, 640, (16, 2, 2)), axis=1).reshape(16, 4).astype(np.float32)
    n = np.asarray(xyxy2xywhn(xyxy, w=640, h=480))
    back = np.asarray(xywhn2xyxy(n, w=640, h=480))
    np.testing.assert_allclose(back, xyxy, rtol=1e-4, atol=1e-3)


def test_box_iou_golden():
    a = np.array([[0.0, 0, 10, 10]])
    b = np.array([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_box_iou_batched(rng):
    a = np.sort(rng.uniform(0, 100, (3, 7, 2, 2)), axis=-2).reshape(3, 7, 4)
    b = np.sort(rng.uniform(0, 100, (3, 5, 2, 2)), axis=-2).reshape(3, 5, 4)
    batched = np.asarray(box_iou(a, b))
    for i in range(3):
        np.testing.assert_allclose(batched[i], np.asarray(box_iou(a[i], b[i])), atol=1e-6)


def test_bbox_iou_plain_matches_box_iou(rng):
    a = np.sort(rng.uniform(0, 100, (20, 2, 2)), axis=1).reshape(20, 4)
    b = np.sort(rng.uniform(0, 100, (20, 2, 2)), axis=1).reshape(20, 4)
    elementwise = np.asarray(bbox_iou(a, b, xywh=False)).squeeze(-1)
    pairwise = np.asarray(box_iou(a, b)).diagonal()
    np.testing.assert_allclose(elementwise, pairwise, atol=1e-5)


def test_ciou_identical_boxes_is_one():
    box = np.array([[50.0, 50, 20, 10]])
    ciou = np.asarray(bbox_iou(box, box, xywh=True, CIoU=True))
    np.testing.assert_allclose(ciou, 1.0, atol=1e-5)


def test_ciou_ordering():
    """CIoU must penalize center distance and aspect mismatch."""
    ref = np.array([[50.0, 50, 20, 20]])
    same = np.asarray(bbox_iou(ref, np.array([[50.0, 50, 20, 20]]), CIoU=True)).item()
    shifted = np.asarray(bbox_iou(ref, np.array([[60.0, 50, 20, 20]]), CIoU=True)).item()
    far = np.asarray(bbox_iou(ref, np.array([[90.0, 50, 20, 20]]), CIoU=True)).item()
    assert same > shifted > far
    # disjoint boxes: plain IoU is 0 but CIoU is negative (distance penalty)
    assert far < 0


def test_giou_diou_golden():
    a = np.array([[0.0, 0, 2, 2]])
    b = np.array([[2.0, 2, 4, 4]])  # corner-touching, iou 0
    giou = np.asarray(bbox_iou(a, b, xywh=False, GIoU=True)).item()
    # enclosing box 4x4=16, union 8 -> giou = 0 - (16-8)/16 = -0.5
    assert giou == pytest.approx(-0.5, abs=1e-5)
    diou = np.asarray(bbox_iou(a, b, xywh=False, DIoU=True)).item()
    # center dist^2 = 8, diag^2 = 32 -> diou = -0.25
    assert diou == pytest.approx(-0.25, abs=1e-5)


def test_bbox_ioa():
    b1 = np.array([[0.0, 0, 10, 10]])
    b2 = np.array([[5.0, 5, 15, 15], [0, 0, 5, 5]])
    ioa = np.asarray(bbox_ioa(b1, b2))
    np.testing.assert_allclose(ioa, [[25 / 100, 1.0]], atol=1e-5)


def test_wh_iou():
    out = np.asarray(wh_iou(np.array([[2.0, 2]]), np.array([[2.0, 2], [4, 4], [1, 4]])))
    np.testing.assert_allclose(out, [[1.0, 0.25, 2 / 6]], atol=1e-5)


def test_clip_and_scale_boxes():
    boxes = np.array([[-5.0, -5, 700, 500]])
    clipped = np.asarray(clip_boxes(boxes, (480, 640)))
    np.testing.assert_allclose(clipped, [[0, 0, 640, 480]])

    # 1280x720 image letterboxed into 640x640: gain 0.5, pad (0, 140)
    letter = np.array([[100.0, 200, 300, 400]])
    native = np.asarray(scale_boxes((640, 640), letter, (720, 1280)))
    np.testing.assert_allclose(native, [[200.0, 120, 600, 520]], atol=1e-4)


def test_smooth_bce_and_make_divisible():
    pos, neg = smooth_bce(0.1)
    assert pos == pytest.approx(0.95) and neg == pytest.approx(0.05)
    assert make_divisible(63, 8) == 64
    assert make_divisible(64, 8) == 64
    assert make_divisible(1, 8) == 8
