"""RLE codec + COCO segm-mode eval tests (reference segment/val.py:72-101,
366-382: pycocotools mask.encode + COCOeval iouType='segm')."""

import numpy as np
import pytest

from yolov5_tpu.eval.coco import COCOEvalLite
from yolov5_tpu.eval.rle import (
    _counts_to_string,
    _string_to_counts,
    mask_to_rle,
    polygons_to_rle,
    rle_area,
    rle_iou,
    rle_to_mask,
)


def test_rle_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        h, w = int(rng.integers(1, 64)), int(rng.integers(1, 64))
        m = (rng.random((h, w)) > rng.random()).astype(np.uint8)
        rle = mask_to_rle(m)
        assert rle["size"] == [h, w]
        assert isinstance(rle["counts"], str)
        back = rle_to_mask(rle)
        np.testing.assert_array_equal(back, m)


def test_rle_counts_string_golden():
    """Hand-derived vectors for the maskApi.c base-32 packing: 5 data bits
    per char offset by 48, 0x20 continuation, delta-encoded from index 3."""
    # [0,1,1,1,1] -> deltas [0,1,1,0,0] -> single chars each
    assert _counts_to_string([0, 1, 1, 1, 1]) == "01100"
    assert _string_to_counts("01100") == [0, 1, 1, 1, 1]
    # value 31 needs a continuation char (0x1f sets the sign bit 0x10)
    s = _counts_to_string([31])
    assert len(s) == 2 and _string_to_counts(s) == [31]
    # negative delta round-trips (second 3 < first 10 two back)
    for counts in ([5, 3, 10, 2], [100, 0, 1, 700, 2, 3], [0, 4096]):
        assert _string_to_counts(_counts_to_string(counts)) == counts


def test_rle_column_major_layout():
    # a single foreground pixel at (row 2, col 0) of a 4x3 mask:
    # Fortran scan hits it at position 2 -> counts [2, 1, 9]
    m = np.zeros((4, 3), np.uint8)
    m[2, 0] = 1
    rle = mask_to_rle(m)
    assert _string_to_counts(rle["counts"]) == [2, 1, 9]
    assert rle_area(rle) == 1


def test_rle_area_and_iou():
    a = np.zeros((10, 10), np.uint8)
    a[2:6, 2:6] = 1  # 16 px
    b = np.zeros((10, 10), np.uint8)
    b[4:8, 4:8] = 1  # 16 px, 4 px overlap
    ra, rb = mask_to_rle(a), mask_to_rle(b)
    assert rle_area(ra) == 16
    iou = rle_iou([ra], [rb])
    np.testing.assert_allclose(iou, [[4 / 28]], atol=1e-9)
    # crowd GT: intersection over det area
    iou_c = rle_iou([ra], [rb], iscrowd=[True])
    np.testing.assert_allclose(iou_c, [[4 / 16]], atol=1e-9)


def _rle_square(y, x, size, h=64, w=64):
    m = np.zeros((h, w), np.uint8)
    m[y:y + size, x:x + size] = 1
    return mask_to_rle(m)


def test_cocoeval_segm_perfect_predictions():
    gt, dt = [], []
    for img in range(4):
        for k, (y, x) in enumerate([(4, 4), (20, 30), (40, 8)]):
            r = _rle_square(y, x, 12)
            gt.append({"image_id": img, "category_id": k % 2,
                       "segmentation": r})
            dt.append({"image_id": img, "category_id": k % 2,
                       "segmentation": r, "score": 0.9})
    s = COCOEvalLite(gt, dt, iou_type="segm").evaluate().accumulate().summarize()
    assert s["map"] == pytest.approx(1.0)
    assert s["map50"] == pytest.approx(1.0)


def test_cocoeval_segm_offset_masks_degrade():
    """A mask shifted to ~0.47 IoU matches at no threshold; ~0.6 IoU matches
    at 0.5/0.55/0.6 only — segm mAP must reflect mask geometry, not boxes."""
    gt = [{"image_id": 0, "category_id": 0, "segmentation": _rle_square(10, 10, 20)}]
    # shift 6 px: inter=14*20... compute: overlap rows 14/20 -> IoU 14/26
    dt = [{"image_id": 0, "category_id": 0,
           "segmentation": _rle_square(16, 10, 20), "score": 0.9}]
    s = COCOEvalLite(gt, dt, iou_type="segm").evaluate().accumulate().summarize()
    assert s["map50"] == pytest.approx(1.0)  # IoU 14/26=0.538 > 0.5
    assert 0.0 < s["map"] < 0.2  # only the 0.5 threshold matches
    # same boxes, but disjoint mask -> nothing matches in segm mode
    dt2 = [{"image_id": 0, "category_id": 0,
            "segmentation": _rle_square(40, 40, 20), "score": 0.9,
            "bbox": [10, 10, 20, 20]}]
    s2 = COCOEvalLite(gt, dt2, iou_type="segm").evaluate().accumulate().summarize()
    assert s2["map"] == pytest.approx(0.0)


def test_polygons_to_rle_square():
    rle = polygons_to_rle([np.array([[8, 8], [24, 8], [24, 24], [8, 24]])],
                          32, 32)
    m = rle_to_mask(rle)
    assert m[16, 16] == 1 and m[4, 4] == 0
    assert abs(rle_area(rle) - 17 * 17) <= 40  # cv2 boundary convention


def test_segm_json_rows_schema(tmp_path):
    """_segm_json_rows emits reference-shaped rows whose RLEs decode at the
    native image size (segment/val.py save_one_json contract)."""
    from yolov5_tpu.train.run_segment import _segm_json_rows

    rng = np.random.default_rng(0)
    nm, hm, wm = 8, 16, 16
    pred = np.zeros((3, 6 + nm), np.float32)
    pred[:, :4] = [[8, 8, 40, 40], [20, 4, 60, 30], [0, 0, 64, 64]]
    pred[:, 4] = [0.9, 0.8, 0.7]
    pred[:, 5] = [0, 1, 2]
    pred[:, 6:] = rng.standard_normal((3, nm))
    proto = rng.standard_normal((hm, wm, nm)).astype(np.float32)
    rows = _segm_json_rows(pred, proto, "000000000042.jpg", (48, 56),
                           (64, 64), coco91=True)
    assert len(rows) == 3
    for r in rows:
        assert r["image_id"] == 42
        assert set(r) == {"image_id", "category_id", "bbox", "score",
                          "segmentation"}
        m = rle_to_mask(r["segmentation"])
        assert m.shape == (48, 56)  # native size, not letterbox
    assert rows[0]["category_id"] == 1  # coco91 remap of class 0
