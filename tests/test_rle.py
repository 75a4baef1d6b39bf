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


def test_rle_codec_adversarial_values():
    """Sign-extension / continuation boundaries of the base-32 packing:
    every value near a 5-bit group edge and the 0x10 sign-bit edge must
    round-trip, including deltas of exactly -16/-17 and counts >= 2^20."""
    edges = sorted({0, 1, 15, 16, 17, 31, 32, 33, 511, 512, 1023, 1024,
                    2**15 - 1, 2**15, 2**20 - 1, 2**20, 2**20 + 1,
                    2**25, 2**31 - 1})
    for v in edges:
        assert _string_to_counts(_counts_to_string([v])) == [v]
        # delta encoding engages from index 3: force a negative delta of
        # (w - v) and a positive one of (v - w) around every edge pair
        for w_ in (0, 1, 16, 17, v, v + 16, v + 17):
            counts = [3, w_, 5, v, 2, w_]
            assert _string_to_counts(_counts_to_string(counts)) == counts


def test_rle_huge_runs_roundtrip():
    """counts >= 2^20: a (1200, 1100) mask is 1.32M px — single runs exceed
    the 4-char packing boundary (2^20)."""
    h, w = 1200, 1100
    m = np.zeros((h, w), np.uint8)
    m[:, 600:] = 1  # one background run of 720000, one fg run of 600000
    rle = mask_to_rle(m)
    assert _string_to_counts(rle["counts"]) == [600 * h, 500 * h]
    np.testing.assert_array_equal(rle_to_mask(rle), m)
    assert rle_area(rle) == 500 * h


def test_rle_alternating_and_degenerate_shapes():
    rng = np.random.default_rng(3)
    # long alternating 1-px runs (delta encoding sees long 0-delta chains)
    m = np.zeros((257, 3), np.uint8)
    m[::2] = 1
    np.testing.assert_array_equal(rle_to_mask(mask_to_rle(m)), m)
    # width-1 column, height-1 row, empty, full
    for shape in ((513, 1), (1, 513), (7, 7)):
        for fill in (0, 1):
            m = np.full(shape, fill, np.uint8)
            rle = mask_to_rle(m)
            np.testing.assert_array_equal(rle_to_mask(rle), m)
            assert rle_area(rle) == fill * m.size
        m = (rng.random(shape) > 0.5).astype(np.uint8)
        np.testing.assert_array_equal(rle_to_mask(mask_to_rle(m)), m)


def test_polygons_to_rle_matches_device_rasterizer():
    """Property test: the host GT rasterization (polygons_to_rle, cv2
    semantics) and the on-device rasterizer (ops/rasterize.py) agree on
    random polygons — the two GT paths must supervise the same geometry.
    The device path dilates boundaries by up to half a pixel by design, so
    the gate is IoU, sized to the polygon's perimeter/area ratio."""
    import jax.numpy as jnp

    from yolov5_tpu.ops.rasterize import rasterize

    def dilate1(m):
        out = m.copy()
        out[1:] |= m[:-1]
        out[:-1] |= m[1:]
        out[:, 1:] |= m[:, :-1]
        out[:, :-1] |= m[:, 1:]
        return out

    rng = np.random.default_rng(7)
    hm = wm = 64
    ious = []
    for _ in range(12):
        k = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(8, 28, k)
        cx, cy = rng.uniform(20, 44, 2)
        # integer vertices: the host path rounds, the device path floors
        # (each matching its own consumer's convention) — quantize first so
        # the comparison isolates the FILL semantics, not the vertex cast
        poly = np.floor(
            np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], 1))
        host = rle_to_mask(polygons_to_rle([poly], hm, wm)).astype(bool)
        pad = np.zeros((1, 16, 2), np.float32)
        pad[0, :k] = poly
        dev = np.asarray(rasterize(jnp.asarray(pad),
                                   jnp.asarray([k], np.int32), hm, wm))[0]
        inter = (host & dev).sum()
        union = (host | dev).sum()
        assert union > 0
        # the device path dilates boundaries by <= half a pixel by design,
        # so it must never paint beyond host+1 px; cv2.fillPoly additionally
        # draws the polygon OUTLINE, which at sub-pixel-thin spike tips
        # leaves a few host-only pixels >1 px from the corner-sampled fill
        assert not (dev & ~dilate1(host)).any(), "dev px beyond host+1"
        spikes = int((host & ~dilate1(dev)).sum())
        assert spikes <= 4, f"{spikes} host px beyond dev+1 (k={k})"
        ious.append(inter / union)
    assert np.mean(ious) > 0.85, f"mean IoU {np.mean(ious):.3f}"


def test_cocoeval_segm_crowd_absorbs_extras():
    """Crowd-segm protocol: a crowd GT is not counted in n_gt, can absorb
    several detections, and those matches are ignored (neither TP nor FP) —
    so one real matched det + two crowd-landing dets still give mAP 1.0."""
    real = _rle_square(4, 4, 12)
    crowd = _rle_square(30, 30, 30)
    gt = [
        {"image_id": 0, "category_id": 0, "segmentation": real},
        {"image_id": 0, "category_id": 0, "segmentation": crowd, "iscrowd": 1},
    ]
    dt = [
        {"image_id": 0, "category_id": 0, "segmentation": real, "score": 0.9},
        {"image_id": 0, "category_id": 0,
         "segmentation": _rle_square(32, 32, 20), "score": 0.8},
        {"image_id": 0, "category_id": 0,
         "segmentation": _rle_square(40, 36, 16), "score": 0.7},
    ]
    s = COCOEvalLite(gt, dt, iou_type="segm").evaluate().accumulate().summarize()
    assert s["map"] == pytest.approx(1.0)
    # control: without the crowd flag the extra dets are FPs and drag AP down
    gt[1].pop("iscrowd")
    s2 = COCOEvalLite(gt, dt, iou_type="segm").evaluate().accumulate().summarize()
    assert s2["map"] < 1.0


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
