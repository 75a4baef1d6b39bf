"""NMS correctness: tiled fixpoint vs scan spec vs a plain numpy greedy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from yolov5_tpu.ops.nms import (
    _greedy_nms_scan,
    _greedy_nms_tiled,
    detections_to_numpy,
    non_max_suppression,
)


def numpy_greedy_nms(boxes, scores, iou_thres):
    """Straight-line greedy NMS oracle (sorted input, returns keep mask)."""
    k = len(boxes)
    keep = np.zeros(k, bool)
    for i in range(k):
        if scores[i] <= 0:
            continue
        ok = True
        for j in range(i):
            if keep[j]:
                # iou
                xx1 = max(boxes[i, 0], boxes[j, 0])
                yy1 = max(boxes[i, 1], boxes[j, 1])
                xx2 = min(boxes[i, 2], boxes[j, 2])
                yy2 = min(boxes[i, 3], boxes[j, 3])
                inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
                a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                if inter / (a1 + a2 - inter + 1e-7) > iou_thres:
                    ok = False
                    break
        keep[i] = ok
    return keep


def random_sorted_boxes(rng, k, span=200.0):
    xy = rng.uniform(0, span, (k, 2))
    wh = rng.uniform(5, 60, (k, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = np.sort(rng.uniform(0.01, 1.0, k).astype(np.float32))[::-1].copy()
    return boxes, scores


@pytest.mark.parametrize("k", [17, 128, 300])
@pytest.mark.parametrize("thres", [0.3, 0.5, 0.7])
def test_greedy_matches_oracle(rng, k, thres):
    boxes, scores = random_sorted_boxes(rng, k)
    oracle = numpy_greedy_nms(boxes, scores, thres)
    scan = np.asarray(_greedy_nms_scan(boxes, scores, thres))
    tiled = np.asarray(_greedy_nms_tiled(boxes, scores, thres, tile=64))
    np.testing.assert_array_equal(scan, oracle)
    np.testing.assert_array_equal(tiled, oracle)


def test_tiled_handles_padding_scores(rng):
    boxes, scores = random_sorted_boxes(rng, 100)
    scores[60:] = 0.0  # padding region
    oracle = numpy_greedy_nms(boxes, scores, 0.5)
    tiled = np.asarray(_greedy_nms_tiled(boxes, scores, 0.5, tile=32))
    np.testing.assert_array_equal(tiled, oracle)
    assert not tiled[60:].any()


def test_suppression_chain():
    """Chain where greedy revives every other box — catches naive fixpoints."""
    n = 12
    boxes = np.stack(
        [np.arange(n) * 5.0, np.zeros(n), np.arange(n) * 5.0 + 10, np.full(n, 10.0)], axis=1
    ).astype(np.float32)  # each box overlaps its neighbor by 50% iou 1/3
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    oracle = numpy_greedy_nms(boxes, scores, 0.3)
    assert oracle.tolist() == [i % 2 == 0 for i in range(n)]
    tiled = np.asarray(_greedy_nms_tiled(boxes, scores, 0.3, tile=4))
    np.testing.assert_array_equal(tiled, oracle)


def make_prediction(rng, bs=2, n=400, nc=3, nm=0):
    """Synthesize a decoded head output (bs, n, 5+nc+nm)."""
    pred = np.zeros((bs, n, 5 + nc + nm), np.float32)
    xy = rng.uniform(50, 250, (bs, n, 2))
    wh = rng.uniform(10, 50, (bs, n, 2))
    pred[..., 0:2] = xy
    pred[..., 2:4] = wh
    pred[..., 4] = rng.uniform(0, 1, (bs, n))
    cls = rng.uniform(0, 1, (bs, n, nc))
    pred[..., 5 : 5 + nc] = cls
    if nm:
        pred[..., 5 + nc :] = rng.normal(size=(bs, n, nm))
    return pred


def test_nms_end_to_end(rng):
    pred = make_prediction(rng)
    dets = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45, max_nms=512, max_det=50)
    assert dets.boxes.shape == (2, 50, 4)
    out = detections_to_numpy(dets)
    assert len(out) == 2
    for rows in out:
        assert rows.shape[1] == 6
        # scores sorted descending, all above threshold
        assert (np.diff(rows[:, 4]) <= 1e-6).all()
        assert (rows[:, 4] > 0.25).all()
        # no two same-class boxes overlap above iou_thres
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[i, 5] != rows[j, 5]:
                    continue
                keep = numpy_greedy_nms(
                    rows[[i, j], :4], np.array([1.0, 0.9], np.float32), 0.45
                )
                assert keep.all(), "overlapping same-class detections survived"


def test_nms_multi_label_emits_multiple_classes(rng):
    pred = make_prediction(rng, bs=1, n=50, nc=4)
    pred[0, :, 4] = 0.9
    pred[0, :, 5:9] = 0.9  # every class equally confident
    dets = non_max_suppression(pred, multi_label=True, conf_thres=0.3, max_nms=512, max_det=100)
    out = detections_to_numpy(dets)[0]
    # the same physical box should appear under several classes
    assert len(np.unique(out[:, 5])) > 1


def test_nms_agnostic_vs_per_class(rng):
    pred = make_prediction(rng, bs=1, n=100, nc=3)
    per_class = non_max_suppression(pred, agnostic=False, max_nms=256)
    agnostic = non_max_suppression(pred, agnostic=True, max_nms=256)
    assert int(agnostic.counts[0]) <= int(per_class.counts[0])


def test_nms_mask_coeff_passthrough(rng):
    pred = make_prediction(rng, bs=1, n=60, nc=2, nm=8)
    dets = non_max_suppression(pred, nc=2, max_nms=128, max_det=20)
    assert dets.masks.shape == (1, 20, 8)
    out = detections_to_numpy(dets)[0]
    assert out.shape[1] == 14


def test_pallas_kernel_matches_tiled(rng):
    """Pallas TPU kernel (interpret mode on CPU) == jnp tiled == oracle."""
    import jax.numpy as jnp

    from yolov5_tpu.ops.nms_pallas import greedy_nms_pallas

    bs = 3
    boxes = np.stack([random_sorted_boxes(rng, 300)[0] for _ in range(bs)])
    scores = np.stack([random_sorted_boxes(rng, 300)[1] for _ in range(bs)])
    scores[:, 280:] = 0.0
    got = np.asarray(greedy_nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                       0.45, interpret=True))
    for b in range(bs):
        ref = numpy_greedy_nms(boxes[b], scores[b], 0.45)
        np.testing.assert_array_equal(got[b], ref)


def test_nms_impl_pallas_end_to_end(rng):
    pred = make_prediction(rng, bs=2, n=200, nc=3)
    import os
    # interpret mode on CPU backends is selected inside the kernel call;
    # here we only check the plumbing produces identical detections
    a = non_max_suppression(pred, max_nms=256, impl="tiled")
    # pallas impl needs a TPU (or interpret); compare shapes only on CPU
    assert a.boxes.shape == (2, 300, 4)


def test_merge_nms_runs(rng):
    pred = make_prediction(rng, bs=1, n=100, nc=3)
    plain = non_max_suppression(pred, max_nms=128, max_det=20)
    merged = non_max_suppression(pred, max_nms=128, max_det=20, merge=True)
    assert merged.boxes.shape == plain.boxes.shape
    # same survivors (merge only moves boxes), coordinates may shift
    np.testing.assert_array_equal(np.asarray(merged.valid), np.asarray(plain.valid))
    assert np.isfinite(np.asarray(merged.boxes)).all()


def test_verified_selection_matches_exact_sparse_and_dense(rng):
    """The large-k eval path's verified-approx selection must equal the
    exact top_k protocol bit-for-bit: sparse scores (trained-model landscape,
    fast path) AND dense scores (random weights, lax.cond fallback)."""
    bs, n, nc = 2, 4000, 12
    for landscape in ("sparse", "dense"):
        pred = np.asarray(rng.random((bs, n, 5 + nc)), np.float32)
        if landscape == "sparse":
            # obj tiny everywhere except ~200 boxes per image
            pred[..., 4] = 0.0001
            hot = rng.integers(0, n, 200)
            pred[:, hot, 4] = 0.9
        else:
            pred[..., 4] = np.asarray(rng.random((bs, n)), np.float32)
        pred[..., :4] = np.asarray(rng.random((bs, n, 4)), np.float32) * 400 + 8
        j_pred = jnp.asarray(pred)
        kw = dict(conf_thres=0.001, iou_thres=0.45, multi_label=True,
                  max_det=100, max_nms=30720)
        fast = non_max_suppression(j_pred, **kw)
        exact = non_max_suppression(j_pred, exact_selection=True, **kw)
        v_f, v_e = np.asarray(fast.valid), np.asarray(exact.valid)
        np.testing.assert_array_equal(v_f, v_e, err_msg=landscape)
        np.testing.assert_array_equal(np.asarray(fast.scores),
                                      np.asarray(exact.scores), err_msg=landscape)
        # gathered fields compared on valid rows (invalid rows may gather
        # arbitrary zero-score indices)
        for name in ("boxes", "classes"):
            np.testing.assert_array_equal(
                np.asarray(getattr(fast, name))[v_f],
                np.asarray(getattr(exact, name))[v_e], err_msg=landscape)


# ---------------------------------------------------------------------------
# Fused decode+NMS from raw head maps (the TPU serving path)


def _random_maps(rng, bs=2, nc=7, nm=0, levels=((12, 16, 3), (6, 8, 3)),
                 strides=(8, 16)):
    """Raw logit head maps + matching anchors/strides."""
    no = 5 + nc + nm
    maps, anchors = [], []
    for (ny, nx, na), s in zip(levels, strides):
        maps.append(rng.normal(0, 2.0, (bs, ny, nx, na, no)).astype(np.float32))
        anchors.append((rng.uniform(0.5, 4.0, (na, 2)) * s).astype(np.float32))
    return [jnp.asarray(m) for m in maps], anchors, list(strides)


def _assert_same_detections(a, b, atol=1e-4):
    """Two padded Detections agree on every valid entry."""
    na_, nb_ = np.asarray(a.valid), np.asarray(b.valid)
    assert (na_ == nb_).all(), "valid masks differ"
    v = na_
    for field in ("boxes", "scores", "classes", "masks"):
        xa, xb = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        assert np.allclose(xa[v], xb[v], atol=atol), field


@pytest.mark.parametrize("multi_label", [False, True])
@pytest.mark.parametrize("nm", [0, 4])
def test_from_maps_matches_decoded_path(rng, multi_label, nm):
    """non_max_suppression_from_maps(maps) == non_max_suppression(decode(maps))
    — the fused serving path must produce the identical candidate set, boxes,
    classes and mask coefficients as decode-then-NMS (ops/nms.py)."""
    from yolov5_tpu.models.layers import decode
    from yolov5_tpu.ops.nms import non_max_suppression_from_maps

    nc = 7
    maps, anchors, strides = _random_maps(rng, nc=nc, nm=nm)
    kw = dict(conf_thres=0.25, iou_thres=0.45, max_det=50, max_nms=256,
              multi_label=multi_label, nc=nc)
    pred = decode(maps, anchors, strides, nc=nc)
    ref = non_max_suppression(pred, **kw)
    got = non_max_suppression_from_maps(maps, anchors, strides, **kw)
    assert int(got.valid.sum()) > 0  # non-degenerate case
    _assert_same_detections(ref, got)


def test_from_maps_matches_decoded_path_options(rng):
    """Option parity: agnostic, merge, class_filter, single level."""
    from yolov5_tpu.models.layers import decode
    from yolov5_tpu.ops.nms import non_max_suppression_from_maps

    nc = 5
    maps, anchors, strides = _random_maps(rng, nc=nc)
    pred = decode(maps, anchors, strides, nc=nc)
    filt = jnp.asarray(np.array([1, 0, 1, 0, 1], bool))
    for kw in (dict(agnostic=True), dict(merge=True),
               dict(class_filter=filt)):
        base = dict(conf_thres=0.3, iou_thres=0.5, max_det=30, max_nms=128,
                    nc=nc)
        ref = non_max_suppression(pred, **base, **kw)
        got = non_max_suppression_from_maps(maps, anchors, strides,
                                            **base, **kw)
        _assert_same_detections(ref, got)
    if "class_filter" in kw:
        assert set(np.unique(np.asarray(got.classes)[np.asarray(got.valid)])) \
            <= {0, 2, 4}
    # single level
    m1, a1, s1 = maps[:1], anchors[:1], strides[:1]
    ref = non_max_suppression(decode(m1, a1, s1, nc=nc), conf_thres=0.25,
                              max_nms=128, max_det=20, nc=nc)
    got = non_max_suppression_from_maps(m1, a1, s1, conf_thres=0.25,
                                        max_nms=128, max_det=20, nc=nc)
    _assert_same_detections(ref, got)


def test_from_maps_detector_end_to_end(rng):
    """Detector.__call__ rides the fused path and agrees with the decoded
    reference pipeline on a real (random-weight) model."""
    from yolov5_tpu.infer import Detector
    from yolov5_tpu.ops.nms import non_max_suppression_from_maps  # noqa: F401

    det = Detector(cfg="yolov5n", imgsz=64)
    ims = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    got = det(ims, conf_thres=0.01, max_nms=512, max_det=20)
    preds = det._forward(det.variables, jnp.asarray(ims))
    ref = non_max_suppression(preds, conf_thres=0.01, max_nms=512, max_det=20)
    _assert_same_detections(ref, got, atol=1e-3)
