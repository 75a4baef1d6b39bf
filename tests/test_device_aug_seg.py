"""Segment-aware device augmentation: mosaic with polygons, flips, GT-mask
rasterization, and the full device-cached seg train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov5_tpu.data.device_aug import (
    device_augment_seg,
    mosaic_in_batch_seg,
    random_flip_lr_seg,
)

HYP = {"mosaic": 1.0, "scale": 0.5, "translate": 0.1, "fliplr": 0.5,
       "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4}


def _batch(bs=4, s=96, m=3, v=8, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (bs, s, s, 3), dtype=np.uint8)
    hw = np.full((bs, 2), s, np.int32)
    targets = np.zeros((bs, m, 5), np.float32)
    segments = np.zeros((bs, m, v, 2), np.float32)
    valid = np.zeros((bs, m), bool)
    for b in range(bs):
        for i in range(2):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            r = rng.uniform(0.08, 0.2)
            ang = np.linspace(0, 2 * np.pi, v, endpoint=False)
            px = cx + r * np.cos(ang)
            py = cy + r * np.sin(ang)
            segments[b, i, :, 0] = px
            segments[b, i, :, 1] = py
            targets[b, i] = [i % 2, (px.min() + px.max()) / 2,
                             (py.min() + py.max()) / 2,
                             px.max() - px.min(), py.max() - py.min()]
            valid[b, i] = True
    return {"images": jnp.asarray(images), "hw": jnp.asarray(hw),
            "targets": jnp.asarray(targets), "segments": jnp.asarray(segments),
            "valid": jnp.asarray(valid)}


def test_mosaic_seg_boxes_bound_polygons():
    """Re-derived boxes must tightly bound the warped polygons CLIPPED to the
    canvas — the dense-point limit of reference segment2box (the reference
    warps 1000-point resampled polygons, so its inside-points extent equals
    the clipped extent; raw V=32-vertex inside-extent undersized cut
    instances, the round-2 device seg mAP gap)."""
    b = _batch()
    key = jax.random.PRNGKey(0)
    img, targets, segs, valid = jax.jit(
        lambda bb, k: mosaic_in_batch_seg(
            bb["images"], bb["hw"], bb["targets"], bb["segments"], bb["valid"],
            k, HYP)
    )(b, key)
    s = b["images"].shape[1]
    assert img.shape == b["images"].shape and img.dtype == jnp.uint8
    targets, segs, valid = map(np.asarray, (targets, segs, valid))
    assert valid.any(), "mosaic dropped every instance"
    for bi, mi in zip(*np.nonzero(valid)):
        seg_px = segs[bi, mi] * s
        inside = ((seg_px[:, 0] >= 0) & (seg_px[:, 0] <= s)
                  & (seg_px[:, 1] >= 0) & (seg_px[:, 1] <= s))
        assert inside.any()
        clipped = np.clip(seg_px, 0, s)
        x1, y1 = clipped.min(0)
        x2, y2 = clipped.max(0)
        t = targets[bi, mi]
        np.testing.assert_allclose(t[1] * s, (x1 + x2) / 2, atol=1e-2)
        np.testing.assert_allclose(t[3] * s, x2 - x1, atol=1e-2)
        np.testing.assert_allclose(t[4] * s, y2 - y1, atol=1e-2)


def test_flip_mirrors_polygons():
    b = _batch()
    key = jax.random.PRNGKey(3)
    img, targets, segs = random_flip_lr_seg(
        b["images"], b["targets"], b["segments"], key, p=1.0)
    np.testing.assert_allclose(np.asarray(segs[..., 0]),
                               1.0 - np.asarray(b["segments"][..., 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(segs[..., 1]),
                               np.asarray(b["segments"][..., 1]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(img),
                                  np.asarray(b["images"])[:, :, ::-1, :])


def test_device_augment_seg_masks_match_labels():
    """Rasterized overlap masks must index-match the label rows: every
    instance id present in the mask maps to a valid target row, and each
    mask blob sits inside its (slightly padded) box."""
    b = _batch(seed=5)
    hm = b["images"].shape[1] // 4
    out = jax.jit(
        lambda bb: device_augment_seg(bb, jax.random.PRNGKey(1), HYP, (hm, hm))
    )(b)
    masks = np.asarray(out["masks"])
    targets = np.asarray(out["targets"])
    valid = np.asarray(out["valid"])
    s = b["images"].shape[1]
    assert masks.shape == (b["images"].shape[0], hm, hm)
    ids = np.unique(masks)
    ids = ids[ids > 0]
    assert len(ids), "no instance painted"
    segs_out = np.asarray(out["segments"])
    for bi in range(masks.shape[0]):
        for inst in np.unique(masks[bi]):
            if inst == 0:
                continue
            row = int(inst) - 1
            assert valid[bi, row], f"mask id {inst} points at invalid row"
            ys, xs = np.nonzero(masks[bi] == inst)
            # blob bounded by the FULL polygon extents (masks may exceed the
            # inside-points box when the polygon crosses the image edge —
            # same as the reference, whose loss crops by box anyway)
            poly = segs_out[bi, row] * hm
            px1, py1 = poly.min(0) - 1.5
            px2, py2 = poly.max(0) + 1.5
            assert xs.min() >= px1 and xs.max() <= px2, "blob outside polygon (x)"
            assert ys.min() >= py1 and ys.max() <= py2, "blob outside polygon (y)"
            # and it must overlap the label box
            t = targets[bi, row]
            bx1, bx2 = (t[1] - t[3] / 2) * hm - 1.5, (t[1] + t[3] / 2) * hm + 1.5
            by1, by2 = (t[2] - t[4] / 2) * hm - 1.5, (t[2] + t[4] / 2) * hm + 1.5
            in_box = ((xs >= bx1) & (xs <= bx2) & (ys >= by1) & (ys <= by2))
            assert in_box.any(), "blob does not overlap its box"


def test_seg_device_multiscale_train_step():
    """Seg multi-scale (reference segment/train.py:371) composed with the
    device mosaic: step compiled at a non-base bucket emits that size, GT
    masks rasterize at the bucket's proto resolution, loss finite."""
    from yolov5_tpu.models import SegmentationModel
    from yolov5_tpu.parallel.mesh import make_mesh, replicate
    from yolov5_tpu.train.loss import ComputeSegmentLoss
    from yolov5_tpu.train.optim import build_optimizer
    from yolov5_tpu.train.trainer import init_train_state, make_train_step, scale_hyp

    s, ms, bs = 96, 64, 4
    model = SegmentationModel("yolov5n-seg", nc=2)
    hyp = scale_hyp(dict(HYP, lr0=0.01, lrf=0.01, momentum=0.9,
                         weight_decay=0.0, warmup_epochs=0.0,
                         warmup_momentum=0.9, warmup_bias_lr=0.0,
                         box=0.05, cls=0.5, cls_pw=1.0, obj=1.0, obj_pw=1.0,
                         anchor_t=4.0, fl_gamma=0.0),
                    nl=len(model.stride), nc=2, imgsz=s)
    loss_fn = ComputeSegmentLoss(model.anchors_per_stride, 2, hyp, overlap=True)
    tx = build_optimizer(model.params, hyp, epochs=1, steps_per_epoch=4,
                         batch_size=64)
    state = init_train_state(model, tx)
    mesh = make_mesh(1)
    step = make_train_step(model, loss_fn, tx, mesh=mesh, has_masks=True,
                           device_aug_hyp=hyp, device_cache=True,
                           mask_shape=(ms // 4, ms // 4), overlap=True,
                           ms_size=ms)

    b = _batch(bs=8, s=s, seed=7)
    cache = {"images": b["images"], "hw": b["hw"], "targets": b["targets"],
             "valid": b["valid"],
             "segments": b["segments"].astype(jnp.float16)}
    with mesh:
        state = replicate(state, mesh)
        cache = replicate(cache, mesh)
        idx = jnp.asarray(np.arange(bs, dtype=np.int32))
        state, metrics = step(state, {"idx": idx}, cache)
    assert np.isfinite(float(metrics["total"]))
    assert float(metrics["seg"]) > 0


def test_seg_device_cache_train_step():
    """Full device-cached seg train step on the CPU mesh: gather from cache,
    mosaic+aug+rasterize in-step, loss finite and decreasing-ish."""
    from yolov5_tpu.models import SegmentationModel
    from yolov5_tpu.parallel.mesh import make_mesh, replicate
    from yolov5_tpu.train.loss import ComputeSegmentLoss
    from yolov5_tpu.train.optim import build_optimizer
    from yolov5_tpu.train.trainer import init_train_state, make_train_step, scale_hyp

    s, bs = 96, 4
    model = SegmentationModel("yolov5n-seg", nc=2)
    hyp = scale_hyp(dict(HYP, lr0=0.01, lrf=0.01, momentum=0.9,
                         weight_decay=0.0, warmup_epochs=0.0,
                         warmup_momentum=0.9, warmup_bias_lr=0.0,
                         box=0.05, cls=0.5, cls_pw=1.0, obj=1.0, obj_pw=1.0,
                         anchor_t=4.0, fl_gamma=0.0),
                    nl=len(model.stride), nc=2, imgsz=s)
    loss_fn = ComputeSegmentLoss(model.anchors_per_stride, 2, hyp, overlap=True)
    tx = build_optimizer(model.params, hyp, epochs=1, steps_per_epoch=4,
                         batch_size=64)
    state = init_train_state(model, tx)
    mesh = make_mesh(1)
    step = make_train_step(model, loss_fn, tx, mesh=mesh, has_masks=True,
                           device_aug_hyp=hyp, device_cache=True,
                           mask_shape=(s // 4, s // 4), overlap=True)

    b = _batch(bs=8, s=s, seed=7)
    cache = {"images": b["images"], "hw": b["hw"], "targets": b["targets"],
             "valid": b["valid"],
             "segments": b["segments"].astype(jnp.float16)}
    with mesh:
        state = replicate(state, mesh)
        cache = replicate(cache, mesh)
        losses = []
        for i in range(4):
            idx = jnp.asarray(np.arange(bs, dtype=np.int32) + (i % 2) * bs % 8)
            state, metrics = step(state, {"idx": idx}, cache)
            losses.append(float(metrics["total"]))
    assert all(np.isfinite(losses)), losses
    assert metrics["seg"] > 0, "mask loss never engaged"
