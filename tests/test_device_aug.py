"""On-device augmentation: cross-check against cv2/host implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov5_tpu.data.device_aug import (
    affine_sample,
    augment_hsv,
    device_augment,
    hsv_to_rgb,
    random_flip_lr,
    random_perspective,
    rgb_to_hsv,
)

cv2 = pytest.importorskip("cv2")


def test_hsv_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0, 1, (4, 4, 3)).astype(np.float32))
    h, s, v = rgb_to_hsv(x)
    back = np.asarray(hsv_to_rgb(h, s, v))
    np.testing.assert_allclose(back, np.asarray(x), atol=1e-5)


def test_hsv_matches_cv2(rng):
    x = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    h, s, v = rgb_to_hsv(jnp.asarray(x.astype(np.float32) / 255.0))
    ref = cv2.cvtColor(x, cv2.COLOR_RGB2HSV)  # h in 0..179, s/v 0..255
    np.testing.assert_allclose(np.asarray(h) * 179, ref[..., 0], atol=2.0)
    np.testing.assert_allclose(np.asarray(s) * 255, ref[..., 1], atol=2.0)
    np.testing.assert_allclose(np.asarray(v) * 255, ref[..., 2], atol=1.0)


def test_rgb_to_hsv_u8_bitexact_cv2(rng):
    from yolov5_tpu.data.device_aug import rgb_to_hsv_u8

    im = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    ref = cv2.cvtColor(im, cv2.COLOR_RGB2HSV).astype(np.int32)
    h, s, v = rgb_to_hsv_u8(jnp.asarray(im))
    got = np.stack([np.asarray(h), np.asarray(s), np.asarray(v)], -1)
    np.testing.assert_array_equal(got, ref)


def test_hsv_jitter_lut_matches_cv2_lut(rng):
    """Device jitter == host cv2 LUT path (reference augmentations.py:69-82)
    given identical gains. ~0.005% of pixels may differ by 1 LSB from cv2's
    FMA contraction in HSV2RGB; anything beyond that is a real regression
    (the continuous-HSV version this replaced measurably broke training)."""
    from yolov5_tpu.data.augment import augment_hsv as host_hsv
    from yolov5_tpu.data.device_aug import hsv_jitter_lut

    total_bad = total = 0
    for trial in range(4):
        # width must be a multiple of the SIMD register width (32 px): cv2's
        # HSV2RGB truncates in its vector path but ROUNDS in the per-row
        # scalar tail, so e.g. 48-wide images get mixed semantics (measured:
        # 8% of pixels). Train images (320/640) are 32-aligned = pure trunc.
        im = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        im[:8] = 114  # letterbox border gray
        r = rng.uniform(-1, 1, 3) * [0.015, 0.7, 0.4] + 1

        class _Shim:  # feed host augment_hsv the exact same gains
            def uniform(self, lo, hi, n, _r=r):
                return np.asarray(
                    [(_r[0] - 1) / 0.015, (_r[1] - 1) / 0.7, (_r[2] - 1) / 0.4])

        host = host_hsv(im[..., ::-1].copy(), rng=_Shim())[..., ::-1]
        dev = np.asarray(hsv_jitter_lut(
            jnp.asarray(im)[None], jnp.asarray(r, jnp.float32)[None]))[0]
        d = np.abs(host.astype(int) - dev.astype(int))
        assert d.max() <= 1
        total_bad += int((d > 0).sum())
        total += d.size
    assert total_bad / total < 5e-4, f"{total_bad}/{total} pixels off by 1"


def test_augment_hsv_preserves_shape_dtype(rng):
    ims = jnp.asarray(rng.integers(0, 255, (2, 16, 16, 3), dtype=np.uint8))
    out = augment_hsv(ims, jax.random.PRNGKey(0))
    assert out.shape == ims.shape and out.dtype == jnp.uint8


def test_affine_sample_identity(rng):
    im = rng.integers(0, 255, (16, 16, 3)).astype(np.float32)
    out = np.asarray(affine_sample(jnp.asarray(im), jnp.eye(3), 16, 16))
    np.testing.assert_allclose(out, im, atol=1e-3)


def test_affine_sample_matches_cv2_warp(rng):
    im = rng.integers(0, 255, (32, 32, 3)).astype(np.float32)
    # rotation + translation matrix
    M = cv2.getRotationMatrix2D((16, 16), 20, 0.9)
    M3 = np.eye(3)
    M3[:2] = M
    ref = cv2.warpAffine(im, M, (32, 32), borderValue=(114, 114, 114),
                         flags=cv2.INTER_LINEAR)
    out = np.asarray(affine_sample(jnp.asarray(im), jnp.asarray(np.linalg.inv(M3)),
                                   32, 32))
    # interiors agree; borders differ by interpolation edge handling
    diff = np.abs(out[4:-4, 4:-4] - ref[4:-4, 4:-4])
    assert np.median(diff) < 1.0 and np.percentile(diff, 95) < 16.0


def test_random_perspective_identity_when_zero(rng):
    ims = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8))
    t = jnp.asarray([[[0, 0.5, 0.5, 0.4, 0.3]], [[1, 0.3, 0.3, 0.2, 0.2]]], jnp.float32)
    v = jnp.ones((2, 1), bool)
    out, t2, v2 = random_perspective(ims, t, v, jax.random.PRNGKey(0),
                                     degrees=0, translate=0, scale=0, shear=0)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-5)
    assert np.asarray(v2).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ims), atol=1)


def test_random_perspective_translate_moves_boxes(rng):
    ims = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8))
    t = jnp.tile(jnp.asarray([[[0, 0.5, 0.5, 0.3, 0.3]]], jnp.float32), (4, 1, 1))
    v = jnp.ones((4, 1), bool)
    out, t2, v2 = random_perspective(ims, t, v, jax.random.PRNGKey(1),
                                     degrees=0, translate=0.3, scale=0, shear=0)
    t2 = np.asarray(t2)
    moved = np.abs(t2[:, 0, 1:3] - 0.5).max(-1)
    assert (moved > 0.01).any()  # centers moved
    # surviving boxes keep their size (pure translation)
    keep = np.asarray(v2)[:, 0]
    if keep.any():
        np.testing.assert_allclose(t2[keep, 0, 3:5], 0.3, atol=0.02)


def test_flip_lr_device(rng):
    ims = jnp.asarray(rng.integers(0, 255, (2, 8, 8, 3), dtype=np.uint8))
    t = jnp.asarray([[[0, 0.2, 0.5, 0.1, 0.1]]] * 2, jnp.float32)
    out, t2 = random_flip_lr(ims, t, jax.random.PRNGKey(0), p=1.0)
    np.testing.assert_allclose(np.asarray(t2)[:, 0, 1], 0.8, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ims)[:, :, ::-1])


def test_device_augment_jits(rng):
    batch = {
        "images": jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)),
        "targets": jnp.asarray([[[0, 0.5, 0.5, 0.4, 0.3]]] * 2, jnp.float32),
        "valid": jnp.ones((2, 1), bool),
    }
    hyp = {"degrees": 5.0, "translate": 0.1, "scale": 0.3, "hsv_h": 0.015,
           "hsv_s": 0.7, "hsv_v": 0.4, "fliplr": 0.5}
    fn = jax.jit(lambda b, k: device_augment(b, k, hyp))
    out = fn(batch, jax.random.PRNGKey(0))
    assert out["images"].shape == batch["images"].shape
    assert out["images"].dtype == jnp.uint8
    assert np.isfinite(np.asarray(out["targets"])).all()


def test_mosaic_device_composition(rng):
    """Known tile sizes + fixed key: content lands per the quadrant formula,
    labels stay valid, and zero-geometry warp crops the center window."""
    from yolov5_tpu.data.device_aug import mosaic_device

    s = 64
    bs = 2
    tiles = np.full((bs, 4, s, s, 3), 114, np.uint8)
    tile_hw = np.zeros((bs, 4, 2), np.int32)
    targets4 = np.zeros((bs, 4, 4, 5), np.float32)
    valid4 = np.zeros((bs, 4, 4), bool)
    colors = [50, 100, 150, 200]
    for b in range(bs):
        for k in range(4):
            h, w = 48, 56
            tiles[b, k, :h, :w] = colors[k]
            tile_hw[b, k] = (h, w)
            targets4[b, k, 0] = [k, 0.5, 0.5, 0.5, 0.5]
            valid4[b, k, 0] = True

    hyp = {"degrees": 0.0, "translate": 0.0, "scale": 0.0, "shear": 0.0,
           "perspective": 0.0}
    images, targets, valid = jax.jit(
        lambda t, hw, t4, v4, k: mosaic_device(t, hw, t4, v4, k, hyp)
    )(jnp.asarray(tiles), jnp.asarray(tile_hw), jnp.asarray(targets4),
      jnp.asarray(valid4), jax.random.PRNGKey(3))
    images = np.asarray(images)
    targets = np.asarray(targets)
    valid = np.asarray(valid)
    assert images.shape == (bs, s, s, 3)
    assert targets.shape == (bs, 16, 5)
    # with zero geometry the crop is the center s-window of the 2s canvas,
    # which contains the mosaic center -> all four colors appear somewhere
    # across the batch, and background gray fills the rest
    vals = set(np.unique(images))
    assert 114 in vals
    assert len(vals.intersection(set(colors))) >= 2
    # surviving labels are inside [0, 1] with sane sizes
    t = targets[valid]
    if len(t):
        assert (t[:, 1:3] >= -1e-5).all() and (t[:, 1:3] <= 1 + 1e-5).all()
        assert (t[:, 3:5] > 0).all() and (t[:, 3:5] <= 1 + 1e-5).all()


def test_mosaic_device_in_train_step(rng):
    """Full train step consuming raw tile batches compiles and learns."""
    from yolov5_tpu.models import DetectionModel
    from yolov5_tpu.train.loss import ComputeLoss
    from yolov5_tpu.train.optim import build_optimizer
    from yolov5_tpu.train.trainer import init_train_state, make_train_step, scale_hyp

    TINY = {
        "nc": 3, "depth_multiple": 0.33, "width_multiple": 0.125,
        "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]],
        "backbone": [
            [-1, 1, "Conv", [64, 6, 2, 2]], [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "C3", [128]], [-1, 1, "Conv", [256, 3, 2]],
            [-1, 1, "C3", [256]], [-1, 1, "Conv", [512, 3, 2]],
            [-1, 1, "SPPF", [512, 5]],
        ],
        "head": [
            [-1, 1, "Conv", [256, 1, 1]],
            [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
            [[-1, 4], 1, "Concat", [1]], [-1, 1, "C3", [256, False]],
            [[10, 7], 1, "Detect", ["nc", "anchors"]],
        ],
    }
    m = DetectionModel(TINY)
    hyp = scale_hyp({"box": 0.05, "obj": 1.0, "cls": 0.5, "anchor_t": 4.0,
                     "fl_gamma": 0.0, "lr0": 0.01, "lrf": 1.0, "momentum": 0.9,
                     "weight_decay": 0.0, "warmup_epochs": 0.0,
                     "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
                     "degrees": 0.0, "translate": 0.1, "scale": 0.3,
                     "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
                     "fliplr": 0.5, "mosaic": 1.0},
                    nl=2, nc=3, imgsz=64)
    loss_fn = ComputeLoss(m.anchors_per_stride, 3, hyp)
    tx = build_optimizer(m.params, hyp, epochs=2, steps_per_epoch=2, batch_size=64)
    state = init_train_state(m, tx)
    step = make_train_step(m, loss_fn, tx, device_aug_hyp=hyp)

    bs, s, M = 2, 64, 4
    tiles = rng.integers(0, 255, (bs, 4, s, s, 3), dtype=np.uint8)
    tile_hw = np.full((bs, 4, 2), (48, 56), np.int32)
    targets4 = np.zeros((bs, 4, M, 5), np.float32)
    targets4[:, :, 0] = [1, 0.5, 0.5, 0.5, 0.5]
    valid4 = np.zeros((bs, 4, M), bool)
    valid4[:, :, 0] = True
    batch = {"tiles": jnp.asarray(tiles), "tile_hw": jnp.asarray(tile_hw),
             "targets4": jnp.asarray(targets4), "valid4": jnp.asarray(valid4)}
    for _ in range(3):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total"]))


def test_mosaic_fused_matches_compose_then_warp(rng):
    """The separable MXU mosaic must equal composing the 2s canvas and
    cv2.warpAffine-ing it (scale+translate), including bilinear blending
    across tile seams and 114 border fill."""
    from yolov5_tpu.data.device_aug import mosaic_fused

    s = 64
    bs = 2
    images = np.full((bs, s, s, 3), 114, np.uint8)
    hw = np.array([[48, 64], [64, 32]], np.int32)
    for b in range(bs):
        h, w = hw[b]
        images[b, :h, :w] = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)

    idx = np.array([[0, 1, 0, 1], [1, 0, 1, 0]], np.int32)
    xc = np.array([70.0, 90.0], np.float32)   # integers: numpy paste possible
    yc = np.array([90.0, 70.0], np.float32)
    r = np.array([0.8, 1.2], np.float32)
    t = np.array([[0.50 * s, 0.55 * s], [0.45 * s, 0.50 * s]], np.float32)

    targets = np.zeros((bs, 4, 5), np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.5, 0.5]
    valid = np.zeros((bs, 4), bool)
    valid[:, 0] = True

    hw4 = hw[idx].astype(np.float32)
    out, tgt, vld = jax.jit(mosaic_fused)(
        jnp.asarray(images), jnp.asarray(hw4),
        jnp.asarray(targets[idx]), jnp.asarray(valid[idx]),
        jnp.asarray(idx), jnp.asarray(xc), jnp.asarray(yc),
        jnp.asarray(r), jnp.asarray(t))
    out = np.asarray(out)

    for b in range(bs):
        canvas = np.full((2 * s, 2 * s, 3), 114, np.uint8)
        for k in range(4):
            h, w = hw[idx[b, k]]
            ox = {0: xc[b] - w, 1: xc[b], 2: xc[b] - w, 3: xc[b]}[k]
            oy = {0: yc[b] - h, 1: yc[b] - h, 2: yc[b], 3: yc[b]}[k]
            x1a, y1a = int(max(ox, 0)), int(max(oy, 0))
            x2a = int(min(ox + w, 2 * s))
            y2a = int(min(oy + h, 2 * s))
            x1b, y1b = int(x1a - ox), int(y1a - oy)
            canvas[y1a:y2a, x1a:x2a] = images[idx[b, k]][
                y1b : y1b + (y2a - y1a), x1b : x1b + (x2a - x1a)]
        M = np.array([[r[b], 0, t[b, 0] - r[b] * s],
                      [0, r[b], t[b, 1] - r[b] * s]], np.float32)
        ref = cv2.warpAffine(canvas, M, (s, s), flags=cv2.INTER_LINEAR,
                             borderValue=(114, 114, 114))
        diff = np.abs(out[b].astype(np.int32) - ref.astype(np.int32))
        # bf16 matmuls round pixel values; allow a few LSBs on a tiny fraction
        assert np.mean(diff) < 1.0, np.mean(diff)
        assert np.quantile(diff, 0.99) <= 3, np.quantile(diff, 0.99)

    # labels: the one valid box per tile lands where the transform says
    b = 0
    h0, w0 = hw[idx[b, 0]]
    ox, oy = xc[b] - w0, yc[b] - h0
    def expect(center, size, o, off):
        lo = np.clip((center - size / 2 + o) * r[b] + off - r[b] * s, 0, s)
        hi = np.clip((center + size / 2 + o) * r[b] + off - r[b] * s, 0, s)
        return (lo + hi) / 2
    cx = expect(0.5 * w0, 0.5 * w0, ox, t[b, 0])
    cy = expect(0.5 * h0, 0.5 * h0, oy, t[b, 1])
    tgt = np.asarray(tgt)
    assert np.asarray(vld)[b, 0]
    np.testing.assert_allclose(tgt[b, 0, 1] * s, cx, atol=0.6)
    np.testing.assert_allclose(tgt[b, 0, 2] * s, cy, atol=0.6)


def test_mosaic_fused_out_size_matches_resized_oracle(rng):
    """Multi-scale composed INTO the mosaic: mosaic_fused(out_size=q*s) must
    equal composing the 2s canvas and warping with the q-scaled affine
    (cv2 oracle) — i.e. the reference's mosaic-then-resize recipe in one
    resample. Labels must be bit-identical to the base-size labels
    (normalized coordinates are scale-invariant)."""
    from yolov5_tpu.data.device_aug import mosaic_fused

    s, out_s = 64, 48
    bs = 2
    images = np.full((bs, s, s, 3), 114, np.uint8)
    hw = np.array([[48, 64], [64, 32]], np.int32)
    for b in range(bs):
        h, w = hw[b]
        images[b, :h, :w] = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    idx = np.array([[0, 1, 0, 1], [1, 0, 1, 0]], np.int32)
    xc = np.array([70.0, 90.0], np.float32)
    yc = np.array([90.0, 70.0], np.float32)
    r = np.array([0.8, 1.2], np.float32)
    t = np.array([[0.50 * s, 0.55 * s], [0.45 * s, 0.50 * s]], np.float32)
    targets = np.zeros((bs, 4, 5), np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.5, 0.5]
    valid = np.zeros((bs, 4), bool)
    valid[:, 0] = True
    hw4 = hw[idx].astype(np.float32)
    args = (jnp.asarray(images), jnp.asarray(hw4), jnp.asarray(targets[idx]),
            jnp.asarray(valid[idx]), jnp.asarray(idx), jnp.asarray(xc),
            jnp.asarray(yc), jnp.asarray(r), jnp.asarray(t))
    out0, tgt0, vld0 = jax.jit(mosaic_fused)(*args)
    out, tgt, vld = jax.jit(
        lambda *a: mosaic_fused(*a, out_size=out_s))(*args)
    assert out.shape == (bs, out_s, out_s, 3)
    np.testing.assert_array_equal(np.asarray(tgt), np.asarray(tgt0))
    np.testing.assert_array_equal(np.asarray(vld), np.asarray(vld0))

    q = out_s / s
    for b in range(bs):
        canvas = np.full((2 * s, 2 * s, 3), 114, np.uint8)
        for k in range(4):
            h, w = hw[idx[b, k]]
            ox = {0: xc[b] - w, 1: xc[b], 2: xc[b] - w, 3: xc[b]}[k]
            oy = {0: yc[b] - h, 1: yc[b] - h, 2: yc[b], 3: yc[b]}[k]
            x1a, y1a = int(max(ox, 0)), int(max(oy, 0))
            x2a = int(min(ox + w, 2 * s))
            y2a = int(min(oy + h, 2 * s))
            x1b, y1b = int(x1a - ox), int(y1a - oy)
            canvas[y1a:y2a, x1a:x2a] = images[idx[b, k]][
                y1b : y1b + (y2a - y1a), x1b : x1b + (x2a - x1a)]
        M = q * np.array([[r[b], 0, t[b, 0] - r[b] * s],
                          [0, r[b], t[b, 1] - r[b] * s]], np.float32)
        ref = cv2.warpAffine(canvas, M, (out_s, out_s), flags=cv2.INTER_LINEAR,
                             borderValue=(114, 114, 114))
        diff = np.abs(np.asarray(out)[b].astype(np.int32) - ref.astype(np.int32))
        assert np.mean(diff) < 1.0, np.mean(diff)
        assert np.quantile(diff, 0.99) <= 3, np.quantile(diff, 0.99)


def test_multiscale_epoch_plan():
    """Stratified device multi-scale: fixed per-size batch counts across
    epochs (no recompiles), full coverage, reshuffled assignment."""
    from yolov5_tpu.train.run import multiscale_epoch_plan

    sizes = [320, 480, 640, 800, 960]
    idx_epoch = np.arange(17 * 4).reshape(17, 4)
    rng1 = np.random.default_rng(0)
    plan1 = list(multiscale_epoch_plan(idx_epoch, sizes, rng1))
    plan2 = list(multiscale_epoch_plan(idx_epoch, sizes, rng1))
    counts1 = {sz: len(sel) for sz, sel in plan1}
    counts2 = {sz: len(sel) for sz, sel in plan2}
    assert counts1 == counts2  # same shapes every epoch -> compile once
    assert sum(counts1.values()) == 17
    assert set(counts1.values()) <= {3, 4}  # 17 = 3*5 + 2 split evenly
    rows1 = np.sort(np.concatenate([sel[:, 0] for _, sel in plan1]))
    np.testing.assert_array_equal(rows1, idx_epoch[:, 0])  # full coverage
    # assignment reshuffles between epochs
    a1 = {sz: set(sel[:, 0].tolist()) for sz, sel in plan1}
    a2 = {sz: set(sel[:, 0].tolist()) for sz, sel in plan2}
    assert any(a1[sz] != a2[sz] for sz in a1)


def test_mosaic_in_batch_in_train_step(rng):
    """Raw batches (images+hw) flow through the jitted train step with
    in-batch device mosaic and produce a finite loss."""
    from tests.test_train_step import HYP, TINY_CFG
    from yolov5_tpu.models import DetectionModel
    from yolov5_tpu.train.loss import ComputeLoss
    from yolov5_tpu.train.optim import build_optimizer
    from yolov5_tpu.train.trainer import init_train_state, make_train_step, scale_hyp

    m = DetectionModel(TINY_CFG)
    hyp = scale_hyp(HYP, nl=len(m.stride), nc=m.nc, imgsz=64)
    aug_hyp = {**HYP, "mosaic": 1.0, "scale": 0.5, "translate": 0.1,
               "fliplr": 0.5, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4}
    loss_fn = ComputeLoss(m.anchors_per_stride, m.nc, hyp)
    tx = build_optimizer(m.params, hyp, epochs=2, steps_per_epoch=4, batch_size=64)
    state = init_train_state(m, tx)
    step = make_train_step(m, loss_fn, tx, device_aug_hyp=aug_hyp)

    bs, s, M = 4, 64, 8
    images = np.full((bs, s, s, 3), 114, np.uint8)
    hw = np.zeros((bs, 2), np.int32)
    targets = np.zeros((bs, M, 5), np.float32)
    valid = np.zeros((bs, M), bool)
    for b in range(bs):
        h, w = (48 + 16 * (b % 2), 64 - 8 * (b % 3))
        images[b, :h, :w] = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        hw[b] = (h, w)
        targets[b, 0] = [b % 3, 0.5, 0.5, 0.4, 0.4]
        valid[b, 0] = True
    batch = {"images": jnp.asarray(images), "hw": jnp.asarray(hw),
             "targets": jnp.asarray(targets), "valid": jnp.asarray(valid)}
    for _ in range(2):
        state, metrics = step(state, dict(batch))
    assert np.isfinite(float(metrics["total"]))


def test_multiscale_device_mosaic_train_step(rng):
    """--multi-scale composed with --device-aug mosaic: the jitted step
    compiled at a bucket size != base emits that size internally and trains
    with a finite loss (the full reference recipe in one program)."""
    from tests.test_train_step import HYP, TINY_CFG
    from yolov5_tpu.models import DetectionModel
    from yolov5_tpu.train.loss import ComputeLoss
    from yolov5_tpu.train.optim import build_optimizer
    from yolov5_tpu.train.trainer import init_train_state, make_train_step, scale_hyp

    m = DetectionModel(TINY_CFG)
    hyp = scale_hyp(HYP, nl=len(m.stride), nc=m.nc, imgsz=64)
    aug_hyp = {**HYP, "mosaic": 1.0, "scale": 0.5, "translate": 0.1,
               "fliplr": 0.5, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4}
    loss_fn = ComputeLoss(m.anchors_per_stride, m.nc, hyp)
    tx = build_optimizer(m.params, hyp, epochs=2, steps_per_epoch=4,
                         batch_size=64)
    bs, s, M = 4, 64, 8
    images = np.full((bs, s, s, 3), 114, np.uint8)
    hw = np.zeros((bs, 2), np.int32)
    targets = np.zeros((bs, M, 5), np.float32)
    valid = np.zeros((bs, M), bool)
    for b in range(bs):
        h, w = (48 + 16 * (b % 2), 64 - 8 * (b % 3))
        images[b, :h, :w] = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        hw[b] = (h, w)
        targets[b, 0] = [b % 3, 0.5, 0.5, 0.4, 0.4]
        valid[b, 0] = True
    batch = {"images": jnp.asarray(images), "hw": jnp.asarray(hw),
             "targets": jnp.asarray(targets), "valid": jnp.asarray(valid)}
    for ms in (32, 96):  # one down-bucket, one up-bucket
        state = init_train_state(m, tx)
        step = make_train_step(m, loss_fn, tx, device_aug_hyp=aug_hyp,
                               ms_size=ms)
        state, metrics = step(state, dict(batch))
        assert np.isfinite(float(metrics["total"])), ms


def test_mosaic_probability_plain_branch(rng):
    """hyp['mosaic'] < 1: non-selected images get the reference's plain
    letterbox + scale/translate branch inside the same fused pass — self
    content centered, no partner pixels, only self labels survive."""
    from yolov5_tpu.data.device_aug import mosaic_in_batch

    s = 64
    bs = 8
    images = np.full((bs, s, s, 3), 114, np.uint8)
    hw = np.zeros((bs, 2), np.int32)
    targets = np.zeros((bs, 4, 5), np.float32)
    valid = np.zeros((bs, 4), bool)
    for b in range(bs):
        h, w = 48, 64
        images[b, :h, :w] = 20 + 20 * b  # unique gray per image
        hw[b] = (h, w)
        targets[b, 0] = [b % 3, 0.5, 0.5, 0.5, 0.5]
        valid[b, 0] = True

    # p ~ 0: every image takes the plain branch; zero scale/translate ->
    # exact centered letterbox
    hyp = {"mosaic": 1e-9, "scale": 0.0, "translate": 0.0}
    out, t, v = jax.jit(lambda i, hwv, tv, vv, k: mosaic_in_batch(
        i, hwv, tv, vv, k, hyp))(
        jnp.asarray(images), jnp.asarray(hw), jnp.asarray(targets),
        jnp.asarray(valid), jax.random.PRNGKey(0))
    out, t, v = np.asarray(out), np.asarray(t), np.asarray(v)
    for b in range(bs):
        own = 20 + 20 * b
        others = {20 + 20 * k for k in range(bs)} - {own}
        present = set(np.unique(out[b]))
        assert own in present, "self content must appear"
        assert not (present & others), "partner tiles must not appear"
        # content centered: rows 8..56 colored, borders gray
        assert (out[b, :7] == 114).all() and (out[b, 57:] == 114).all()
        # exactly the self label survives, centered
        tb = t[b][v[b]]
        assert len(tb) == 1
        np.testing.assert_allclose(tb[0, 1:3], [0.5, 0.5], atol=0.03)

    # p = 0.5: both branches occur across the batch
    hyp2 = {"mosaic": 0.5, "scale": 0.0, "translate": 0.0}
    out2, t2, v2 = jax.jit(lambda i, hwv, tv, vv, k: mosaic_in_batch(
        i, hwv, tv, vv, k, hyp2))(
        jnp.asarray(images), jnp.asarray(hw), jnp.asarray(targets),
        jnp.asarray(valid), jax.random.PRNGKey(1))
    n_plain = 0
    for b in range(bs):
        others = {20 + 20 * k for k in range(bs)} - {20 + 20 * b}
        if not (set(np.unique(np.asarray(out2)[b])) & others):
            n_plain += 1
    assert 0 < n_plain < bs, f"both branches expected, got {n_plain}/8 plain"
