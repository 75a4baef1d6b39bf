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
