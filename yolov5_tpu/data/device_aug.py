"""On-device (jit-fused) training augmentations.

The reference runs HSV jitter / warpAffine / flips in OpenCV on CPU worker
processes (utils/augmentations.py). Here the same transforms are pure XLA on
the training device, fused into the step: the host feeder only decodes +
letterboxes, batches cross PCIe as uint8, and the per-image matrix math +
bilinear resampling runs on the VPU where it's effectively free next to the
convs.

Semantics follow the host versions in data/augment.py (the executable spec —
tests cross-check against cv2). Mosaic composition stays on the host this
round (ragged label bookkeeping); HSV/affine/flip are the per-pixel hot ops.
All functions take an explicit PRNG key and are shape-static.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------

def rgb_to_hsv(x):
    """x (..., 3) float 0-1 -> h 0-1, s 0-1, v 0-1."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn + 1e-12
    h = jnp.where(
        mx == r, (g - b) / d % 6.0,
        jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0),
    ) / 6.0
    s = d / (mx + 1e-12)
    return h, s, mx


def hsv_to_rgb(h, s, v):
    h6 = h * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def augment_hsv(images, key, hgain=0.015, sgain=0.7, vgain=0.4):
    """Per-image HSV jitter. images (bs, h, w, 3) uint8 RGB -> uint8."""
    bs = images.shape[0]
    r = jax.random.uniform(key, (bs, 3), minval=-1.0, maxval=1.0)
    r = r * jnp.asarray([hgain, sgain, vgain]) + 1.0
    x = images.astype(jnp.float32) / 255.0
    h, s, v = rgb_to_hsv(x)
    h = (h * r[:, 0, None, None]) % 1.0
    s = jnp.clip(s * r[:, 1, None, None], 0.0, 1.0)
    v = jnp.clip(v * r[:, 2, None, None], 0.0, 1.0)
    out = hsv_to_rgb(h, s, v)
    return jnp.clip(out * 255.0 + 0.5, 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def _affine_matrices(key, bs, height, width, degrees, translate, scale, shear,
                     perspective):
    """Per-image composed C*P*R*S*T 3x3 matrices + their scale factors
    (same composition as data/augment.py random_perspective)."""
    ks = jax.random.split(key, 6)
    u = lambda k, lo, hi, shape=(bs,): jax.random.uniform(k, shape, minval=lo, maxval=hi)

    C = jnp.tile(jnp.eye(3), (bs, 1, 1))
    C = C.at[:, 0, 2].set(-width / 2).at[:, 1, 2].set(-height / 2)

    P = jnp.tile(jnp.eye(3), (bs, 1, 1))
    P = P.at[:, 2, 0].set(u(ks[0], -perspective, perspective))
    P = P.at[:, 2, 1].set(u(ks[1], -perspective, perspective))

    a = u(ks[2], -degrees, degrees) * math.pi / 180.0
    s = u(ks[3], 1 - scale, 1 + scale)
    cos, sin = jnp.cos(a) * s, jnp.sin(a) * s
    R = jnp.tile(jnp.eye(3), (bs, 1, 1))
    R = R.at[:, 0, 0].set(cos).at[:, 0, 1].set(sin)
    R = R.at[:, 1, 0].set(-sin).at[:, 1, 1].set(cos)

    S = jnp.tile(jnp.eye(3), (bs, 1, 1))
    sh = u(ks[4], -shear, shear, (bs, 2)) * math.pi / 180.0
    S = S.at[:, 0, 1].set(jnp.tan(sh[:, 0])).at[:, 1, 0].set(jnp.tan(sh[:, 1]))

    T = jnp.tile(jnp.eye(3), (bs, 1, 1))
    t = u(ks[5], 0.5 - translate, 0.5 + translate, (bs, 2))
    T = T.at[:, 0, 2].set(t[:, 0] * width).at[:, 1, 2].set(t[:, 1] * height)

    M = T @ S @ R @ P @ C
    return M, s


def affine_sample(image, M_inv, out_h, out_w, fill=114.0):
    """Inverse-map bilinear sampling: out[y, x] = img(M_inv @ (x, y, 1)).
    image (h, w, 3) float; M_inv (3, 3). Out-of-bounds -> fill."""
    h, w = image.shape[:2]
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    ones = jnp.ones_like(xs)
    src = jnp.einsum("ij,jhw->ihw", M_inv, jnp.stack([xs, ys, ones]))
    sx = src[0] / jnp.maximum(src[2], 1e-8)
    sy = src[1] / jnp.maximum(src[2], 1e-8)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = image[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inside[..., None], v, fill)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx)[..., None] + v01 * fx[..., None]
    bot = v10 * (1 - fx)[..., None] + v11 * fx[..., None]
    return top * (1 - fy)[..., None] + bot * fy[..., None]


def random_perspective(images, targets, valid, key, degrees=0.0, translate=0.1,
                       scale=0.5, shear=0.0, perspective=0.0):
    """Batched on-device warp. images (bs, h, w, 3) uint8; targets
    (bs, M, 5) [cls, x, y, w, h] normalized; valid (bs, M) bool.
    Returns warped images + updated targets/valid (degenerate boxes masked,
    box_candidates semantics)."""
    bs, h, w, _ = images.shape
    M, s = _affine_matrices(key, bs, h, w, degrees, translate, scale, shear,
                            perspective)
    M_inv = jnp.linalg.inv(M)

    imgs_f = images.astype(jnp.float32)
    out = jax.vmap(lambda im, mi: affine_sample(im, mi, h, w))(imgs_f, M_inv)
    out = jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)

    # labels: 4 corners through M, re-derive axis-aligned boxes
    cls = targets[..., 0:1]
    px = targets[..., 1] * w
    py = targets[..., 2] * h
    pw = targets[..., 3] * w
    ph = targets[..., 4] * h
    x1, y1 = px - pw / 2, py - ph / 2
    x2, y2 = px + pw / 2, py + ph / 2
    corners = jnp.stack(
        [jnp.stack([x1, y1], -1), jnp.stack([x2, y2], -1),
         jnp.stack([x1, y2], -1), jnp.stack([x2, y1], -1)], axis=2
    )  # (bs, M, 4, 2)
    ones = jnp.ones(corners.shape[:-1] + (1,))
    pts = jnp.concatenate([corners, ones], axis=-1)  # (bs, M, 4, 3)
    warped = jnp.einsum("bij,bmkj->bmki", M, pts)
    wxy = warped[..., :2] / jnp.maximum(warped[..., 2:3], 1e-8)
    nx1 = jnp.clip(wxy[..., 0].min(-1), 0, w)
    ny1 = jnp.clip(wxy[..., 1].min(-1), 0, h)
    nx2 = jnp.clip(wxy[..., 0].max(-1), 0, w)
    ny2 = jnp.clip(wxy[..., 1].max(-1), 0, h)

    nw = nx2 - nx1
    nh = ny2 - ny1
    ow = pw * s[:, None]  # pre-warp size at the applied scale
    oh = ph * s[:, None]
    ar = jnp.maximum(nw / (nh + 1e-16), nh / (nw + 1e-16))
    keep = ((nw > 2) & (nh > 2) & (nw * nh / (ow * oh + 1e-16) > 0.1) & (ar < 100))
    new_targets = jnp.stack(
        [cls[..., 0], (nx1 + nx2) / 2 / w, (ny1 + ny2) / 2 / h, nw / w, nh / h],
        axis=-1,
    )
    return out, new_targets, valid & keep


def random_flip_lr(images, targets, key, p=0.5):
    """Batched left-right flip with probability p per image."""
    bs = images.shape[0]
    do = jax.random.uniform(key, (bs,)) < p
    flipped = images[:, :, ::-1, :]
    images = jnp.where(do[:, None, None, None], flipped, images)
    x = jnp.where(do[:, None], 1.0 - targets[..., 1], targets[..., 1])
    targets = targets.at[..., 1].set(x)
    return images, targets


def random_flip_ud(images, targets, key, p=0.0):
    bs = images.shape[0]
    do = jax.random.uniform(key, (bs,)) < p
    flipped = images[:, ::-1, :, :]
    images = jnp.where(do[:, None, None, None], flipped, images)
    y = jnp.where(do[:, None], 1.0 - targets[..., 2], targets[..., 2])
    targets = targets.at[..., 2].set(y)
    return images, targets


def device_augment(batch, key, hyp):
    """Full on-device pipeline: perspective -> HSV -> flips. batch dict of
    images uint8 / targets / valid; returns same structure. Jit-safe."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    images, targets, valid = batch["images"], batch["targets"], batch["valid"]
    if any(hyp.get(k, 0) for k in ("degrees", "translate", "scale", "shear", "perspective")):
        images, targets, valid = random_perspective(
            images, targets, valid, k1,
            degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
            scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
            perspective=hyp.get("perspective", 0.0),
        )
    if any(hyp.get(k, 0) for k in ("hsv_h", "hsv_s", "hsv_v")):
        images = augment_hsv(images, k2, hyp.get("hsv_h", 0.015),
                             hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4))
    if hyp.get("fliplr", 0):
        images, targets = random_flip_lr(images, targets, k3, hyp["fliplr"])
    if hyp.get("flipud", 0):
        images, targets = random_flip_ud(images, targets, k4, hyp["flipud"])
    return dict(batch, images=images, targets=targets, valid=valid)
