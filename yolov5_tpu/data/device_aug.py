"""On-device (jit-fused) training augmentations.

The reference runs HSV jitter / warpAffine / flips in OpenCV on CPU worker
processes (utils/augmentations.py). Here the same transforms are pure XLA on
the training device, fused into the step: the host feeder only decodes +
letterboxes, batches cross PCIe as uint8, and the per-image matrix math +
bilinear resampling runs on the VPU where it's effectively free next to the
convs.

Semantics follow the host versions in data/augment.py (the executable spec —
tests cross-check against cv2). All functions take an explicit PRNG key and
are shape-static.

Measured tradeoffs (v5e, yolov5n@320 bs16): plain train step 11 ms; with
on-device mosaic+aug 89 ms (179 img/s device-bound) — the inverse-map gather
over the 3s canvas dominates and is the round-2 Pallas target. The host
mosaic pipeline reaches ~100 img/s host-bound; device mosaic also ships 4x
the H2D bytes (4 tiles), which a tunneled link amplifies. Host mosaic stays
the default; --device-aug opts in.
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


def _rne_div(num, den):
    """round-half-to-even(num / den) for positive int32 num (scalar) / den
    (array), den > 0 — exact replica of OpenCV's cvRound(double division)
    used when building its fixed-point HSV tables (saturate_cast<int> of an
    exact-in-double quotient)."""
    q = num // den
    r2 = 2 * (num - q * den)
    round_up = (r2 > den) | ((r2 == den) & (q % 2 == 1))
    return q + round_up.astype(jnp.int32)


def rgb_to_hsv_u8(images):
    """cv2-exact uint8 RGB -> (H 0..179, S 0..255, V 0..255) int32.

    Bit-for-bit replica of OpenCV's fixed-point RGB2HSV_b (hsv_shift=12,
    sdiv/hdiv tables computed inline with exact round-half-even division;
    V==R takes priority over V==G exactly as OpenCV's mask cascade does).
    """
    x = images.astype(jnp.int32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - vmin
    sdiv = jnp.where(v > 0, _rne_div(255 << 12, jnp.maximum(v, 1)), 0)
    s = (diff * sdiv + (1 << 11)) >> 12
    hdiv = jnp.where(diff > 0, _rne_div(180 << 12, 6 * jnp.maximum(diff, 1)), 0)
    h_raw = jnp.where(
        v == r, g - b,
        jnp.where(v == g, b - r + 2 * diff, r - g + 4 * diff))
    h = jnp.floor_divide(h_raw * hdiv + (1 << 11), 1 << 12)
    h = h + jnp.where(h < 0, 180, 0)
    return h, s, v


def hsv_jitter_lut(images, r):
    """cv2-exact LUT HSV jitter with explicit per-image gains r (bs, 3).

    Matches the reference pipeline (augmentations.py:69-82 — the host twin is
    data/augment.py:augment_hsv) bit-for-bit: quantize to cv2's uint8 HSV,
    apply `((x*r0)%180) / clip(x*r1) / clip(x*r2)` LUT gains with numpy's
    truncating astype, convert back through OpenCV's float HSV2RGB with
    round-half-even saturate_cast. The previous continuous float-HSV jitter
    (no intermediate uint8 quantization) measurably broke training when
    combined with mosaic (mAP50 0.755 vs 0.907 — see runs/train/devdet_r3 vs
    devdet_nohsv), so exact LUT semantics are load-bearing, not cosmetic.
    """
    h8, s8, v8 = rgb_to_hsv_u8(images)
    r0 = r[:, 0, None, None]
    r1 = r[:, 1, None, None]
    r2 = r[:, 2, None, None]
    h8 = jnp.floor((h8.astype(jnp.float32) * r0) % 180.0)
    s8 = jnp.floor(jnp.clip(s8.astype(jnp.float32) * r1, 0.0, 255.0))
    v8 = jnp.floor(jnp.clip(v8.astype(jnp.float32) * r2, 0.0, 255.0))
    # back-conversion: cv2's 8u HSV2RGB is fp32 with reciprocal scaling and a
    # TRUNCATING (not rounding) final cast — verified bit-exact on the full
    # 180x256x256 cube except 0.005% of pixels (+-1 from cv2's FMA
    # contraction, which XLA may or may not mirror per platform)
    h6 = h8 * jnp.float32(6.0 / 180.0)
    s = s8 * jnp.float32(1.0 / 255.0)
    v = v8 * jnp.float32(1.0 / 255.0)
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32)  # h8 <= 179 so h6 < 6; no mod needed
    sel = [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5]
    rr = jnp.select(sel, [v, q, p, p, t, v])
    gg = jnp.select(sel, [t, v, v, q, p, p])
    bb = jnp.select(sel, [p, p, t, v, v, q])
    out = jnp.stack([rr, gg, bb], axis=-1)
    return jnp.clip(jnp.floor(out * jnp.float32(255.0)), 0, 255).astype(jnp.uint8)


def augment_hsv(images, key, hgain=0.015, sgain=0.7, vgain=0.4):
    """Per-image HSV jitter. images (bs, h, w, 3) uint8 RGB -> uint8."""
    bs = images.shape[0]
    r = jax.random.uniform(key, (bs, 3), minval=-1.0, maxval=1.0)
    r = r * jnp.asarray([hgain, sgain, vgain]) + 1.0
    return hsv_jitter_lut(images, r)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def _affine_matrices(key, bs, height, width, degrees, translate, scale, shear,
                     perspective, out_height=None, out_width=None,
                     post_scale=1.0):
    """Per-image composed C*P*R*S*T 3x3 matrices + their scale factors
    (same composition as data/augment.py random_perspective). When out_*
    differ from the input dims this reproduces the reference's mosaic
    border-crop: centering uses the input size, translation the output."""
    out_height = height if out_height is None else out_height
    out_width = width if out_width is None else out_width
    ks = jax.random.split(key, 6)
    u = lambda k, lo, hi, shape=(bs,): jax.random.uniform(k, shape, minval=lo, maxval=hi)

    C = jnp.tile(jnp.eye(3), (bs, 1, 1))
    C = C.at[:, 0, 2].set(-width / 2).at[:, 1, 2].set(-height / 2)

    P = jnp.tile(jnp.eye(3), (bs, 1, 1))
    P = P.at[:, 2, 0].set(u(ks[0], -perspective, perspective))
    P = P.at[:, 2, 1].set(u(ks[1], -perspective, perspective))

    a = u(ks[2], -degrees, degrees) * math.pi / 180.0
    s = u(ks[3], 1 - scale, 1 + scale) * post_scale
    cos, sin = jnp.cos(a) * s, jnp.sin(a) * s
    R = jnp.tile(jnp.eye(3), (bs, 1, 1))
    R = R.at[:, 0, 0].set(cos).at[:, 0, 1].set(sin)
    R = R.at[:, 1, 0].set(-sin).at[:, 1, 1].set(cos)

    S = jnp.tile(jnp.eye(3), (bs, 1, 1))
    sh = u(ks[4], -shear, shear, (bs, 2)) * math.pi / 180.0
    S = S.at[:, 0, 1].set(jnp.tan(sh[:, 0])).at[:, 1, 0].set(jnp.tan(sh[:, 1]))

    T = jnp.tile(jnp.eye(3), (bs, 1, 1))
    t = u(ks[5], 0.5 - translate, 0.5 + translate, (bs, 2))
    T = T.at[:, 0, 2].set(t[:, 0] * out_width).at[:, 1, 2].set(t[:, 1] * out_height)

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
                       scale=0.5, shear=0.0, perspective=0.0, out_hw=None,
                       post_scale=1.0):
    """Batched on-device warp. images (bs, h, w, 3) uint8; targets
    (bs, M, 5) [cls, x, y, w, h] normalized; valid (bs, M) bool.
    out_hw smaller than the input reproduces the mosaic border crop.
    post_scale: extra deterministic zoom folded into the random scale — the
    per-batch multi-scale resize (reference train.py:393-398) composed into
    the same warp instead of a second bilinear pass. The >2 px candidate
    thresholds then apply at the scaled resolution (slightly stricter for
    q<1 than the reference's pre-resize filter; the area-ratio filter is
    scale-invariant).
    Returns warped images + updated targets/valid (degenerate boxes masked,
    box_candidates semantics)."""
    bs, h, w, _ = images.shape
    oh, ow = out_hw if out_hw is not None else (h, w)
    M, s = _affine_matrices(key, bs, h, w, degrees, translate, scale, shear,
                            perspective, out_height=oh, out_width=ow,
                            post_scale=post_scale)
    M_inv = jnp.linalg.inv(M)

    imgs_f = images.astype(jnp.float32)
    out = jax.vmap(lambda im, mi: affine_sample(im, mi, oh, ow))(imgs_f, M_inv)
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
    nx1 = jnp.clip(wxy[..., 0].min(-1), 0, ow)
    ny1 = jnp.clip(wxy[..., 1].min(-1), 0, oh)
    nx2 = jnp.clip(wxy[..., 0].max(-1), 0, ow)
    ny2 = jnp.clip(wxy[..., 1].max(-1), 0, oh)

    nw = nx2 - nx1
    nh = ny2 - ny1
    pre_w = pw * s[:, None]  # pre-warp size at the applied scale
    pre_h = ph * s[:, None]
    ar = jnp.maximum(nw / (nh + 1e-16), nh / (nw + 1e-16))
    keep = ((nw > 2) & (nh > 2) & (nw * nh / (pre_w * pre_h + 1e-16) > 0.1)
            & (ar < 100))
    new_targets = jnp.stack(
        [cls[..., 0], (nx1 + nx2) / 2 / ow, (ny1 + ny2) / 2 / oh, nw / ow, nh / oh],
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


# ---------------------------------------------------------------------------
# MXU mosaic: composition + scale/translate warp as separable banded matmuls
# ---------------------------------------------------------------------------
# With the default geometry hyps (degrees=shear=perspective=0 in every
# scratch-* preset) the mosaic pipeline's warp is pure scale+translate, which
# is SEPARABLE: out = Wy @ canvas @ Wx^T with per-image bilinear weight
# matrices built from iotas. Since the canvas is itself four translated tiles,
# the whole mosaic collapses to four per-tile einsums — no 2s canvas in HBM,
# no gather (TPU gathers run on the scalar unit; these matmuls run on the
# MXU). Per-tap content/canvas masking makes this EXACT vs compose-then-warp,
# including bilinear blending across tile seams.


def _axis_weights(A, B, content, origin, n_in, n_out, canvas):
    """Bilinear resample weights for out[o] = src[(o - B) / A] where src is a
    tile axis of `content` valid px placed at `origin` on a `canvas`-px axis.

    A, B, content, origin: (bs,) floats. Returns (bs, n_out, n_in) weights;
    taps outside the tile content or outside the canvas get zero weight (the
    caller backfills the lost mass with the 114 border color).
    """
    o = jnp.arange(n_out, dtype=jnp.float32)
    i = jnp.arange(n_in, dtype=jnp.float32)
    # tile-local tap position for each output pixel
    u = (o[None, :] - B[:, None]) / A[:, None] - origin[:, None]  # (bs, n_out)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, :, None] - i[None, None, :]))
    inside = (i[None, None, :] < content[:, None, None]) & (
        (i[None, None, :] + origin[:, None, None] >= 0)
        & (i[None, None, :] + origin[:, None, None] <= canvas - 1)
    )
    return jnp.where(inside, w, 0.0)


def _tile_origins(k, xc, yc, h, w):
    """Content-corner placement per mosaic quadrant (reference x1a/y1a math,
    dataloaders.py:798-855). All args (bs,) floats; returns (ox, oy)."""
    if k == 0:  # top-left: bottom-right corner at (xc, yc)
        return xc - w, yc - h
    if k == 1:  # top-right
        return xc, yc - h
    if k == 2:  # bottom-left
        return xc - w, yc
    return xc, yc  # bottom-right


def mosaic_in_batch(images, hw, targets, valid, key, hyp, pool=None,
                    self_idx=None, out_size=None):
    """Fused on-device mosaic for raw batches.

    images: (bs, s, s, 3) uint8 — decoded images resized long-side=s, content
    in the top-left of the buffer; hw (bs, 2) content sizes; targets
    (bs, M, 5) normalized to the content; valid (bs, M).

    Partner sampling: with `pool` (the device-resident dataset cache dict)
    and `self_idx` (this batch's indices into it), the 3 partner tiles are
    drawn uniformly from the WHOLE dataset in HBM — statistically identical
    to the reference mosaic (dataloaders.py:806). Without a pool, partners
    come from within the (shuffled) batch — a uniform sample too, but
    correlated within a step; used when only the batch was shipped.

    Geometry: scale+translate (the default hyps) runs on the separable MXU
    path; degrees/shear/perspective fall back to compose+gather
    (mosaic_device).
    """
    bs, s = images.shape[0], images.shape[1]
    kidx, kc, kw = jax.random.split(key, 3)
    if pool is not None:
        n_pool = pool["images"].shape[0]
        idx = jnp.concatenate(
            [self_idx.astype(jnp.int32)[:, None],
             jax.random.randint(kidx, (bs, 3), 0, n_pool, jnp.int32)], axis=1)
        images, hw = pool["images"], pool["hw"]
        targets, valid = pool["targets"], pool["valid"]
    else:
        idx = jnp.concatenate(
            [jnp.arange(bs, dtype=jnp.int32)[:, None],
             jax.random.randint(kidx, (bs, 3), 0, bs, jnp.int32)], axis=1)
    hw4 = hw[idx].astype(jnp.float32)          # (bs, 4, 2)
    targets4 = targets[idx]                    # (bs, 4, M, 5)
    valid4 = valid[idx]

    if any(hyp.get(k_, 0) for k_ in ("degrees", "shear", "perspective")):
        # rotation/shear/perspective are not separable: materialize tiles and
        # take the gather path
        tiles = images[idx.reshape(-1)].reshape(bs, 4, s, s, 3)
        return mosaic_device(tiles, hw4.astype(jnp.int32), targets4, valid4,
                             jax.random.fold_in(key, 1), hyp,
                             out_size=out_size)

    # mosaic center on the 2s canvas (reference uniform over [s/2, 3s/2])
    c = jax.random.uniform(kc, (bs, 2), minval=0.5 * s, maxval=1.5 * s)
    xc, yc = c[:, 0], c[:, 1]
    # scale+translate canvas->output map: x_out = r * (x - s) + t * s
    kr, kt = jax.random.split(kw)
    scale = hyp.get("scale", 0.5)
    translate = hyp.get("translate", 0.1)
    r = jax.random.uniform(kr, (bs,), minval=1 - scale, maxval=1 + scale)
    t = jax.random.uniform(kt, (bs, 2), minval=0.5 - translate,
                           maxval=0.5 + translate) * s
    hw4, targets4, valid4, xc, yc = _apply_mosaic_prob(
        key, hyp, hw4, targets4, valid4, xc, yc, s)
    return mosaic_fused(images, hw4, targets4, valid4, idx, xc, yc, r, t,
                        out_size=out_size)


def _apply_mosaic_prob(key, hyp, hw4, targets4, valid4, xc, yc, s):
    """Per-image Bernoulli(hyp['mosaic']) mosaic (reference __getitem__,
    dataloaders.py:678). A non-mosaic image is expressed in the SAME fused
    pass: partner tiles get zero content and the self tile is re-centered on
    the canvas so the scale+translate map reduces to the reference's
    letterbox + random_perspective branch — no second code path, no extra
    resample cost."""
    p = hyp.get("mosaic", 1.0)
    if p >= 1.0:
        return hw4, targets4, valid4, xc, yc
    bs = hw4.shape[0]
    do = jax.random.uniform(jax.random.fold_in(key, 7), (bs,)) < p
    h0, w0 = hw4[:, 0, 0], hw4[:, 0, 1]
    first = jnp.asarray([True, False, False, False])
    hw4 = jnp.where(do[:, None, None], hw4,
                    hw4 * first[None, :, None].astype(hw4.dtype))
    valid4 = valid4 & (do[:, None, None] | first[None, :, None])
    # content center at canvas center s: scale about the image center + jitter
    xc = jnp.where(do, xc, s + w0 / 2)
    yc = jnp.where(do, yc, s + h0 / 2)
    return hw4, targets4, valid4, xc, yc


def mosaic_fused(images, hw4, targets4, valid4, idx, xc, yc, r, t,
                 out_size=None):
    """Deterministic fused mosaic core (separable MXU path); randomness is
    drawn by the caller. `images` may be the batch or a whole-dataset pool —
    tiles are gathered by `idx` (bs, 4). See mosaic_in_batch.

    out_size (static int): emit the mosaic at a different resolution — the
    per-batch multi-scale recipe (reference train.py:393-398 resizes the
    augmented batch bilinearly). Here the resize is FREE: the scale factor
    q = out_size/s folds into the resample-weight matrices, so multi-scale
    composes with the mosaic in the same einsums (one bilinear pass, not
    two). Labels are normalized, hence computed at base scale unchanged —
    which also keeps the reference's box_candidates thresholds (>2 px) in
    base-imgsz pixels exactly as the reference applies them pre-resize."""
    bs, s = idx.shape[0], images.shape[1]
    out_s = int(out_size) if out_size else s
    q = out_s / s
    # inverse map: x_canvas = (x_out - Bx) / A with
    A = r * q
    Bx = (t[:, 0] - r * s) * q
    By = (t[:, 1] - r * s) * q

    out = jnp.zeros((bs, out_s, out_s, 3), jnp.float32)
    mass_y = []
    mass_x = []
    for k in range(4):
        h_k, w_k = hw4[:, k, 0], hw4[:, k, 1]
        ox, oy = _tile_origins(k, xc, yc, h_k, w_k)
        Wx = _axis_weights(A, Bx, w_k, ox, s, out_s, 2 * s)  # (bs, s_out, s_in)
        Wy = _axis_weights(A, By, h_k, oy, s, out_s, 2 * s)
        Wy_bf = Wy.astype(jnp.bfloat16)
        Wx_bf = Wx.astype(jnp.bfloat16)
        # gather tiles first (idx may address a whole-dataset pool), then go
        # channel-major: with c in the minor dim the resample einsums cannot
        # map onto the MXU without a transpose and XLA falls back to VPU
        # broadcast-multiply-reduce (~7 ms/step @640). As a channel loop
        # each pass is a clean per-image (s,s)@(s,s) batched matmul.
        tile_c = images[idx[:, k]].astype(jnp.bfloat16).transpose(0, 3, 1, 2)
        chans = []
        for c in range(3):
            rows = jnp.einsum("boh,bhw->bow", Wy_bf, tile_c[:, c],
                              preferred_element_type=jnp.float32)
            chans.append(jnp.einsum("bpw,bow->bop", Wx_bf,
                                    rows.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32))
        out = out + jnp.stack(chans, axis=-1)
        mass_y.append(Wy.sum(-1))  # (bs, s)
        mass_x.append(Wx.sum(-1))
    # border fill: quadrants are disjoint, so total bilinear mass <= 1 and the
    # remainder is the 114-gray border (cv2 borderValue semantics)
    mass = sum(my[:, :, None] * mx[:, None, :] for my, mx in zip(mass_y, mass_x))
    out = out + (1.0 - jnp.minimum(mass, 1.0))[..., None] * 114.0
    out = jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)

    # labels: tile-content normalized -> canvas px -> output px -> normalized.
    # Computed with the UNSCALED (base-s) map: normalized coordinates are
    # invariant to q, and the >2 px candidate filters stay in base pixels.
    A = r
    Bx = t[:, 0] - r * s
    By = t[:, 1] - r * s
    labels = []
    valids = []
    for k in range(4):
        h_k = hw4[:, k, 0][:, None]
        w_k = hw4[:, k, 1][:, None]
        ox, oy = _tile_origins(k, xc[:, None], yc[:, None], h_k, w_k)
        tk = targets4[:, k]
        x_c = tk[..., 1] * w_k + ox
        y_c = tk[..., 2] * h_k + oy
        bw_c = tk[..., 3] * w_k
        bh_c = tk[..., 4] * h_k
        # canvas clip (reference clips labels to [0, 2s] before the warp)
        x1 = jnp.clip(x_c - bw_c / 2, 0, 2 * s)
        y1 = jnp.clip(y_c - bh_c / 2, 0, 2 * s)
        x2 = jnp.clip(x_c + bw_c / 2, 0, 2 * s)
        y2 = jnp.clip(y_c + bh_c / 2, 0, 2 * s)
        # scale+translate to output px, clip to [0, s]
        ox1 = jnp.clip(A[:, None] * x1 + Bx[:, None], 0, s)
        ox2 = jnp.clip(A[:, None] * x2 + Bx[:, None], 0, s)
        oy1 = jnp.clip(A[:, None] * y1 + By[:, None], 0, s)
        oy2 = jnp.clip(A[:, None] * y2 + By[:, None], 0, s)
        nw = ox2 - ox1
        nh = oy2 - oy1
        pre_w = (x2 - x1) * A[:, None]
        pre_h = (y2 - y1) * A[:, None]
        ar = jnp.maximum(nw / (nh + 1e-16), nh / (nw + 1e-16))
        keep = ((nw > 2) & (nh > 2)
                & (nw * nh / (pre_w * pre_h + 1e-16) > 0.1) & (ar < 100))
        labels.append(jnp.stack(
            [tk[..., 0], (ox1 + ox2) / 2 / s, (oy1 + oy2) / 2 / s,
             nw / s, nh / s], axis=-1))
        valids.append(valid4[:, k] & keep)
    return out, jnp.concatenate(labels, 1), jnp.concatenate(valids, 1)


def mosaic_device(tiles, tile_hw, targets4, valid4, key, hyp, out_size=None):
    """On-device 4-image mosaic (reference utils/dataloaders.py:798-855).

    tiles: (bs, 4, s, s, 3) uint8 — each decoded image resized long-side=s
    with its content in the TOP-LEFT corner of the tile buffer.
    tile_hw: (bs, 4, 2) int32 actual (h, w) of each tile's content.
    targets4: (bs, 4, M, 5) labels normalized to each tile's content;
    valid4: (bs, 4, M).

    Returns (images (bs, s, s, 3) uint8, targets (bs, 4M, 5) normalized,
    valid (bs, 4M)) — the composed 2s canvas is warped/cropped back to s
    with the hyp geometry, exactly the reference pipeline order.
    """
    bs, four, s, _, _ = tiles.shape
    kc, kw = jax.random.split(key)
    # random mosaic center in [s/2, 3s/2] on the 2s canvas; our working
    # canvas is 3s with an s/2 margin so any s-sized tile fits un-clamped
    c = jax.random.uniform(kc, (bs, 2), minval=0.5 * s, maxval=1.5 * s)
    xc = c[:, 0]
    yc = c[:, 1]
    margin = s // 2
    cs = 3 * s

    hw = tile_hw.astype(jnp.float32)

    def origins(k, xc, yc, h, w):
        # content-corner placement per quadrant (reference's x1a/y1a math)
        if k == 0:  # top-left: bottom-right corner at (xc, yc)
            return xc - w, yc - h
        if k == 1:  # top-right
            return xc, yc - h
        if k == 2:  # bottom-left
            return xc - w, yc
        return xc, yc  # bottom-right

    def compose_one(tiles_i, hw_i, xc_i, yc_i):
        canvas = jnp.full((cs, cs, 3), 114.0, jnp.float32)
        ys = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
        zeros = jnp.zeros((cs, cs, 3), jnp.float32)
        for k in range(4):
            h = hw_i[k, 0].astype(jnp.float32)
            w = hw_i[k, 1].astype(jnp.float32)
            ox, oy = origins(k, xc_i, yc_i, w, h)
            oxi = jnp.round(ox).astype(jnp.int32) + margin
            oyi = jnp.round(oy).astype(jnp.int32) + margin
            shifted = jax.lax.dynamic_update_slice(
                zeros, tiles_i[k].astype(jnp.float32), (oyi, oxi, 0))
            # only the tile's CONTENT rect overwrites the canvas: the s x s
            # buffer's unused region must not stamp black over neighbors
            mask = ((ys >= oyi) & (ys < oyi + hw_i[k, 0])
                    & (xs >= oxi) & (xs < oxi + hw_i[k, 1]))
            canvas = jnp.where(mask[..., None], shifted, canvas)
        return canvas

    canvas3 = jax.vmap(compose_one)(tiles, tile_hw, xc, yc)
    # static center crop 3s -> 2s (removes the helper margin)
    canvas2 = canvas3[:, margin : margin + 2 * s, margin : margin + 2 * s]
    canvas2 = jnp.clip(canvas2 + 0.5, 0, 255).astype(jnp.uint8)

    # labels -> 2s-canvas normalized coordinates
    m = targets4.shape[2]
    labels = []
    valids = []
    for k in range(4):
        h = hw[:, k, 0][:, None]
        w = hw[:, k, 1][:, None]
        ox, oy = origins(k, xc[:, None], yc[:, None], w, h)
        t = targets4[:, k]
        x = (t[..., 1] * w + ox) / (2 * s)
        y = (t[..., 2] * h + oy) / (2 * s)
        bw = t[..., 3] * w / (2 * s)
        bh = t[..., 4] * h / (2 * s)
        labels.append(jnp.stack([t[..., 0], x, y, bw, bh], axis=-1))
        valids.append(valid4[:, k])
    targets = jnp.concatenate(labels, axis=1)  # (bs, 4M)
    valid = jnp.concatenate(valids, axis=1)

    # warp/crop 2s -> s with the training geometry (reference border=-s/2);
    # out_size folds the per-batch multi-scale resize into the same warp
    out_s = int(out_size) if out_size else s
    return random_perspective(
        canvas2, targets, valid, kw,
        degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
        scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
        perspective=hyp.get("perspective", 0.0), out_hw=(out_s, out_s),
        post_scale=out_s / s,
    )


# ---------------------------------------------------------------------------
# Segment-aware variants: polygon vertices ride the same affine maps as the
# boxes, boxes are RE-DERIVED from the warped polygons (reference
# utils/segment/augmentations.py:14-120 — segment2box semantics), and GT
# instance masks are rasterized on device at the end (ops/rasterize.py).
# ---------------------------------------------------------------------------


def _segment_boxes(seg_px, ow, oh):
    """Boxes from warped polygon points, reference segment2box semantics in
    the dense-point limit. The reference resamples every polygon to 1000
    points BEFORE warping (utils/general.py:603 resample_segments), so its
    inside-points extent converges to the extent of the border-CLIPPED
    polygon. With only V (=32) warped vertices, testing raw vertices
    underestimates partially-visible instances badly (a clipped corner pulls
    the box inward by a whole edge) — this undersized-box bias was the round-2
    device-path seg mAP gap: boxes shrink and the seg loss's crop-to-box then
    truncates mask supervision. Clipping vertices to the canvas before the
    extent reproduces the 1000-point behavior exactly for convex edges at no
    cost.

    seg_px: (..., V, 2) float px. Returns (xyxy (..., 4), any_inside (...,)).
    """
    x, y = seg_px[..., 0], seg_px[..., 1]
    inside = (x >= 0) & (x <= ow) & (y >= 0) & (y <= oh)
    xc = jnp.clip(x, 0, ow)
    yc = jnp.clip(y, 0, oh)
    boxes = jnp.stack(
        [xc.min(-1), yc.min(-1), xc.max(-1), yc.max(-1)], axis=-1)
    any_in = inside.any(-1)
    return jnp.where(any_in[..., None], boxes, 0.0), any_in


def mosaic_in_batch_seg(images, hw, targets, segments, valid, key, hyp,
                        pool=None, self_idx=None, out_size=None):
    """Segment-carrying mosaic (separable geometry only). Same partner
    sampling and randomness as mosaic_in_batch (incl. whole-dataset `pool`
    partner draws); segments (bs, M, V, 2) are polygon vertices normalized
    to each image's content.

    Returns (images, targets (bs, 4M, 5), segments_out (bs, 4M, V, 2)
    output-normalized, valid (bs, 4M)).
    """
    assert not any(hyp.get(k_, 0) for k_ in ("degrees", "shear", "perspective")), (
        "device seg mosaic supports the separable scale+translate geometry; "
        "rotation/shear/perspective hyps use the host pipeline"
    )
    bs, s = images.shape[0], images.shape[1]
    kidx, kc, kw = jax.random.split(key, 3)
    if pool is not None:
        n_pool = pool["images"].shape[0]
        idx = jnp.concatenate(
            [self_idx.astype(jnp.int32)[:, None],
             jax.random.randint(kidx, (bs, 3), 0, n_pool, jnp.int32)], axis=1)
        images, hw = pool["images"], pool["hw"]
        targets, valid = pool["targets"], pool["valid"]
        segments = pool["segments"]
    else:
        idx = jnp.concatenate(
            [jnp.arange(bs, dtype=jnp.int32)[:, None],
             jax.random.randint(kidx, (bs, 3), 0, bs, jnp.int32)], axis=1)
    hw4 = hw[idx].astype(jnp.float32)
    targets4 = targets[idx]
    seg4 = segments[idx].astype(jnp.float32)  # (bs, 4, M, V, 2)
    valid4 = valid[idx]

    c = jax.random.uniform(kc, (bs, 2), minval=0.5 * s, maxval=1.5 * s)
    xc, yc = c[:, 0], c[:, 1]
    kr, kt = jax.random.split(kw)
    scale = hyp.get("scale", 0.5)
    translate = hyp.get("translate", 0.1)
    r = jax.random.uniform(kr, (bs,), minval=1 - scale, maxval=1 + scale)
    t = jax.random.uniform(kt, (bs, 2), minval=0.5 - translate,
                           maxval=0.5 + translate) * s
    hw4, targets4, valid4, xc, yc = _apply_mosaic_prob(
        key, hyp, hw4, targets4, valid4, xc, yc, s)

    # image composition: identical to the detect path (its box labels are
    # recomputed below from the warped polygons); out_size folds the
    # multi-scale resize into the same resample — labels/segments are
    # normalized, hence invariant to it
    out, _, _ = mosaic_fused(images, hw4, targets4, valid4, idx, xc, yc, r, t,
                             out_size=out_size)
    labels, segs_out, valids = _seg_mosaic_labels(
        seg4, hw4, targets4, valid4, xc, yc, r, t, s)
    return out, labels, segs_out, valids


def _seg_mosaic_labels(seg4, hw4, targets4, valid4, xc, yc, r, t, s):
    """Warp per-tile polygons to the output frame and re-derive labels.
    Deterministic core of mosaic_in_batch_seg (randomness drawn by the
    caller) — kept separate so oracle tests can force (xc, yc, r, t)."""
    A = r[:, None, None]
    Bx = (t[:, 0] - r * s)[:, None, None]
    By = (t[:, 1] - r * s)[:, None, None]
    segs_out, labels, valids = [], [], []
    for k in range(4):
        h_k = hw4[:, k, 0][:, None, None]
        w_k = hw4[:, k, 1][:, None, None]
        ox, oy = _tile_origins(k, xc[:, None, None], yc[:, None, None], h_k, w_k)
        sk = seg4[:, k]  # (bs, M, V, 2) content-normalized
        sx = sk[..., 0] * w_k + ox  # canvas px
        sy = sk[..., 1] * h_k + oy
        X = A * sx + Bx  # output px
        Y = A * sy + By
        seg_px = jnp.stack([X, Y], axis=-1)  # (bs, M, V, 2)
        boxes, any_in = _segment_boxes(seg_px, s, s)
        nw = boxes[..., 2] - boxes[..., 0]
        nh = boxes[..., 3] - boxes[..., 1]
        # candidates filter vs the pre-warp box at applied scale (reference
        # box_candidates(area_thr=0.01) for the segments branch)
        tk = targets4[:, k]
        pre_w = tk[..., 3] * w_k[..., 0] * r[:, None]
        pre_h = tk[..., 4] * h_k[..., 0] * r[:, None]
        ar = jnp.maximum(nw / (nh + 1e-16), nh / (nw + 1e-16))
        keep = ((nw > 2) & (nh > 2)
                & (nw * nh / (pre_w * pre_h + 1e-16) > 0.01) & (ar < 100))
        labels.append(jnp.stack(
            [tk[..., 0],
             (boxes[..., 0] + boxes[..., 2]) / 2 / s,
             (boxes[..., 1] + boxes[..., 3]) / 2 / s,
             nw / s, nh / s], axis=-1))
        segs_out.append(seg_px / s)  # output-normalized
        valids.append(valid4[:, k] & keep & any_in)
    return (jnp.concatenate(labels, 1), jnp.concatenate(segs_out, 1),
            jnp.concatenate(valids, 1))


def random_flip_lr_seg(images, targets, segments, key, p=0.5):
    bs = images.shape[0]
    do = jax.random.uniform(key, (bs,)) < p
    images = jnp.where(do[:, None, None, None], images[:, :, ::-1, :], images)
    x = jnp.where(do[:, None], 1.0 - targets[..., 1], targets[..., 1])
    targets = targets.at[..., 1].set(x)
    sx = jnp.where(do[:, None, None], 1.0 - segments[..., 0], segments[..., 0])
    segments = segments.at[..., 0].set(sx)
    return images, targets, segments


def random_flip_ud_seg(images, targets, segments, key, p=0.0):
    bs = images.shape[0]
    do = jax.random.uniform(key, (bs,)) < p
    images = jnp.where(do[:, None, None, None], images[:, ::-1, :, :], images)
    y = jnp.where(do[:, None], 1.0 - targets[..., 2], targets[..., 2])
    targets = targets.at[..., 2].set(y)
    sy = jnp.where(do[:, None, None], 1.0 - segments[..., 1], segments[..., 1])
    segments = segments.at[..., 1].set(sy)
    return images, targets, segments


def rasterize_batch_masks(segments, valid, hm, wm, overlap=True):
    """(bs, M, V, 2) output-normalized polygons -> GT masks at (hm, wm).

    overlap: (bs, hm, wm) int32 index-encoded (instance i+1 = label row i),
    else (bs, M, hm, wm) bool. Sequential over the batch (lax.map) to bound
    the rasterizer's (M, 2hm, 2wm) working set to one image at a time.
    """
    from yolov5_tpu.ops.rasterize import rasterize, rasterize_overlap

    v = segments.shape[2]
    scale = jnp.asarray([wm, hm], segments.dtype)

    def one(args):
        seg, val = args
        nv = jnp.where(val, v, 0).astype(jnp.int32)
        # floor = cv2.fillPoly's int32 vertex cast (utils/segment/general
        # polygons2masks). Training GT must reproduce the HOST/eval-protocol
        # rasterization, not be "more accurate" than it: with subpixel
        # vertices the masks disagree with the cv2 GT at IoU ~0.87 on small
        # objects and the model learns a systematically shifted boundary;
        # flooring lifts agreement to ~0.96 (measured, round 3).
        poly = jnp.floor(seg * scale)
        if overlap:
            return rasterize_overlap(poly, nv, hm, wm)
        return rasterize(poly, nv, hm, wm)

    return jax.lax.map(one, (segments, valid))


def device_augment_seg(batch, key, hyp, mask_shape, overlap=True, pool=None,
                       self_idx=None, out_size=None):
    """Segment-aware on-device pipeline: mosaic (if raw batch) -> HSV ->
    flips -> GT-mask rasterization. batch needs images/targets/segments/
    valid (+hw for the raw-mosaic path). Returns a batch with "masks".
    out_size: per-batch multi-scale (caller passes a matching mask_shape)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    images, targets = batch["images"], batch["targets"]
    segments, valid = batch["segments"], batch["valid"]
    if "hw" in batch and hyp.get("mosaic", 0) > 0:
        images, targets, segments, valid = mosaic_in_batch_seg(
            images, batch["hw"], targets, segments, valid, k1, hyp,
            pool=pool, self_idx=self_idx, out_size=out_size)
    if any(hyp.get(k, 0) for k in ("hsv_h", "hsv_s", "hsv_v")):
        images = augment_hsv(images, k2, hyp.get("hsv_h", 0.015),
                             hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4))
    if hyp.get("fliplr", 0):
        images, targets, segments = random_flip_lr_seg(
            images, targets, segments, k3, hyp["fliplr"])
    if hyp.get("flipud", 0):
        images, targets, segments = random_flip_ud_seg(
            images, targets, segments, k4, hyp["flipud"])
    hm, wm = mask_shape
    masks = rasterize_batch_masks(segments, valid, hm, wm, overlap=overlap)
    if overlap:
        masks = masks.astype(jnp.int32)
    return {"images": images, "targets": targets, "valid": valid,
            "masks": masks, "segments": segments}


def classify_device_augment(images, key, scale=(0.08, 1.0),
                            ratio=(0.75, 4.0 / 3.0), hflip=0.5, jitter=0.4):
    """On-device classify train transform, reference recipe
    (classify_albumentations, utils/augmentations.py:248-294):
    RandomResizedCrop(scale area fraction, aspect ratio) + HorizontalFlip +
    ColorJitter(brightness, contrast, saturation; hue 0) over an HBM-cached
    (bs, S, S, 3) uint8 batch. Host twin: run_classify.ImageFolder.load.
    Deviations: crops the S-res cache rather than the original file (the
    decode already resized to S), and the three jitters apply in fixed order
    (torchvision shuffles the order per call)."""
    b, s = images.shape[0], images.shape[1]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # RandomResizedCrop: area fraction + aspect ratio -> per-axis side scales
    area = jax.random.uniform(k1, (b,), minval=scale[0], maxval=scale[1])
    logr = jax.random.uniform(k2, (b,), minval=jnp.log(ratio[0]),
                              maxval=jnp.log(ratio[1]))
    rho = jnp.exp(logr)
    sw = jnp.minimum(jnp.sqrt(area * rho), 1.0)
    sh = jnp.minimum(jnp.sqrt(area / rho), 1.0)
    off = jax.random.uniform(k3, (b, 2))
    offx = off[:, 0] * (1 - sw) * s
    offy = off[:, 1] * (1 - sh) * s
    zeros = jnp.zeros((b,))
    ones = jnp.ones((b,))
    # inverse map: in_px = off + out_px * scale
    M = jnp.stack([
        jnp.stack([sw, zeros, offx], -1),
        jnp.stack([zeros, sh, offy], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], 1)  # (b, 3, 3)
    out = jax.vmap(lambda im, m: affine_sample(im.astype(jnp.float32), m, s, s))(
        images, M)
    do = jax.random.uniform(k4, (b,)) < hflip
    out = jnp.where(do[:, None, None, None], out[:, :, ::-1, :], out)
    if jitter:
        jb, jc, js = jax.random.uniform(
            k5, (3, b, 1, 1, 1), minval=1.0 - jitter, maxval=1.0 + jitter)
        out = out * jb  # brightness
        mean = out.mean(axis=(1, 2, 3), keepdims=True)
        out = (out - mean) * jc + mean  # contrast
        gray = (out * jnp.asarray([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
        out = (out - gray) * js + gray  # saturation
    return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)


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
