"""Box geometry ops — jit-safe, shape-polymorphic over leading dims.

Replaces the box math the reference imports from the external `ultralytics`
package (see /root/reference/utils/general.py:53-61 and utils/metrics.py:11)
plus the in-repo converters (utils/general.py:574-655). Everything here is
pure jnp so it runs on device inside jitted pipelines; the same functions
accept numpy arrays for host-side metric code.

Box formats:
  xyxy  — (x1, y1, x2, y2) absolute corner coordinates
  xywh  — (cx, cy, w, h) absolute center + size
  *n    — normalized to [0, 1] by image (w, h)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xyxy2xywh(x):
    """(..., 4) corner boxes -> center boxes."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def xywh2xyxy(x):
    """(..., 4) center boxes -> corner boxes."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xywhn2xyxy(x, w=640, h=640, padw=0, padh=0):
    """Normalized center boxes -> absolute corner boxes (with optional pad offset)."""
    cx, cy, bw, bh = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw * 0.5) + padw,
            h * (cy - bh * 0.5) + padh,
            w * (cx + bw * 0.5) + padw,
            h * (cy + bh * 0.5) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x, w=640, h=640, clip=False, eps=0.0):
    """Absolute corner boxes -> normalized center boxes."""
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [
            (x1 + x2) * 0.5 / w,
            (y1 + y2) * 0.5 / h,
            (x2 - x1) / w,
            (y2 - y1) / h,
        ],
        axis=-1,
    )


def xyn2xy(x, w=640, h=640, padw=0, padh=0):
    """Normalized (..., 2) points -> absolute pixel points."""
    px, py = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([w * px + padw, h * py + padh], axis=-1)


def clip_boxes(boxes, shape):
    """Clip (..., 4) xyxy boxes to image bounds ``shape`` = (h, w)."""
    h, w = shape[0], shape[1]
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [
            jnp.clip(x1, 0, w),
            jnp.clip(y1, 0, h),
            jnp.clip(x2, 0, w),
            jnp.clip(y2, 0, h),
        ],
        axis=-1,
    )


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None):
    """Rescale xyxy boxes from a letterboxed ``img1_shape`` (h, w) back to the
    original ``img0_shape`` (h, w). Mirrors the un-letterbox geometry of the
    reference (utils/general.py:613-630)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    boxes = jnp.concatenate(
        [(x1 - pad[0]) / gain, (y1 - pad[1]) / gain, (x2 - pad[0]) / gain, (y2 - pad[1]) / gain],
        axis=-1,
    )
    return clip_boxes(boxes, img0_shape)


def box_iou(box1, box2, eps=1e-7):
    """Pairwise IoU of two xyxy box sets: (N, 4) x (M, 4) -> (N, M).

    Batched leading dims broadcast: (..., N, 4) x (..., M, 4) -> (..., N, M).
    """
    a1 = box1[..., :, None, :2]  # (..., N, 1, 2)
    a2 = box1[..., :, None, 2:]
    b1 = box2[..., None, :, :2]  # (..., 1, M, 2)
    b2 = box2[..., None, :, 2:]
    inter_wh = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    area1 = jnp.prod(box1[..., 2:] - box1[..., :2], axis=-1)
    area2 = jnp.prod(box2[..., 2:] - box2[..., :2], axis=-1)
    union = area1[..., :, None] + area2[..., None, :] - inter + eps
    return inter / union


def bbox_iou(box1, box2, xywh=True, GIoU=False, DIoU=False, CIoU=False, eps=1e-7):
    """Elementwise IoU / GIoU / DIoU / CIoU between broadcast-compatible boxes.

    CIoU adds a center-distance and aspect-ratio penalty:
      CIoU = IoU - rho²/c² - alpha·v,  v = (4/pi²)·(atan(w2/h2) - atan(w1/h1))²
    This is the loss the reference uses for box regression (its `bbox_iou`
    comes from the external ultralytics pkg, see utils/loss.py:6).
    """
    if xywh:
        (x1, y1, w1, h1) = jnp.split(box1, 4, axis=-1)
        (x2, y2, w2, h2) = jnp.split(box2, 4, axis=-1)
        w1_, h1_, w2_, h2_ = w1 * 0.5, h1 * 0.5, w2 * 0.5, h2 * 0.5
        b1x1, b1x2, b1y1, b1y2 = x1 - w1_, x1 + w1_, y1 - h1_, y1 + h1_
        b2x1, b2x2, b2y1, b2y2 = x2 - w2_, x2 + w2_, y2 - h2_, y2 + h2_
    else:
        b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, axis=-1)
        b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, axis=-1)
        w1, h1 = b1x2 - b1x1, (b1y2 - b1y1) + eps
        w2, h2 = b2x2 - b2x1, (b2y2 - b2y1) + eps

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (GIoU or DIoU or CIoU):
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)  # enclosing box w
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)  # enclosing box h
    if CIoU or DIoU:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) * 0.25
        if CIoU:
            v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            # alpha is a constant wrt the gradient (torch.no_grad upstream);
            # stop_gradient matches that.
            alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
            return iou - (rho2 / c2 + v * alpha)
        return iou - rho2 / c2
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def bbox_ioa(box1, box2, eps=1e-7):
    """Intersection over box2 area: (N, 4) x (M, 4) xyxy -> (N, M).

    Used by copy-paste augmentation to gate pastes that occlude existing
    labels (reference delegates to ultralytics; see utils/augmentations.py:11).
    """
    b1 = box1[:, None, :]  # (N, 1, 4)
    b2 = box2[None, :, :]  # (1, M, 4)
    inter = jnp.clip(
        jnp.minimum(b1[..., 2], b2[..., 2]) - jnp.maximum(b1[..., 0], b2[..., 0]), 0, None
    ) * jnp.clip(
        jnp.minimum(b1[..., 3], b2[..., 3]) - jnp.maximum(b1[..., 1], b2[..., 1]), 0, None
    )
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1]) + eps
    return inter / area2[None, :]


def wh_iou(wh1, wh2, eps=1e-7):
    """IoU of width-height pairs assuming shared top-left corner: (N,2)x(M,2)->(N,M)."""
    inter = jnp.prod(jnp.minimum(wh1[:, None], wh2[None, :]), axis=-1)
    return inter / (
        jnp.prod(wh1, axis=-1)[:, None] + jnp.prod(wh2, axis=-1)[None, :] - inter + eps
    )


def smooth_bce(eps=0.1):
    """Label-smoothing targets (positive, negative) for BCE."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def make_divisible(x, divisor=8):
    """Round channel count up to the nearest multiple of ``divisor``."""
    return int(math.ceil(x / divisor) * divisor)
