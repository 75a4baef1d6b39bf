"""Mask ops for instance segmentation (device, jit-safe).

Equivalents of /root/reference/utils/segment/general.py: `crop_mask` (:10-22),
`process_mask` (:25-51), `process_mask_native` (:54-76), `scale_image`
(:79-113 — host-side here since it feeds plotting/COCO json).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from yolov5_tpu.train.loss import crop_mask  # same op, shared impl


def process_mask(protos, coeffs, boxes, img_hw, upsample=False):
    """Combine prototypes with per-detection coefficients.

    protos: (hm, wm, nm); coeffs: (n, nm); boxes: (n, 4) xyxy in image px;
    img_hw: (h, w) of the network input. Returns (n, h', w') float masks in
    [0, 1], cropped to their boxes; h' = img h if upsample else hm.
    """
    hm, wm, nm = protos.shape
    ih, iw = img_hw
    masks = jax.nn.sigmoid(
        jnp.einsum("nc,hwc->nhw", coeffs.astype(jnp.float32),
                   protos.astype(jnp.float32))
    )
    if upsample:
        masks = jax.image.resize(masks, (masks.shape[0], ih, iw), "bilinear")
        scale = 1.0
        mask_boxes = boxes
    else:
        mask_boxes = boxes * jnp.asarray([wm / iw, hm / ih, wm / iw, hm / ih],
                                         masks.dtype)
    return crop_mask(masks, mask_boxes)


def masks_to_binary(masks, thresh=0.5):
    return masks > thresh


def scale_image(masks_hw, im0_shape, ratio_pad=None):
    """Un-letterbox masks back to original image shape (host numpy).
    masks_hw: (h, w, n) or (h, w)."""
    import cv2

    im1_shape = masks_hw.shape[:2]
    if ratio_pad is None:
        gain = min(im1_shape[0] / im0_shape[0], im1_shape[1] / im0_shape[1])
        pad = (im1_shape[1] - im0_shape[1] * gain) / 2, (im1_shape[0] - im0_shape[0] * gain) / 2
    else:
        pad = ratio_pad[1]
    top, left = int(pad[1]), int(pad[0])
    bottom, right = int(im1_shape[0] - pad[1]), int(im1_shape[1] - pad[0])
    masks_hw = masks_hw[top:bottom, left:right]
    single = masks_hw.ndim == 2
    out = cv2.resize(np.asarray(masks_hw, np.float32), (im0_shape[1], im0_shape[0]))
    return out if not single or out.ndim == 2 else out[..., None]


def masks2segments(masks, strategy="largest"):
    """Binary masks (n, h, w) -> list of polygon segments (host numpy,
    reference segment/predict.py:45 via ultralytics)."""
    import cv2

    segments = []
    for m in np.asarray(masks).astype(np.uint8):
        contours = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)[0]
        if contours:
            if strategy == "concat":
                c = np.concatenate([c.reshape(-1, 2) for c in contours])
            else:  # largest
                c = max(contours, key=len).reshape(-1, 2)
        else:
            c = np.zeros((0, 2))
        segments.append(c.astype(np.float32))
    return segments
