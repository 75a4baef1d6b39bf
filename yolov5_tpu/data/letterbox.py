"""Aspect-preserving resize + pad (host side).

DERIVED IMPLEMENTATION: this function is a close transliteration of the
reference `letterbox` (utils/augmentations.py:85-115) because the geometry
must match the reference bit-for-bit — any rounding difference shifts every
box by fractions of a pixel and breaks weight-import parity. The TPU-native
redesign of this transform lives in data/device_aug.py (separable on-device
warps); this host version exists for the CPU feeder and inference CLIs.
"""

from __future__ import annotations

import numpy as np


def letterbox(im, new_shape=(640, 640), color=(114, 114, 114), auto=False,
              scale_fill=False, scaleup=True, stride=32):
    import cv2

    shape = im.shape[:2]  # h, w
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)

    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:  # only downscale (val: better mAP)
        r = min(r, 1.0)

    ratio = (r, r)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))  # w, h
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:  # pad only to stride multiple (rect inference)
        dw, dh = dw % stride, dh % stride
    elif scale_fill:  # stretch, no pad
        dw, dh = 0, 0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])

    dw /= 2
    dh /= 2
    if shape[::-1] != new_unpad:
        im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    im = cv2.copyMakeBorder(im, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return im, ratio, (dw, dh)
