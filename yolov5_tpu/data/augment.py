"""Host-side training augmentations (numpy + cv2).

Behavioral equivalents of /root/reference/utils/augmentations.py — HSV jitter
(:69-82), random_perspective (:118-197), mixup/copy_paste (:200-233), flips —
and the mosaic composition from utils/dataloaders.py:798-855. Labels ride
along as (n, 5) [cls, x1, y1, x2, y2] pixel xyxy arrays here (converted from
normalized xywh at load time); the geometry is plain matrix math.

DERIVED IMPLEMENTATIONS: `random_perspective` (and `box_candidates`)
transliterate the reference's matrix composition and filter thresholds —
augmentation geometry is training-semantics and must match exactly for
recipe parity. The TPU-native redesigns are in data/device_aug.py (batched
per-image matrices; mosaic + scale/translate warps as separable MXU
matmuls), which is the default training path via --device-aug; this host
pipeline remains for multi-core CPU feeding and as the executable spec the
device versions are tested against.
"""

from __future__ import annotations

import math

import numpy as np


def augment_hsv(im, hgain=0.015, sgain=0.7, vgain=0.4, rng=None):
    """In-place LUT-based HSV jitter (reference augmentations.py:69-82)."""
    import cv2

    if not (hgain or sgain or vgain):
        return im
    rng = rng or np.random.default_rng()
    r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(im, cv2.COLOR_BGR2HSV))

    x = np.arange(0, 256, dtype=r.dtype)
    lut_hue = ((x * r[0]) % 180).astype(im.dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(im.dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(im.dtype)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
    cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR, dst=im)
    return im


class Albumentations:
    """Optional albumentations pipeline (reference augmentations.py:24-66).

    The package is not a hard dependency: when it is missing (as in this
    image) the hook is a no-op, exactly like the reference's silent
    ImportError pass. When present, applies the reference's default recipe
    (Blur/MedianBlur/ToGray/CLAHE at p=0.01 each) with yolo-format bbox
    passthrough. im is BGR uint8; labels (n, 5) [cls, x, y, w, h] normalized.
    """

    def __init__(self, size=640):
        self.transform = None
        try:
            import albumentations as A

            t = [
                A.Blur(p=0.01),
                A.MedianBlur(p=0.01),
                A.ToGray(p=0.01),
                A.CLAHE(p=0.01),
                A.RandomBrightnessContrast(p=0.0),
                A.RandomGamma(p=0.0),
                A.ImageCompression(quality_lower=75, p=0.0),
            ]
            self.transform = A.Compose(
                t, bbox_params=A.BboxParams(format="yolo",
                                            label_fields=["class_labels"]))
        except ImportError:
            pass
        except Exception as e:  # pragma: no cover - version drift
            print(f"albumentations disabled: {e}")

    def __call__(self, im, labels, p=1.0, rng=None):
        if self.transform is None:
            return im, labels
        rng = rng or np.random.default_rng()
        if rng.random() > p:
            return im, labels
        # albumentations draws from the GLOBAL python/numpy RNGs; reseed them
        # from the per-item rng so --seed reproducibility survives this hook
        import random as _random

        s = int(rng.integers(0, 2**31 - 1))
        _random.seed(s)
        np.random.seed(s)
        new = self.transform(image=im, bboxes=labels[:, 1:],
                             class_labels=labels[:, 0])
        if len(new["class_labels"]) == len(labels):  # skip label-losing runs
            im = new["image"]
            labels = np.array([[c, *b] for c, b in
                               zip(new["class_labels"], new["bboxes"])],
                              np.float32).reshape(-1, 5)
        return im, labels


def box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Keep boxes that survive augmentation meaningfully
    (reference augmentations.py:236-245). box1/box2: (4, n) before/after."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def random_perspective(im, targets=(), segments=(), degrees=10, translate=0.1,
                       scale=0.1, shear=10, perspective=0.0, border=(0, 0), rng=None):
    """Composed center/perspective/rotate-scale/shear/translate warp
    (reference augmentations.py:118-197). targets: (n, 5) [cls, xyxy] px."""
    import cv2

    rng = rng or np.random.default_rng()
    height = im.shape[0] + border[0] * 2
    width = im.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -im.shape[1] / 2
    C[1, 2] = -im.shape[0] / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height

    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            im = cv2.warpPerspective(im, M, dsize=(width, height), borderValue=(114, 114, 114))
        else:
            im = cv2.warpAffine(im, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    n = len(targets)
    new_segments = []
    if n:
        if len(segments):
            # warp each polygon; box from warped polygon extent
            new = np.zeros((n, 4))
            for i, seg in enumerate(segments):
                xy = np.ones((len(seg), 3))
                xy[:, :2] = seg
                xy = xy @ M.T
                xy = (xy[:, :2] / xy[:, 2:3]) if perspective else xy[:, :2]
                xy[:, 0] = xy[:, 0].clip(0, width)
                xy[:, 1] = xy[:, 1].clip(0, height)
                new[i] = [xy[:, 0].min(), xy[:, 1].min(), xy[:, 0].max(), xy[:, 1].max()]
                new_segments.append(xy)
            keep = box_candidates(targets[:, 1:5].T * s, new.T, area_thr=0.01)
        else:
            xy = np.ones((n * 4, 3))
            xy[:, :2] = targets[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
            xy = xy @ M.T
            xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
            x = xy[:, [0, 2, 4, 6]]
            y = xy[:, [1, 3, 5, 7]]
            new = np.stack((x.min(1), y.min(1), x.max(1), y.max(1)), axis=1)
            new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
            new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
            # pre-warp boxes scaled by the zoom factor so the area-ratio
            # filter compares like with like (reference augmentations.py:193)
            keep = box_candidates(targets[:, 1:5].T * s, new.T, area_thr=0.1)
        targets = targets[keep]
        targets[:, 1:5] = new[keep]
        new_segments = [s_ for s_, k in zip(new_segments, keep) if k] if new_segments else []
    return im, targets, new_segments


def mixup(im, labels, im2, labels2, rng=None):
    """Beta(32, 32) image blend (reference augmentations.py:224-233)."""
    rng = rng or np.random.default_rng()
    r = rng.beta(32.0, 32.0)
    im = (im.astype(np.float32) * r + im2.astype(np.float32) * (1 - r)).astype(np.uint8)
    return im, np.concatenate((labels, labels2), 0)


def copy_paste(im, labels, segments, p=0.5, rng=None):
    """Flip-paste segment instances whose pasted box occludes <30% of any
    existing label (reference augmentations.py:200-221)."""
    import cv2

    rng = rng or np.random.default_rng()
    n = len(segments)
    if not (p and n):
        return im, labels, segments
    h, w, _ = im.shape
    im_new = np.zeros(im.shape, np.uint8)
    for j in rng.choice(n, round(p * n), replace=False):
        l, seg = labels[j], segments[j]
        box = w - l[3], l[2], w - l[1], l[4]
        from yolov5_tpu.ops.boxes import bbox_ioa  # numpy-compatible

        ioa = np.asarray(bbox_ioa(np.array([box], np.float32), labels[:, 1:5].astype(np.float32)))
        if (ioa < 0.30).all():
            labels = np.concatenate((labels, [[l[0], *box]]), 0)
            segments.append(np.concatenate((w - seg[:, 0:1], seg[:, 1:2]), 1))
            cv2.drawContours(im_new, [segments[-1].astype(np.int32)], -1, (1, 1, 1), cv2.FILLED)
    result = cv2.flip(im, 1)  # left-right flip of source
    i = im_new > 0
    im[i] = result[i]
    return im, labels, segments


def flip_lr(im, labels, segments=None):
    im = np.fliplr(im).copy()
    if len(labels):
        w = im.shape[1]
        x1 = labels[:, 1].copy()
        labels[:, 1] = w - labels[:, 3]
        labels[:, 3] = w - x1
    if segments:
        for s in segments:
            s[:, 0] = im.shape[1] - s[:, 0]
    return im, labels


def flip_ud(im, labels, segments=None):
    im = np.flipud(im).copy()
    if len(labels):
        h = im.shape[0]
        y1 = labels[:, 2].copy()
        labels[:, 2] = h - labels[:, 4]
        labels[:, 4] = h - y1
    if segments:
        for s in segments:
            s[:, 1] = im.shape[0] - s[:, 1]
    return im, labels
