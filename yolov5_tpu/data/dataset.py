"""YOLO-format dataset + fixed-shape batch loader (host side).

Covers the reference's `LoadImagesAndLabels` (+mosaic) pipeline
(/root/reference/utils/dataloaders.py:469-891) with the key TPU departure:
batches are *fixed-shape* — images (bs, s, s, 3) uint8 and labels padded to
(bs, max_labels, 5) [cls, x, y, w, h] normalized with a validity mask — so
the jitted train step never recompiles.

Layout convention (same as the ecosystem): images under .../images/...,
labels as parallel .txt files under .../labels/... with rows
`cls x_center y_center w h` normalized to [0, 1].

Sharding: `create_loader(..., shard=(rank, world))` gives each host a
deterministic per-epoch subset — the SmartDistributedSampler equivalent
(reference utils/dataloaders.py:79-103).
"""

from __future__ import annotations

import math
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from yolov5_tpu.data.augment import (
    Albumentations,
    augment_hsv,
    flip_lr,
    flip_ud,
    mixup,
    random_perspective,
)
from yolov5_tpu.data.letterbox import letterbox

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}

DEFAULT_HYP = {
    "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
    "degrees": 0.0, "translate": 0.1, "scale": 0.5, "shear": 0.0,
    "perspective": 0.0, "flipud": 0.0, "fliplr": 0.5,
    "mosaic": 1.0, "mixup": 0.0, "copy_paste": 0.0,
}


def img2label_paths(img_paths):
    """.../images/xx.jpg -> .../labels/xx.txt (reference dataloaders.py:23-24)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [sb.join(p.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for p in img_paths]


def find_images(path):
    """Accept a dir, a glob, a txt listing, or a list thereof."""
    files = []
    for p in path if isinstance(path, (list, tuple)) else [path]:
        p = Path(p)
        if p.is_dir():
            files += sorted(str(f) for f in p.rglob("*.*"))
        elif p.suffix == ".txt" and p.is_file():
            root = p.parent
            for line in p.read_text().splitlines():
                line = line.strip()
                if line:
                    files.append(str((root / line).resolve()) if line.startswith("./") else line)
        elif p.is_file():
            files.append(str(p))
        else:
            import glob

            files += sorted(glob.glob(str(p), recursive=True))
    return [f for f in files if f.rsplit(".", 1)[-1].lower() in IMG_FORMATS]


def load_label_file(path):
    """Parse one label txt -> (n, 5) float32 [cls, x, y, w, h] (+ polygon
    segments if rows have >5 numbers, reference verify_image_label style)."""
    segments = []
    if not os.path.isfile(path):
        return np.zeros((0, 5), np.float32), segments
    rows = []
    with open(path) as f:
        for line in f.read().strip().splitlines():
            v = line.split()
            if len(v) > 5:  # polygon: cls x1 y1 x2 y2 ...
                cls = float(v[0])
                seg = np.array(v[1:], np.float32).reshape(-1, 2)
                x1, y1 = seg.min(0)
                x2, y2 = seg.max(0)
                rows.append([cls, (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
                segments.append(seg)
            elif len(v) == 5:
                rows.append([float(x) for x in v])
                segments.append(None)  # placeholder keeps row j <-> segment j
    if any(s is not None for s in segments):
        # mixed box/polygon files: synthesize rectangle polygons for box-only
        # rows so segments stay row-aligned with labels everywhere downstream
        # (reference all-or-none rule, utils/dataloaders.py segments handling)
        for j, s in enumerate(segments):
            if s is None:
                c, x, y, w, h = rows[j]
                segments[j] = np.array(
                    [[x - w / 2, y - h / 2], [x + w / 2, y - h / 2],
                     [x + w / 2, y + h / 2], [x - w / 2, y + h / 2]],
                    np.float32)
    else:
        segments = []
    labels = np.array(rows, np.float32) if rows else np.zeros((0, 5), np.float32)
    labels[:, 1:] = labels[:, 1:].clip(0, 1)
    return labels, segments


CACHE_VERSION = "yolov5_tpu-labels-v1"


def get_hash(paths):
    """Size+name hash keying the label cache (reference get_hash semantics)."""
    import hashlib

    total = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    h = hashlib.md5(str(total).encode())
    h.update("".join(paths).encode())
    return h.hexdigest()


def verify_image_label(im_file, lb_file):
    """Integrity-check one (image, label) pair (reference
    utils/dataloaders.py:895-946): readable image of sane size, corrupt-JPEG
    auto-restore, validated/deduplicated label rows.

    Returns (labels | None-if-corrupt, shape (h, w), segments, msg).
    """
    msg = ""
    try:
        from PIL import Image, ImageOps

        with Image.open(im_file) as im:
            im.verify()
            shape = (im.size[1], im.size[0])
            fmt = (im.format or "").lower()
        assert shape[0] > 9 and shape[1] > 9, f"image size {shape} < 10 pixels"
        assert fmt in IMG_FORMATS, f"invalid image format {fmt}"
        if fmt in ("jpg", "jpeg"):
            with open(im_file, "rb") as f:
                f.seek(-2, 2)
                if f.read() != b"\xff\xd9":  # truncated JPEG: restore
                    ImageOps.exif_transpose(Image.open(im_file)).save(
                        im_file, "JPEG", subsampling=0, quality=100)
                    msg = f"{im_file}: corrupt JPEG restored and saved"
        labels, segments = load_label_file(lb_file)
        if len(labels):
            assert (labels >= 0).all(), "negative label values"
            assert (labels[:, 1:] <= 1).all(), "non-normalized coordinates"
            _, keep = np.unique(labels, axis=0, return_index=True)
            if len(keep) < len(labels):  # duplicate rows removed
                keep = np.sort(keep)
                labels = labels[keep]
                segments = ([segments[i] for i in keep] if segments else [])
                msg = f"{im_file}: {len(labels) - len(keep)} duplicate labels removed"
        return labels, shape, segments, msg
    except Exception as e:
        return None, None, [], f"{im_file}: ignoring corrupt image/label: {e}"


def load_or_build_label_cache(im_files, label_files, workers=8):
    """Hash-validated label cache (reference .cache npy,
    utils/dataloaders.py:528-560): verification runs once per dataset change,
    not once per run. Returns (keep_idx, labels, shapes, segments, msgs)."""
    from concurrent.futures import ThreadPoolExecutor

    cache_path = Path(label_files[0]).parent.with_suffix(".cache.npy") \
        if label_files else None
    h = get_hash(list(label_files) + list(im_files))
    if cache_path and cache_path.exists():
        try:
            cached = np.load(cache_path, allow_pickle=True).item()
            if cached.get("version") == CACHE_VERSION and cached.get("hash") == h:
                return (cached["keep"], cached["labels"], cached["shapes"],
                        cached["segments"], cached.get("msgs", []))
        except Exception:
            pass
    with ThreadPoolExecutor(max(workers, 1)) as pool:
        results = list(pool.map(lambda a: verify_image_label(*a),
                                zip(im_files, label_files)))
    keep, labels, shapes, segments, msgs = [], [], [], [], []
    for i, (lb, shape, segs, msg) in enumerate(results):
        if msg:
            msgs.append(msg)
        if lb is None:
            continue
        keep.append(i)
        labels.append(lb)
        shapes.append(shape)
        segments.append(segs)
    out = {"version": CACHE_VERSION, "hash": h, "keep": keep, "labels": labels,
           "shapes": shapes, "segments": segments, "msgs": msgs}
    if cache_path:
        try:
            np.save(str(cache_path), out, allow_pickle=True)
        except Exception:
            pass  # read-only dataset dirs are fine
    return keep, labels, shapes, segments, msgs


class YOLODataset:
    """Index-addressable dataset yielding (image uint8 HWC, labels normalized
    xywh, segments) with the reference augmentation stack."""

    def __getstate__(self):
        # worker processes rebuild their own RAM cache; shipping the parent's
        # would copy every decoded image through the pickle pipe
        state = dict(self.__dict__)
        state["_ram"] = {}
        return state

    def __init__(self, path, img_size=640, augment=False, hyp=None,
                 single_cls=False, stride=32, pad=0.0, use_segments=False,
                 cache=None, device_aug=False):
        self.img_size = img_size
        self.augment = augment
        # device_aug: host does only mosaic composition + border crop;
        # HSV/perspective/flips run on-device inside the jitted train step
        self.device_aug = device_aug
        self.cache = cache  # None | 'ram'
        self._ram: dict = {}
        self.hyp = {**DEFAULT_HYP, **(hyp or {})}
        self.single_cls = single_cls
        self.use_segments = use_segments
        self.im_files = find_images(path)
        if not self.im_files:
            raise FileNotFoundError(f"no images found in {path}")
        self.label_files = img2label_paths(self.im_files)
        # hash-validated label cache + integrity verification: corrupt
        # images are dropped, truncated JPEGs restored, labels deduplicated
        keep, labels, shapes, segments, msgs = load_or_build_label_cache(
            self.im_files, self.label_files)
        for m in msgs[:10]:
            print(m)
        if len(keep) < len(self.im_files):
            print(f"dataset: dropped {len(self.im_files) - len(keep)} corrupt images")
        self.im_files = [self.im_files[i] for i in keep]
        self.label_files = [self.label_files[i] for i in keep]
        self.labels = labels
        self.segments = segments
        if not self.im_files:
            raise FileNotFoundError(f"no usable images in {path}")
        if single_cls:
            for l in self.labels:
                l[:, 0] = 0
        self.n = len(self.im_files)
        self.indices = np.arange(self.n)
        self.mosaic_border = (-img_size // 2, -img_size // 2)
        self._shapes = np.asarray(shapes, np.int32) if shapes else None
        # optional albumentations hook (no-op when the package is absent)
        self.albumentations = (Albumentations(img_size)
                               if augment and not device_aug else None)

    @property
    def shapes(self):
        """(n, 2) original (h, w) per image — header-only reads, cached."""
        if self._shapes is None:
            from PIL import Image

            out = np.zeros((self.n, 2), np.int32)
            for i, f in enumerate(self.im_files):
                try:
                    with Image.open(f) as im:
                        w, h = im.size
                    out[i] = (h, w)
                except Exception:
                    out[i] = (0, 0)
            self._shapes = out
        return self._shapes

    def __len__(self):
        return self.n

    # -- image io ---------------------------------------------------------
    def load_image(self, i):
        """Read + resize long side to img_size (reference dataloaders.py:768-788).
        Returns (im, (h0, w0), (h, w))."""
        import cv2

        if self.cache == "ram" and i in self._ram:
            im, hw0, hw = self._ram[i]
            return im.copy(), hw0, hw
        im = None
        if self.cache == "disk":  # decoded-pixels cache (reference :643-651)
            npy = Path(self.im_files[i]).with_suffix(".npy")
            if npy.exists():
                try:
                    im = np.load(npy)
                except Exception:
                    im = None
            if im is None:
                im = cv2.imread(self.im_files[i])
                if im is not None:
                    try:
                        np.save(str(npy), im)
                    except Exception:
                        pass  # read-only dataset dir
        if im is None:
            im = cv2.imread(self.im_files[i])
        if im is None:
            raise FileNotFoundError(f"image not found {self.im_files[i]}")
        h0, w0 = im.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA
            im = cv2.resize(im, (math.ceil(w0 * r), math.ceil(h0 * r)), interpolation=interp)
        if self.cache == "ram":
            self._ram[i] = (im.copy(), (h0, w0), im.shape[:2])
        return im, (h0, w0), im.shape[:2]

    # -- label geometry ---------------------------------------------------
    @staticmethod
    def _denorm(labels, w, h, padw=0, padh=0):
        """normalized xywh -> pixel xyxy."""
        out = labels.copy()
        if len(out):
            x, y, bw, bh = labels[:, 1], labels[:, 2], labels[:, 3], labels[:, 4]
            out[:, 1] = w * (x - bw / 2) + padw
            out[:, 2] = h * (y - bh / 2) + padh
            out[:, 3] = w * (x + bw / 2) + padw
            out[:, 4] = h * (y + bh / 2) + padh
        return out

    @staticmethod
    def _norm(labels, w, h):
        """pixel xyxy -> normalized xywh (clipped)."""
        out = labels.copy()
        if len(out):
            x1 = labels[:, 1].clip(0, w)
            y1 = labels[:, 2].clip(0, h)
            x2 = labels[:, 3].clip(0, w)
            y2 = labels[:, 4].clip(0, h)
            out[:, 1] = (x1 + x2) / 2 / w
            out[:, 2] = (y1 + y2) / 2 / h
            out[:, 3] = (x2 - x1) / w
            out[:, 4] = (y2 - y1) / h
        return out

    # -- samples ----------------------------------------------------------
    def load_mosaic(self, index, rng):
        """4-image mosaic on a 2s x 2s canvas + random_perspective crop back
        to s x s (reference dataloaders.py:798-855)."""
        s = self.img_size
        yc = int(rng.uniform(-self.mosaic_border[0], 2 * s + self.mosaic_border[0]))
        xc = int(rng.uniform(-self.mosaic_border[1], 2 * s + self.mosaic_border[1]))
        idxs = [index] + list(rng.choice(self.indices, 3))
        im4 = np.full((s * 2, s * 2, 3), 114, np.uint8)
        labels4 = []
        segments4 = []
        for i, idx in enumerate(idxs):
            im, _, (h, w) = self.load_image(idx)
            if i == 0:  # top left
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:  # top right
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:  # bottom left
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:  # bottom right
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            im4[y1a:y2a, x1a:x2a] = im[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            lb = self._denorm(self.labels[idx], w, h, padw, padh)
            labels4.append(lb)
            for seg in self.segments[idx]:
                seg = seg.copy()
                seg[:, 0] = seg[:, 0] * w + padw
                seg[:, 1] = seg[:, 1] * h + padh
                segments4.append(seg)
        labels4 = np.concatenate(labels4, 0) if labels4 else np.zeros((0, 5), np.float32)
        labels4[:, 1:] = labels4[:, 1:].clip(0, 2 * s)
        for seg in segments4:
            np.clip(seg, 0, 2 * s, out=seg)

        hyp = self.hyp
        if hyp.get("copy_paste", 0) and segments4:
            # paste flipped instances onto the canvas before the warp
            # (reference dataloaders.py:836)
            from yolov5_tpu.data.augment import copy_paste

            im4, labels4, segments4 = copy_paste(
                im4, labels4, segments4, p=hyp["copy_paste"], rng=rng)
        geo = dict(degrees=hyp["degrees"], translate=hyp["translate"],
                   scale=hyp["scale"], shear=hyp["shear"],
                   perspective=hyp["perspective"])
        if self.device_aug:  # geometry happens on device; host only crops
            geo = dict(degrees=0.0, translate=0.0, scale=0.0, shear=0.0,
                       perspective=0.0)
        im4, labels4, segments4 = random_perspective(
            im4, labels4, segments4, border=self.mosaic_border, rng=rng, **geo,
        )
        return im4, labels4, segments4

    def get_item(self, index, rng=None):
        """One training/val sample: (im uint8 (s, s, 3), labels (n, 5)
        normalized xywh, segments list in px)."""
        rng = rng or np.random.default_rng()
        hyp = self.hyp
        s = self.img_size
        if self.augment and rng.random() < hyp["mosaic"]:
            im, labels, segments = self.load_mosaic(index, rng)
            if rng.random() < hyp["mixup"]:
                im2, labels2, seg2 = self.load_mosaic(int(rng.choice(self.indices)), rng)
                im, labels = mixup(im, labels, im2, labels2, rng=rng)
                segments = segments + seg2
        else:
            im, (h0, w0), (h, w) = self.load_image(index)
            im, ratio, pad = letterbox(im, s, auto=False, scaleup=self.augment)
            labels = self._denorm(self.labels[index], ratio[0] * w, ratio[1] * h,
                                  pad[0], pad[1])
            segments = []
            for seg in self.segments[index]:
                seg = seg.copy()
                seg[:, 0] = seg[:, 0] * ratio[0] * w + pad[0]
                seg[:, 1] = seg[:, 1] * ratio[1] * h + pad[1]
                segments.append(seg)
            if self.augment and not self.device_aug:
                im, labels, segments = random_perspective(
                    im, labels, segments,
                    degrees=hyp["degrees"], translate=hyp["translate"],
                    scale=hyp["scale"], shear=hyp["shear"],
                    perspective=hyp["perspective"], rng=rng,
                )

        if self.augment and not self.device_aug:
            if self.albumentations is not None and self.albumentations.transform:
                # pixel-level extras (blur/gray/CLAHE) BEFORE hsv/flips,
                # matching the reference order (dataloaders.py:692-696);
                # wrapper wants normalized xywh, flips below want pixel xyxy
                h_im, w_im = im.shape[:2]
                lab_n = self._norm(labels, w_im, h_im)
                im, lab_n = self.albumentations(im, lab_n, rng=rng)
                labels = self._denorm(lab_n, w_im, h_im)
            augment_hsv(im, hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"], rng=rng)
            if rng.random() < hyp["flipud"]:
                im, labels = flip_ud(im, labels, segments)
            if rng.random() < hyp["fliplr"]:
                im, labels = flip_lr(im, labels, segments)

        labels = self._norm(labels, im.shape[1], im.shape[0])
        # drop degenerate rows
        if len(labels):
            keep = (labels[:, 3] > 1e-4) & (labels[:, 4] > 1e-4)
            labels = labels[keep]
            segments = [s_ for s_, k in zip(segments, keep) if k] if segments else []
        return np.ascontiguousarray(im), labels, segments


def rasterize_masks(segments, labels, hm, wm, img_px, overlap=True):
    """Polygon segments (px coords at img_px scale) -> instance masks at
    (hm, wm). overlap=True gives one int map with instance i+1 written in
    descending-area order (reference polygons2masks_overlap)."""
    import cv2

    if overlap:
        out = np.zeros((hm, wm), np.int32)
    else:
        out = np.zeros((max(len(labels), 1), hm, wm), np.uint8)
    scale_x, scale_y = wm / img_px, hm / img_px
    areas = []
    polys = []
    for seg in segments:
        p = seg.copy()
        p[:, 0] *= scale_x
        p[:, 1] *= scale_y
        polys.append(p.astype(np.int32))
        areas.append(cv2.contourArea(p.astype(np.float32)))
    order = np.argsort(-np.asarray(areas)) if areas else []
    for rank, i in enumerate(order):
        if overlap:
            cv2.fillPoly(out, [polys[i]], color=int(i) + 1)
        else:
            cv2.fillPoly(out[i], [polys[i]], color=1)
    return out


def rect_batch_shapes(shapes, batch_size, img_size, stride=32, pad=0.5,
                      buckets=None):
    """Rect-val batching: sort by aspect ratio, give each batch the smallest
    stride-aligned (h, w) that fits its images (reference
    dataloaders.py:589-612). Returns (order, per-batch (h, w) list).

    TPU twist: per-batch shapes are snapped to a bounded bucket set so the
    jitted forward compiles a handful of shapes, not one per batch.
    """
    import math as _math

    n = len(shapes)
    ar = shapes[:, 0] / np.maximum(shapes[:, 1], 1)  # h / w
    order = np.argsort(ar)
    nb = _math.ceil(n / batch_size)
    out_shapes = []
    for bi in range(nb):
        sel = order[bi * batch_size : (bi + 1) * batch_size]
        ari = ar[sel]
        mini, maxi = float(ari.min()), float(ari.max())
        shape = [1.0, 1.0]
        if maxi < 1:
            shape = [maxi, 1.0]
        elif mini > 1:
            shape = [1.0, 1.0 / mini]
        h = int(np.ceil(shape[0] * img_size / stride + pad) * stride)
        w = int(np.ceil(shape[1] * img_size / stride + pad) * stride)
        h, w = min(h, img_size), min(w, img_size)
        if buckets:  # snap up to the nearest allowed bucket (bounded compiles)
            h = min(b for b in buckets if b >= h)
            w = min(b for b in buckets if b >= w)
        out_shapes.append((h, w))
    return order, out_shapes


# -- process-pool batch building ------------------------------------------
# Training augmentation (mosaic: 4 decodes + paste + warp per sample) is
# GIL-bound in threads; the reference solves this with DataLoader worker
# processes (utils/dataloaders.py:148-163) and so do we: a persistent spawn
# pool where each worker builds WHOLE collated batches (numpy in, numpy out —
# workers never touch jax). Batch construction is deterministic from
# (seed, epoch, index), so results are identical to the in-process path.

_WORKER_LOADER = None


def _mp_init(loader):
    global _WORKER_LOADER
    _WORKER_LOADER = loader
    try:
        import cv2

        cv2.setNumThreads(0)  # the pool is the parallelism
    except Exception:
        pass


def _mp_build(task):
    """(kind, chunk, real, seed) -> collated numpy batch."""
    kind, chunk, real, seed = task
    ld = _WORKER_LOADER
    if kind == "tiles":
        batch = ld._tiles_batch(chunk, np.random.default_rng(seed))
    elif kind == "raw":
        batch = ld._raw_batch(chunk)
    elif kind == "quad":
        samples = [ld.ds.get_item(int(i), np.random.default_rng(seed + int(i)))
                   for i in chunk]
        batch = ld._quad_collate(samples, np.random.default_rng(seed * 31 + 7))
    else:
        samples = [ld.ds.get_item(int(i), np.random.default_rng(seed + int(i)))
                   for i in chunk]
        batch = ld._collate(samples)
    batch["real"] = real
    batch["indices"] = np.asarray(chunk, np.int64)
    return batch


class Loader:
    """Fixed-shape batch loader with per-epoch deterministic shuffling, host
    sharding, and (for augmented training) a persistent worker-process pool
    with a bounded in-flight window."""

    def __init__(self, dataset: YOLODataset, batch_size=16, shuffle=False,
                 max_labels=128, workers=8, seed=0, shard=(0, 1),
                 drop_last=True, masks=False, mask_ratio=4, overlap=True,
                 native=None, rect=False, stride=32, pad=0.5,
                 mosaic_tiles=False, raw_images=False, quad=False):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        if max_labels in (None, "auto"):
            # size the fixed label capacity to the dataset: every padded row
            # multiplies the assignment lattice the loss materializes
            most = max((len(l) for l in dataset.labels), default=1)
            max_labels = max(8, int(math.ceil(most / 8) * 8))
        self.max_labels = max_labels
        # more workers than cores just adds spawn + pickle overhead
        self.workers = max(1, min(workers, os.cpu_count() or 1))
        self.raw_images = raw_images
        self.seed = seed
        self.rank, self.world = shard
        self.drop_last = drop_last
        self.masks = masks
        self.mask_ratio = mask_ratio
        self.overlap = overlap
        self.epoch = 0
        self.weighted_indices = None  # set per-epoch for --image-weights
        # quad batches (reference collate_fn4): every 4 samples -> one
        # 2s x 2s image; shapes stay static at (bs/4, 2s, 2s, 3)
        self.quad = bool(quad)
        if self.quad:
            if batch_size % 4:
                raise ValueError("--quad needs batch_size divisible by 4")
            if mosaic_tiles or raw_images or rect or masks:
                raise ValueError("--quad is incompatible with device mosaic, "
                                 "rect batches and segmentation masks")
        # rect val: aspect-sorted batches, bucketed per-batch shapes
        self.mosaic_tiles = mosaic_tiles  # raw 4-tile batches (device mosaic)
        self.rect = rect and not dataset.augment
        self.stride = stride
        self.pad = pad
        self._rect_plan = None
        if self.rect:
            self.shuffle = False
            self.drop_last = False
        self._mp_pool = None
        # process workers for augmented training; RAM caches are per-worker
        self.use_processes = dataset.augment and self.workers > 1
        # native C++ batch decode+letterbox fast path: val/inference loading
        # only (no augmentation), jpeg sources
        self.native = False
        if native is not False and not dataset.augment and not masks:
            try:
                from yolov5_tpu import native as native_lib

                if all(f.lower().endswith((".jpg", ".jpeg"))
                       for f in dataset.im_files) and native_lib.available():
                    self.native = True
                    self._native_lib = native_lib
            except Exception:
                self.native = False

    def __getstate__(self):  # what worker processes receive at pool init
        return {k: v for k, v in self.__dict__.items()
                if k not in ("_mp_pool", "_native_lib")}

    def _pool(self):
        if self._mp_pool is None:
            import multiprocessing as mp

            # spawn, not fork: the parent may hold a live TPU client with
            # background threads; workers import numpy/cv2 only
            ctx = mp.get_context("spawn")
            self._mp_pool = ctx.Pool(self.workers, initializer=_mp_init,
                                     initargs=(self,))
        return self._mp_pool

    def close(self):
        if self._mp_pool is not None:
            self._mp_pool.terminate()
            self._mp_pool.join()
            self._mp_pool = None

    def _mp_iter(self, idx, nb, base_seed, kind):
        """Ordered results with a bounded in-flight window (backpressure:
        a fast pool must not balloon 20 MB batches in the result queue)."""
        from collections import deque

        pool = self._pool()
        def tasks():
            for bi in range(nb):
                chunk = [int(i) for i in idx[bi * self.bs : (bi + 1) * self.bs]]
                real = len(chunk)
                while len(chunk) < self.bs:
                    chunk.append(chunk[-1])
                seed = (base_seed + bi * 7919 if kind in ("tiles", "quad")
                        else base_seed)
                yield (kind, chunk, real, seed)

        it = tasks()
        window = self.workers + 2
        pending = deque()
        for t in it:
            pending.append((t, pool.apply_async(_mp_build, (t,))))
            if len(pending) >= window:
                break
        while pending:
            t, fut = pending.popleft()
            batch = fut.get()
            nxt = next(it, None)
            if nxt is not None:
                pending.append((nxt, pool.apply_async(_mp_build, (nxt,))))
            batch["paths"] = [self.ds.im_files[int(i)] for i in t[1]]
            yield batch

    def __len__(self):
        if self.rect:
            return math.ceil(len(self.ds) / self.bs)
        n = len(self.weighted_indices) if self.weighted_indices is not None else len(
            self._indices(0))
        return n // self.bs if self.drop_last else math.ceil(n / self.bs)

    def _indices(self, epoch):
        if self.weighted_indices is not None:
            idx = np.asarray(self.weighted_indices)
        else:
            idx = np.arange(len(self.ds))
            if self.shuffle:
                idx = np.random.default_rng(self.seed + epoch).permutation(idx)
        return idx[np.arange(len(idx)) % self.world == self.rank] if self.world > 1 else idx

    def set_image_weights(self, weights, epoch=0):
        """Resample the epoch's indices by per-image weights
        (reference image_weights resampling, train.py:359-362)."""
        rng = np.random.default_rng(self.seed + epoch)
        n = len(self.ds)
        p = np.asarray(weights, np.float64)
        p = p / p.sum() if p.sum() > 0 else None
        self.weighted_indices = rng.choice(n, size=n, replace=True, p=p)

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _collate(self, samples):
        bs = len(samples)
        s = self.ds.img_size
        images = np.zeros((bs, s, s, 3), np.uint8)
        targets = np.zeros((bs, self.max_labels, 5), np.float32)
        valid = np.zeros((bs, self.max_labels), bool)
        hm = wm = s // self.mask_ratio
        if self.masks:
            gt_masks = (np.zeros((bs, hm, wm), np.int32) if self.overlap
                        else np.zeros((bs, self.max_labels, hm, wm), np.uint8))
        batch = {}
        for b, (im, labels, segments) in enumerate(samples):
            images[b] = im[..., ::-1]  # BGR -> RGB
            n = min(len(labels), self.max_labels)
            if n:
                targets[b, :n] = labels[:n]
                valid[b, :n] = True
            if self.masks and segments:
                m = rasterize_masks(segments[: self.max_labels], labels, hm, wm,
                                    s, overlap=self.overlap)
                if self.overlap:
                    gt_masks[b] = m
                else:
                    gt_masks[b, : m.shape[0]] = m
        batch = {"images": images, "targets": targets, "valid": valid}
        if self.masks:
            batch["masks"] = gt_masks
        return batch

    def _quad_collate(self, samples, rng):
        """Quad batches (reference collate_fn4, utils/dataloaders.py:865-891):
        each group of 4 samples becomes ONE 2s x 2s image — either the first
        sample bilinearly upsampled 2x (half the time; keeps small objects
        large) or the four tiled 2x2. Label capacity grows 4x so a full tiled
        group never truncates; normalized coords make the upsample branch a
        no-op on labels."""
        import cv2

        s = self.ds.img_size
        n_out = len(samples) // 4
        cap = self.max_labels * 4
        images = np.zeros((n_out, 2 * s, 2 * s, 3), np.uint8)
        targets = np.zeros((n_out, cap, 5), np.float32)
        valid = np.zeros((n_out, cap), bool)
        for o in range(n_out):
            group = samples[4 * o : 4 * o + 4]
            if rng.random() < 0.5:
                im, lab, _ = group[0]
                images[o] = cv2.resize(im, (2 * s, 2 * s),
                                       interpolation=cv2.INTER_LINEAR)[..., ::-1]
            else:
                rows = []
                for q, (im, labels, _) in enumerate(group):
                    dy, dx = divmod(q, 2)
                    images[o, dy * s:(dy + 1) * s, dx * s:(dx + 1) * s] = im[..., ::-1]
                    if len(labels):
                        l = labels.copy()
                        l[:, 1] = (l[:, 1] + dx) / 2
                        l[:, 2] = (l[:, 2] + dy) / 2
                        l[:, 3:5] /= 2
                        rows.append(l)
                lab = np.concatenate(rows) if rows else np.zeros((0, 5), np.float32)
            n = min(len(lab), cap)
            if n:
                targets[o, :n] = lab[:n]
                valid[o, :n] = True
        return {"images": images, "targets": targets, "valid": valid}

    def _native_batch(self, chunk):
        """C++ batch decode + letterbox; labels re-normalized to letterbox
        frame. Falls back per-image to the python path on decode failure."""
        s = self.ds.img_size
        paths = [self.ds.im_files[int(i)] for i in chunk]
        images, hws, ok = self._native_lib.decode_letterbox_batch(
            paths, s, scaleup=False)
        targets = np.zeros((len(chunk), self.max_labels, 5), np.float32)
        valid = np.zeros((len(chunk), self.max_labels), bool)
        for b, i in enumerate(chunk):
            if not ok[b]:  # fallback (corrupt/odd jpeg)
                im, labels, _ = self.ds.get_item(int(i))
                images[b] = im
                n = min(len(labels), self.max_labels)
                if n:
                    targets[b, :n] = labels[:n]
                    valid[b, :n] = True
                continue
            h0, w0 = int(hws[b, 0]), int(hws[b, 1])
            lab = self.ds.labels[int(i)]
            n = min(len(lab), self.max_labels)
            if n:
                r = min(s / h0, s / w0, 1.0)
                nw, nh = int(w0 * r + 0.5), int(h0 * r + 0.5)
                px = (s - nw) / 2
                py = (s - nh) / 2
                t = lab[:n].copy()
                t[:, 1] = (t[:, 1] * nw + px) / s
                t[:, 2] = (t[:, 2] * nh + py) / s
                t[:, 3] = t[:, 3] * nw / s
                t[:, 4] = t[:, 4] * nh / s
                targets[b, :n] = t
                valid[b, :n] = True
        return {"images": images, "targets": targets, "valid": valid}

    def _raw_batch(self, chunk):
        """Raw decoded batches for fully-on-device augmentation: each image
        resized long-side=s into the top-left of an s x s buffer, labels
        normalized to the content. Mosaic partners, composition, geometry,
        HSV and flips all happen inside the jitted step (mosaic_in_batch) —
        the host path is decode (or RAM-cache hit) + memcpy."""
        s = self.ds.img_size
        bs = len(chunk)
        images = np.full((bs, s, s, 3), 114, np.uint8)
        hw = np.zeros((bs, 2), np.int32)
        targets = np.zeros((bs, self.max_labels, 5), np.float32)
        valid = np.zeros((bs, self.max_labels), bool)
        for b, i in enumerate(chunk):
            im, _, (h, w) = self.ds.load_image(int(i))
            images[b, :h, :w] = im[..., ::-1]
            hw[b] = (h, w)
            lab = self.ds.labels[int(i)]
            n = min(len(lab), self.max_labels)
            if n:
                targets[b, :n] = lab[:n]
                valid[b, :n] = True
        return {"images": images, "hw": hw, "targets": targets, "valid": valid}

    def _tiles_batch(self, chunk, rng):
        """Raw 4-tile batches for on-device mosaic: per slot, the indexed
        image + 3 random partners, each resized long-side=s into the top-left
        of an s x s buffer. Labels stay normalized to each tile's content."""
        s = self.ds.img_size
        bs = len(chunk)
        tiles = np.full((bs, 4, s, s, 3), 114, np.uint8)
        tile_hw = np.zeros((bs, 4, 2), np.int32)
        targets4 = np.zeros((bs, 4, self.max_labels, 5), np.float32)
        valid4 = np.zeros((bs, 4, self.max_labels), bool)
        for b, i in enumerate(chunk):
            idxs = [int(i)] + list(rng.choice(len(self.ds), 3))
            for k, idx in enumerate(idxs):
                im, _, (h, w) = self.ds.load_image(idx)
                tiles[b, k, :h, :w] = im[..., ::-1]
                tile_hw[b, k] = (h, w)
                lab = self.ds.labels[idx]
                n = min(len(lab), self.max_labels)
                if n:
                    targets4[b, k, :n] = lab[:n]
                    valid4[b, k, :n] = True
        return {"tiles": tiles, "tile_hw": tile_hw,
                "targets4": targets4, "valid4": valid4}

    def _rect_batch(self, chunk, hw):
        """Load + letterbox a batch to the rect shape (h, w); labels
        re-normalized to that frame."""
        from yolov5_tpu.data.letterbox import letterbox as _lb

        h, w = hw
        bs = len(chunk)
        images = np.zeros((bs, h, w, 3), np.uint8)
        targets = np.zeros((bs, self.max_labels, 5), np.float32)
        valid = np.zeros((bs, self.max_labels), bool)
        for b, i in enumerate(chunk):
            im, (h0, w0), (rh, rw) = self.ds.load_image(int(i))
            im, ratio, (dw, dh) = _lb(im, (h, w), auto=False, scaleup=False)
            images[b] = im[..., ::-1]
            lab = self.ds.labels[int(i)]
            n = min(len(lab), self.max_labels)
            if n:
                t = lab[:n].copy()
                sw, sh = ratio[0] * rw, ratio[1] * rh  # drawn image size in px
                t[:, 1] = (t[:, 1] * sw + dw) / w
                t[:, 2] = (t[:, 2] * sh + dh) / h
                t[:, 3] = t[:, 3] * sw / w
                t[:, 4] = t[:, 4] * sh / h
                targets[b, :n] = t
                valid[b, :n] = True
        return {"images": images, "targets": targets, "valid": valid}

    def _rect_iter(self):
        if self._rect_plan is None:
            s = self.ds.img_size
            buckets = sorted(set(
                list(range(self.stride * 4, s, self.stride * 2)) + [s]))
            self._rect_plan = rect_batch_shapes(
                self.ds.shapes, self.bs, s, self.stride, self.pad,
                buckets=tuple(buckets),
            )
        order, shapes = self._rect_plan
        for bi, hw in enumerate(shapes):
            chunk = list(order[bi * self.bs : (bi + 1) * self.bs])
            real = len(chunk)
            while len(chunk) < self.bs:
                chunk.append(chunk[-1])
            batch = self._rect_batch(chunk, hw)
            if real < self.bs:  # padded duplicates must not count as images
                batch["valid"][real:] = False
                batch["targets"][real:] = 0
            batch["real"] = real
            batch["paths"] = [self.ds.im_files[int(i)] for i in chunk]
            batch["indices"] = np.asarray(chunk, np.int64)
            yield batch

    def __iter__(self):
        if self.rect:
            yield from self._rect_iter()
            return
        idx = self._indices(self.epoch)
        nb = len(self)
        base_seed = self.seed * 100003 + self.epoch * 1009
        kind = ("tiles" if self.mosaic_tiles
                else "raw" if self.raw_images
                else "quad" if self.quad else "std")
        if self.use_processes and not self.native:
            yield from self._mp_iter(idx, nb, base_seed, kind)
            return
        if self.raw_images:
            for bi in range(nb):
                chunk = [int(i) for i in idx[bi * self.bs : (bi + 1) * self.bs]]
                real = len(chunk)
                while len(chunk) < self.bs:
                    chunk.append(chunk[-1])
                batch = self._raw_batch(chunk)
                batch["real"] = real
                batch["indices"] = np.asarray(chunk, np.int64)
                batch["paths"] = [self.ds.im_files[int(i)] for i in chunk]
                yield batch
            return
        if self.mosaic_tiles:
            for bi in range(nb):
                chunk = list(idx[bi * self.bs : (bi + 1) * self.bs])
                while len(chunk) < self.bs:
                    chunk.append(chunk[-1])
                # per-batch rng stream: identical whether built here or in a
                # worker process
                yield self._tiles_batch(chunk, np.random.default_rng(
                    base_seed + bi * 7919))
            return
        if self.native:
            for bi in range(nb):
                chunk = list(idx[bi * self.bs : (bi + 1) * self.bs])
                real = len(chunk)
                while len(chunk) < self.bs:
                    chunk.append(chunk[-1])
                batch = self._native_batch(chunk)
                batch["real"] = real
                batch["paths"] = [self.ds.im_files[int(i)] for i in chunk]
                batch["indices"] = np.asarray(chunk, np.int64)
                yield batch
            return
        with ThreadPoolExecutor(self.workers) as pool:
            def fetch(i):
                rng = np.random.default_rng(base_seed + int(i))
                return self.ds.get_item(int(i), rng)

            for bi in range(nb):
                chunk = idx[bi * self.bs : (bi + 1) * self.bs]
                samples = list(pool.map(fetch, chunk))
                pad_chunk = list(chunk)
                real = len(samples)
                while len(samples) < self.bs:  # pad final partial batch
                    samples.append(samples[-1])
                    pad_chunk.append(pad_chunk[-1])
                if self.quad:
                    batch = self._quad_collate(samples, np.random.default_rng(
                        (base_seed + bi * 7919) * 31 + 7))
                else:
                    batch = self._collate(samples)
                batch["real"] = real
                batch["paths"] = [self.ds.im_files[int(i)] for i in pad_chunk]
                batch["indices"] = np.asarray(pad_chunk, np.int64)
                yield batch


def _available_ram():
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable"):
                    return int(line.split()[1]) * 1024
    except Exception:
        pass
    return 8 << 30


def create_loader(path, img_size=640, batch_size=16, augment=False, hyp=None,
                  shuffle=None, max_labels=128, workers=8, seed=0, shard=(0, 1),
                  single_cls=False, masks=False, mask_ratio=4, overlap=True,
                  cache=None, device_aug=False, native=None, rect=False,
                  stride=32, pad=0.5, mosaic_tiles=False, raw_images=False,
                  quad=False):
    """Dataset + loader in one call (reference create_dataloader,
    utils/dataloaders.py:106-164). cache: None = auto (RAM-cache training
    images when they fit comfortably), False = off, 'ram' = force."""
    ds = YOLODataset(path, img_size=img_size, augment=augment, hyp=hyp,
                     single_cls=single_cls, use_segments=masks,
                     cache=cache or None, device_aug=device_aug)
    loader = Loader(ds, batch_size=batch_size,
                    shuffle=augment if shuffle is None else shuffle,
                    max_labels=max_labels, workers=workers, seed=seed,
                    shard=shard, masks=masks, mask_ratio=mask_ratio,
                    overlap=overlap, native=native, rect=rect, stride=stride,
                    pad=pad, mosaic_tiles=mosaic_tiles, raw_images=raw_images,
                    quad=quad,
                    # val/eval loaders must see every image: final partial
                    # batches are padded (and excluded from scoring via
                    # the 'real' count) instead of dropped
                    drop_last=augment)
    if cache is None and augment:
        # auto RAM cache (reference check_cache_ram, dataloaders.py:614-631):
        # decode once, augment from memory. With worker processes each worker
        # holds its own cache, so budget per-worker.
        eff = loader.workers if loader.use_processes else 1
        need = len(ds) * img_size * img_size * 3 * 1.1 * eff
        if need < 0.4 * _available_ram():
            ds.cache = "ram"
    return ds, loader
