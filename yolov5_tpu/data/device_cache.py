"""Device-resident dataset cache.

Training batches are by far the largest recurring host->device transfer
(uint8 images: ~1.2 MB per 640px image, every step, forever). When the
decoded dataset fits in a fraction of HBM, the TPU-native move is to upload
it ONCE and have each jitted train step gather its batch from device memory —
the per-step transfer collapses to a (bs,) int32 index vector. Mosaic,
geometry, HSV and flips already run inside the step (data/device_aug.py), so
the host's steady-state work is shuffling indices.

The reference has no equivalent (its GPUs sit next to the data on PCIe; its
--cache ram/disk are host-side, utils/dataloaders.py:614-651); over a slow
interconnect (or at multi-host scale where input dispatch competes with DCN)
this is the difference between starving and saturating the chip.

Falls back automatically: datasets that don't fit keep the streaming path.
"""

from __future__ import annotations

import numpy as np


def build_cache_arrays(ds, max_labels=128, segments_v=0):
    """Decode + resize every image once (long side = img_size, content in the
    top-left of an s x s buffer, RGB) and pad labels to fixed shape.

    Returns dict of numpy arrays: images (N,s,s,3) u8, hw (N,2) i32,
    targets (N,M,5) f32, valid (N,M) bool. With segments_v > 0, polygon
    segments are padded/resampled to V vertices: segments (N,M,V,2) f16
    (content-normalized — fp16 is ~0.3 px at 640, well under mask_ratio).
    """
    s = ds.img_size
    n = len(ds)
    images = np.full((n, s, s, 3), 114, np.uint8)
    hw = np.zeros((n, 2), np.int32)
    targets = np.zeros((n, max_labels, 5), np.float32)
    valid = np.zeros((n, max_labels), bool)
    segs = (np.zeros((n, max_labels, segments_v, 2), np.float16)
            if segments_v else None)
    if segments_v:
        from yolov5_tpu.ops.rasterize import densify_polygon
    for i in range(n):
        im, _, (h, w) = ds.load_image(i)
        images[i, :h, :w] = im[..., ::-1]  # BGR -> RGB
        hw[i] = (h, w)
        lab = ds.labels[i]
        m = min(len(lab), max_labels)
        if m:
            targets[i, :m] = lab[:m]
            valid[i, :m] = True
        if segments_v:
            for j, seg in enumerate(ds.segments[i][:max_labels]):
                # always a DENSE boundary (original vertices preserved):
                # downstream visibility filters test vertices only
                segs[i, j] = densify_polygon(seg, segments_v)
    out = {"images": images, "hw": hw, "targets": targets, "valid": valid}
    if segments_v:
        out["segments"] = segs
    return out


def cache_nbytes(ds, max_labels=128, segments_v=0):
    s = ds.img_size
    return len(ds) * (s * s * 3 + max_labels * (24 + segments_v * 4) + 16)


def device_memory_budget(default=16 << 30, fraction=0.35):
    """A conservative share of per-device memory for the cache."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or default
        in_use = stats.get("bytes_in_use") or 0
        return max(0, int((limit - in_use) * fraction))
    except Exception:
        return int(default * fraction)


def index_batches(loader):
    """Per-epoch shuffled/sharded index batches for a device-cached dataset:
    the only thing the host ships per step."""
    idx = loader._indices(loader.epoch)
    nb = len(loader)
    for bi in range(nb):
        chunk = [int(i) for i in idx[bi * loader.bs : (bi + 1) * loader.bs]]
        real = len(chunk)
        while len(chunk) < loader.bs:
            chunk.append(chunk[-1])
        yield {"idx": np.asarray(chunk, np.int32), "real": real}
