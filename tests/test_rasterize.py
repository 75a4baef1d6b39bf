"""Oracle tests: on-device polygon rasterization vs the host cv2.fillPoly
path (data/dataset.py:rasterize_masks)."""

import numpy as np
import pytest

import jax.numpy as jnp

from yolov5_tpu.data.dataset import rasterize_masks
from yolov5_tpu.ops.rasterize import (
    polygon_areas,
    rasterize,
    rasterize_overlap,
    resample_polygon,
)


def iou(a, b):
    a, b = a.astype(bool), b.astype(bool)
    u = (a | b).sum()
    return (a & b).sum() / u if u else 1.0


def _random_convex(rng, img_px, v=12):
    """Random convex-ish polygon: sorted angles around a center."""
    cx, cy = rng.uniform(0.25, 0.75, 2) * img_px
    r = rng.uniform(0.08, 0.22) * img_px
    ang = np.sort(rng.uniform(0, 2 * np.pi, v))
    rad = r * rng.uniform(0.6, 1.0, v)
    return np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], 1).astype(
        np.float32
    )


def test_square_exact():
    hm = wm = 32
    poly = np.array([[[4, 4], [20, 4], [20, 12], [4, 12]]], np.float32)
    nv = np.array([4], np.int32)
    out = np.asarray(rasterize(jnp.asarray(poly), jnp.asarray(nv), hm, wm))
    expect = np.zeros((hm, wm), bool)
    expect[4:13, 4:21] = True  # boundary-inclusive like cv2.fillPoly
    np.testing.assert_array_equal(out[0], expect)


def test_degenerate_polygons_empty():
    polys = np.zeros((3, 8, 2), np.float32)
    polys[1, :2] = [[1, 1], [5, 5]]  # 2 vertices: no area
    nv = np.array([0, 2, 0], np.int32)
    out = np.asarray(rasterize(jnp.asarray(polys), jnp.asarray(nv), 16, 16))
    assert not out.any()


def test_areas_match_shoelace():
    poly = np.array([[[0, 0], [10, 0], [10, 4], [0, 4]]], np.float32)
    a = np.asarray(polygon_areas(jnp.asarray(poly), jnp.asarray([4])))
    np.testing.assert_allclose(a, [40.0])


def test_matches_host_rasterizer():
    """Float polygons: device agrees with cv2 up to cv2's int32 vertex cast
    (the device version keeps sub-pixel vertices, so it is the more accurate
    of the two; IoU floor reflects the cast delta on small 80px masks)."""
    rng = np.random.default_rng(0)
    img_px, hm = 320, 80
    for _ in range(5):
        m = int(rng.integers(1, 5))
        segs = [_random_convex(rng, img_px) for _ in range(m)]
        labels = np.zeros((m, 5), np.float32)
        host = rasterize_masks(segs, labels, hm, hm, img_px, overlap=False)
        v = 16
        polys = np.zeros((m, v, 2), np.float32)
        nv = np.zeros((m,), np.int32)
        for i, s in enumerate(segs):
            polys[i, : len(s)] = s * (hm / img_px)
            nv[i] = len(s)
        dev = np.asarray(rasterize(jnp.asarray(polys), jnp.asarray(nv), hm, hm))
        for i in range(m):
            assert iou(dev[i], host[i]) > 0.78, f"instance {i}"


def test_matches_host_rasterizer_int_cast():
    """With the host's int32 truncation applied to the vertices first, the
    two rasterizers converge (residual = Bresenham corner handling)."""
    rng = np.random.default_rng(1)
    img_px, hm = 320, 80
    for _ in range(5):
        m = int(rng.integers(1, 5))
        segs = [_random_convex(rng, img_px) for _ in range(m)]
        labels = np.zeros((m, 5), np.float32)
        host = rasterize_masks(segs, labels, hm, hm, img_px, overlap=False)
        v = 16
        polys = np.zeros((m, v, 2), np.float32)
        nv = np.zeros((m,), np.int32)
        for i, s in enumerate(segs):
            polys[i, : len(s)] = np.floor(s * (hm / img_px))
            nv[i] = len(s)
        dev = np.asarray(rasterize(jnp.asarray(polys), jnp.asarray(nv), hm, hm))
        for i in range(m):
            assert iou(dev[i], host[i]) > 0.85, f"instance {i}"


def test_overlap_encoding_matches_host():
    """Desc-area paint order with original-index values."""
    rng = np.random.default_rng(3)
    img_px, hm = 320, 80
    # big square (idx 0) + small square inside it (idx 1): overlap encoding
    # must keep the small one on top with value 2
    segs = [
        np.array([[40, 40], [280, 40], [280, 280], [40, 280]], np.float32),
        np.array([[120, 120], [200, 120], [200, 200], [120, 200]], np.float32),
    ]
    labels = np.zeros((2, 5), np.float32)
    host = rasterize_masks(segs, labels, hm, hm, img_px, overlap=True)
    polys = np.stack([resample_polygon(s, 16) * (hm / img_px) for s in segs])
    dev = np.asarray(
        rasterize_overlap(jnp.asarray(polys), jnp.asarray([16, 16]), hm, hm)
    )
    assert (dev == 2).any() and (dev == 1).any()
    agree = (dev == host).mean()
    assert agree > 0.95, f"only {agree:.2%} pixels agree with host encoding"


def test_densify_keeps_corners():
    from yolov5_tpu.ops.rasterize import densify_polygon

    sq = np.array([[0, 0], [8, 0], [8, 8], [0, 8]], np.float32)
    out = densify_polygon(sq, 32)
    assert out.shape == (32, 2)
    # every original corner survives exactly
    for c in sq:
        assert (np.abs(out - c).sum(1) < 1e-6).any(), c
    # inserted points lie on the perimeter
    on_edge = (
        np.isclose(out[:, 0], 0) | np.isclose(out[:, 0], 8)
        | np.isclose(out[:, 1], 0) | np.isclose(out[:, 1], 8)
    )
    assert on_edge.all()
    # degenerate inputs don't crash
    assert densify_polygon(np.zeros((0, 2)), 8).shape == (8, 2)
    assert densify_polygon(np.array([[1.0, 1.0]]), 8).shape == (8, 2)


def test_resample_preserves_shape():
    sq = np.array([[0, 0], [8, 0], [8, 8], [0, 8]], np.float32)
    out = resample_polygon(sq, 32)
    assert out.shape == (32, 2)
    # all resampled points lie on the square's perimeter
    on_edge = (
        np.isclose(out[:, 0], 0) | np.isclose(out[:, 0], 8)
        | np.isclose(out[:, 1], 0) | np.isclose(out[:, 1], 8)
    )
    assert on_edge.all()
