"""On-device polygon -> instance-mask rasterization.

TPU-native replacement for the host cv2.fillPoly path
(data/dataset.py:rasterize_masks, reference ultralytics
polygons2masks[_overlap], utils/segment/dataloaders.py:10): the even-odd
(crossing-number) point-in-polygon test evaluated for every pixel center is
a dense, branch-free reduction over polygon edges — ideal VPU work — so GT
masks can be built inside the jitted train step from (M, V, 2) vertex
tensors instead of being rasterized per image on the host and shipped over
PCIe/tunnel every step.

Geometry note: the host path scales polygons to mask resolution, casts to
int32 and calls cv2.fillPoly, which paints boundary pixels inclusively. To
match, the even-odd test is evaluated on the (hm+1, wm+1) pixel-CORNER grid
and a pixel is set when any of its four corners falls inside — a half-pixel
dilation equivalent to fillPoly's boundary handling (oracle-tested with IoU
floors in tests/test_rasterize.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def polygon_areas(polys, n_valid):
    """Shoelace |area| per padded polygon.

    polys: (M, V, 2) float vertices, first n_valid[m] rows meaningful.
    n_valid: (M,) int32 vertex counts (0 = no instance).
    Returns (M,) float32 — matches cv2.contourArea on simple polygons.
    """
    m, v, _ = polys.shape
    j = jnp.arange(v)
    nxt = jnp.where(j == n_valid[:, None] - 1, 0, j + 1)  # wrap per polygon
    ev = (j[None, :] < n_valid[:, None]).astype(polys.dtype)  # edge valid
    x, y = polys[..., 0], polys[..., 1]
    xn = jnp.take_along_axis(x, nxt, axis=1)
    yn = jnp.take_along_axis(y, nxt, axis=1)
    cross = (x * yn - xn * y) * ev
    return jnp.abs(cross.sum(-1)) * 0.5


def rasterize(polys, n_valid, hm, wm):
    """Even-odd fill of padded polygons on an (hm, wm) grid.

    polys: (M, V, 2) float [x, y] in MASK-pixel coordinates.
    n_valid: (M,) int32 vertex counts.
    Returns (M, hm, wm) bool. Degenerate polygons (n_valid < 3) are empty.
    """
    mdim, v, _ = polys.shape
    f32 = jnp.float32
    polys = polys.astype(f32)
    j = jnp.arange(v)
    nxt = jnp.where(j == n_valid[:, None] - 1, 0, j + 1)
    ev = (j[None, :] < n_valid[:, None]) & (n_valid[:, None] >= 3)

    x1, y1 = polys[..., 0], polys[..., 1]  # (M, V)
    x2 = jnp.take_along_axis(x1, nxt, axis=1)
    y2 = jnp.take_along_axis(y1, nxt, axis=1)

    # cv2's model: pixel (ix, iy) is the POINT (ix, iy), and fillPoly paints
    # the interior PLUS the Bresenham outline — every pixel the boundary
    # passes within ~half a pixel of. Sampling each pixel at its 4 half-pixel
    # offsets (ix±0.5, iy±0.5) and painting when ANY sample is interior
    # reproduces that: axis-aligned edges land exactly, slanted edges within
    # half a pixel (oracle IoU floors in tests/test_rasterize.py).
    eps = 0.5
    off = jnp.asarray([-eps, eps], f32)
    px = (jnp.arange(wm, dtype=f32)[:, None] + off[None, :]).reshape(-1)
    py = (jnp.arange(hm, dtype=f32)[:, None] + off[None, :]).reshape(-1)

    def edge_body(carry, edge):
        ex1, ey1, ex2, ey2, valid = edge  # each (M,)
        # straddle test per sampled row: (M, 2*hm)
        straddle = (ey1[:, None] > py[None, :]) != (ey2[:, None] > py[None, :])
        dy = ey2 - ey1
        t = (py[None, :] - ey1[:, None]) / jnp.where(dy == 0, 1.0, dy)[:, None]
        xint = ex1[:, None] + t * (ex2 - ex1)[:, None]  # (M, 2*hm)
        hit = straddle & valid[:, None]
        # crossing for points strictly left of the intersection
        crossings = hit[:, :, None] & (px[None, None, :] < xint[:, :, None])
        return carry ^ crossings, None

    init = jnp.zeros((mdim, 2 * hm, 2 * wm), bool)
    edges = (x1.T, y1.T, x2.T, y2.T, ev.T)  # scan over V
    pts, _ = jax.lax.scan(edge_body, init, edges)
    # pixel on if any of its 4 jittered samples is inside
    return pts.reshape(mdim, hm, 2, wm, 2).any(axis=(2, 4))


def rasterize_overlap(polys, n_valid, hm, wm):
    """Index-encoded single mask: instance i painted with value i+1 in
    DESCENDING area order (later = smaller = on top), matching the host
    rasterize_masks(overlap=True) / reference polygons2masks_overlap.

    Returns (hm, wm) int32, 0 = background.
    """
    masks = rasterize(polys, n_valid, hm, wm)  # (M, hm, wm)
    areas = polygon_areas(polys, n_valid)
    m = polys.shape[0]
    # "paint in descending-area order, later overwrites" == at every pixel
    # the covering instance with the SMALLEST area wins; resolve that with
    # one argmax over a per-instance rank instead of an M-step scan
    order = jnp.argsort(-areas)  # descending area
    rank = jnp.zeros((m,), jnp.int32).at[order].set(jnp.arange(m, dtype=jnp.int32))
    score = jnp.where(masks, rank[:, None, None] + 1, 0)  # (M, hm, wm)
    top = jnp.argmax(score, axis=0)  # instance index of the winner
    covered = score.max(axis=0) > 0
    return jnp.where(covered, top.astype(jnp.int32) + 1, 0)


def densify_polygon(points, n_out):
    """Host-side helper: grow a polygon to exactly n_out vertices by
    inserting points along its edges (apportioned by edge length), KEEPING
    every original vertex — corners stay exact, unlike plain arc-length
    resampling. Dense boundaries matter because segment2box-style filters
    test only vertex visibility (reference resamples to 1000 points before
    warping, utils/segment/augmentations.py); with sparse vertices a large
    visible shape whose corners all fall outside the crop would be dropped.
    Falls back to arc resampling when the polygon already has >= n_out."""
    import numpy as np

    pts = np.asarray(points, np.float32)
    n = len(pts)
    if n == 0:
        return np.zeros((n_out, 2), np.float32)
    if n >= n_out:
        return resample_polygon(pts, n_out)
    closed = np.concatenate([pts, pts[:1]], 0)
    seglen = np.linalg.norm(np.diff(closed, axis=0), axis=1)  # (n,)
    extra = n_out - n
    if seglen.sum() == 0:
        return np.concatenate([pts, np.repeat(pts[-1:], extra, 0)])
    quota = seglen / seglen.sum() * extra
    cnt = np.floor(quota).astype(int)
    rem = extra - cnt.sum()
    order = np.argsort(-(quota - cnt))
    cnt[order[:rem]] += 1
    out = []
    for i in range(n):
        out.append(pts[i])
        k = int(cnt[i])
        if k:
            t = (np.arange(1, k + 1, dtype=np.float32) / (k + 1))[:, None]
            out.extend(closed[i] * (1 - t) + closed[i + 1] * t)
    return np.asarray(out, np.float32)


def resample_polygon(points, n_out):
    """Host-side helper: uniformly resample a closed polygon (numpy (n, 2))
    to n_out vertices along its perimeter (reference resample_segments
    semantics — interpolation over the closed contour)."""
    import numpy as np

    pts = np.asarray(points, np.float32)
    if len(pts) == 0:
        return np.zeros((n_out, 2), np.float32)
    closed = np.concatenate([pts, pts[:1]], 0)
    seg = np.linalg.norm(np.diff(closed, axis=0), axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1]
    if total == 0:
        return np.repeat(pts[:1], n_out, 0)
    want = np.linspace(0, total, n_out, endpoint=False)
    xi = np.interp(want, cum, closed[:, 0])
    yi = np.interp(want, cum, closed[:, 1])
    return np.stack([xi, yi], 1).astype(np.float32)
