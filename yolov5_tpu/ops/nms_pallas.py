"""Pallas TPU kernel for greedy NMS suppression.

The jnp implementation (`ops/nms.py:_greedy_nms_tiled`) round-trips each
tile's IoU matrices through XLA ops; this kernel keeps the entire candidate
set and the running keep-mask in VMEM and walks the tiles on the sequential
TPU grid — scratch persists across grid steps, so the cross-tile dependency
(kept boxes suppress later tiles) is a single VMEM read instead of a carried
HBM tensor.

Grid: (batch, K/T). For each tile:
  1. cross-suppression: any kept earlier box with IoU > t kills a candidate
  2. within-tile alive/dead fixpoint (same monotone dataflow as the jnp
     version — converges to exact sequential greedy)
Scratch keep-mask is flushed to the output on the last tile of each image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _col(x, i):
    """Static column extract via slice (mosaic-lowerable, no gather)."""
    return jax.lax.slice_in_dim(x, i, i + 1, axis=1)[:, 0]


def _iou(a, b):
    """a (n, 4), b (m, 4) xyxy -> (n, m) IoU (f32). Written with explicit
    lax slices: jnp fancy indexing can lower to gather, which Mosaic
    rejects inside kernels."""
    ax1, ay1, ax2, ay2 = (_col(a, i) for i in range(4))
    bx1, by1, bx2, by2 = (_col(b, i) for i in range(4))
    iw = jnp.clip(jnp.minimum(ax2[:, None], bx2[None, :])
                  - jnp.maximum(ax1[:, None], bx1[None, :]), 0.0, None)
    ih = jnp.clip(jnp.minimum(ay2[:, None], by2[None, :])
                  - jnp.maximum(ay1[:, None], by1[None, :]), 0.0, None)
    inter = iw * ih
    area_a = jnp.clip(ax2 - ax1, 0, None) * jnp.clip(ay2 - ay1, 0, None)
    area_b = jnp.clip(bx2 - bx1, 0, None) * jnp.clip(by2 - by1, 0, None)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-7)


def _kernel(thres_ref, boxes_ref, scores_ref, keep_ref, keep_acc):
    # block shapes: boxes (1, K, 4), scores (1, K, 1), keep (1, K, 1)
    # (trailing singleton: TPU blocks need last dims divisible by (8, 128)
    # or equal to the full array dims)
    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    k = boxes_ref.shape[1]
    thres = thres_ref[0]

    @pl.when(ti == 0)
    def _():
        keep_acc[:, :] = jnp.zeros((k, 1), jnp.float32)

    start = ti * TILE
    tb = boxes_ref[0, pl.ds(start, TILE), :]
    ts = scores_ref[0, pl.ds(start, TILE), :][:, 0]

    # All mask algebra stays f32: Mosaic cannot insert a minor dim on i1
    # vectors (bool[:, None] fails to compile), and max/mul on f32 maps
    # cleanly onto the VPU anyway.
    all_boxes = boxes_ref[0, :, :]
    cross_gt = (_iou(all_boxes, tb) > thres).astype(jnp.float32)  # (K, T)
    pos = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]
    earlier_kept = jnp.where(pos < start, keep_acc[:, 0], 0.0)  # f32 0/1
    dead0 = jnp.max(earlier_kept[:, None] * cross_gt, axis=0)
    dead0 = jnp.maximum(dead0, (ts <= 0.0).astype(jnp.float32))

    # within-tile monotone fixpoint -> exact greedy
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    gt = ((rows < cols) & (_iou(tb, tb) > thres)).astype(jnp.float32)

    def cond(state):
        alive, dead, it = state
        resolved = jnp.maximum(alive, dead)
        return jnp.logical_and(it < TILE, jnp.min(resolved) < 0.5)

    def body(state):
        alive, dead, it = state
        unknown = 1.0 - jnp.maximum(alive, dead)
        dies = jnp.max(alive[:, None] * gt, axis=0)
        new_dead = jnp.maximum(dead, dies)
        blocked = jnp.max(jnp.maximum(alive, unknown)[:, None] * gt, axis=0)
        new_alive = jnp.maximum(alive, (1.0 - blocked) * (1.0 - new_dead))
        return new_alive, new_dead, it + 1

    alive0 = jnp.zeros((TILE,), jnp.float32)
    alive, _, _ = jax.lax.while_loop(cond, body, (alive0, dead0, 0))
    keep_acc[pl.ds(start, TILE), :] = alive[:, None]

    @pl.when(ti == n_tiles - 1)
    def _():
        keep_ref[0, :, :] = keep_acc[:, :] > 0.5


@functools.partial(jax.jit, static_argnames=("interpret",))
def greedy_nms_pallas(boxes, scores, iou_thres, interpret=False):
    """boxes (bs, K, 4) f32 score-sorted desc; scores (bs, K) with padding
    <= 0. Returns keep (bs, K) bool. K is padded to a TILE multiple."""
    bs, k, _ = boxes.shape
    pad = (-k) % TILE
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, pad)))
    kp = k + pad
    n_tiles = kp // TILE
    thres = jnp.asarray([iou_thres], jnp.float32)

    keep = pl.pallas_call(
        _kernel,
        grid=(bs, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # threshold scalar
            pl.BlockSpec((1, kp, 4), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, kp, 1), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, kp, 1), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bs, kp, 1), jnp.bool_),
        scratch_shapes=[pltpu.VMEM((kp, 1), jnp.float32)],
        interpret=interpret,
    )(thres, boxes.astype(jnp.float32), scores.astype(jnp.float32)[..., None])
    return keep[:, :k, 0]
