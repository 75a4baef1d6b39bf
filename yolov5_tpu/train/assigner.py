"""Vectorized anchor-target assignment with static shapes.

Re-designs the reference's `build_targets` (/root/reference/utils/loss.py:
185-247) — a boolean-indexing / concat pipeline with data-dependent shapes —
as a fully padded, masked computation: every (target, anchor, offset)
combination is materialized as a fixed-capacity lattice and invalid entries
carry a zero mask. XLA gets one static program; no recompiles, no host sync.

Semantics preserved exactly:
- anchor match: max(wh/anchor, anchor/wh) per-dim max < anchor_t
- neighbor-cell expansion with bias g=0.5: a target also lands in the
  horizontally/vertically adjacent cell when its fractional position is
  within g of that cell edge (and not on the image border), i.e. up to 3
  cells per (target, anchor) — offsets (0,0), (±1,0), (0,±1)
- gij = clip(floor(gxy - off), 0, n-1); tbox = (gxy - gij, gwh)
"""

from __future__ import annotations

import jax.numpy as jnp

# the 5 candidate cell offsets, scaled by g=0.5 (center, left, top, right, bottom)
_OFFSETS = jnp.array([[0.0, 0.0], [0.5, 0.0], [0.0, 0.5], [-0.5, 0.0], [0.0, -0.5]])


def build_targets_level(targets, valid, anchors, ny, nx, anchor_t=4.0):
    """Assign targets to one pyramid level.

    Args:
      targets: (bs, M, 5) padded labels [cls, x, y, w, h], xywh normalized 0-1.
      valid: (bs, M) bool padding mask.
      anchors: (na, 2) anchor sizes in *stride units* for this level.
      ny, nx: grid height/width (static ints).
      anchor_t: wh-ratio gate (hyp 'anchor_t').

    Returns dict with flat per-candidate arrays of shape (bs, M, na, 5, ...):
      mask  — candidate is a real assignment
      gj,gi — target cell (int32, clipped)
      a     — anchor index (int32)
      tbox  — (dx, dy, w, h): xy offset from cell origin in (-0.5, 1.5),
               wh in stride units
      tcls  — class id (int32)
    """
    bs, m, _ = targets.shape
    na = anchors.shape[0]
    dt = targets.dtype

    cls_id = targets[..., 0].astype(jnp.int32)  # (bs, M)
    gxy = targets[..., 1:3] * jnp.array([nx, ny], dt)  # grid-space xy
    gwh = targets[..., 3:5] * jnp.array([nx, ny], dt)  # grid-space wh

    # anchor ratio gate -> (bs, M, na)
    r = gwh[:, :, None, :] / anchors[None, None, :, :]
    ratio = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(-1)
    anchor_ok = ratio < anchor_t

    # offset gates -> (bs, M, 5)
    gxf = gxy % 1.0
    gxi = jnp.array([nx, ny], dt) - gxy
    gxif = gxi % 1.0
    left = (gxf[..., 0] < 0.5) & (gxy[..., 0] > 1.0)
    top = (gxf[..., 1] < 0.5) & (gxy[..., 1] > 1.0)
    right = (gxif[..., 0] < 0.5) & (gxi[..., 0] > 1.0)
    bottom = (gxif[..., 1] < 0.5) & (gxi[..., 1] > 1.0)
    center = jnp.ones_like(left)
    off_ok = jnp.stack([center, left, top, right, bottom], axis=-1)

    # degenerate padded rows (w or h == 0) never match
    nonzero = (gwh > 0).all(-1)
    mask = (
        valid[:, :, None, None]
        & nonzero[:, :, None, None]
        & anchor_ok[:, :, :, None]
        & off_ok[:, :, None, :]
    )  # (bs, M, na, 5)

    # cell indices per offset
    gij = jnp.floor(gxy[:, :, None, :] - _OFFSETS.astype(dt)[None, None, :, :])  # (bs,M,5,2)
    gi = jnp.clip(gij[..., 0], 0, nx - 1).astype(jnp.int32)
    gj = jnp.clip(gij[..., 1], 0, ny - 1).astype(jnp.int32)
    txy = gxy[:, :, None, :] - jnp.stack([gi, gj], axis=-1).astype(dt)  # (bs,M,5,2)

    # broadcast to the full (bs, M, na, 5) lattice
    gi = jnp.broadcast_to(gi[:, :, None, :], (bs, m, na, 5))
    gj = jnp.broadcast_to(gj[:, :, None, :], (bs, m, na, 5))
    txy = jnp.broadcast_to(txy[:, :, None, :, :], (bs, m, na, 5, 2))
    twh = jnp.broadcast_to(gwh[:, :, None, None, :], (bs, m, na, 5, 2))
    a_idx = jnp.broadcast_to(
        jnp.arange(na, dtype=jnp.int32)[None, None, :, None], (bs, m, na, 5)
    )
    tcls = jnp.broadcast_to(cls_id[:, :, None, None], (bs, m, na, 5))

    return {
        "mask": mask,
        "gi": gi,
        "gj": gj,
        "a": a_idx,
        "tbox": jnp.concatenate([txy, twh], axis=-1),
        "tcls": tcls,
    }
