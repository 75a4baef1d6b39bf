"""Detection / segmentation / classification losses, fully batched and jit-safe.

Replaces the reference `ComputeLoss` (/root/reference/utils/loss.py:101-183)
and its segment variant (utils/segment/loss.py). All reductions are masked
means over the fixed-capacity assignment lattice from `assigner.py`, so the
whole loss is one static XLA program.

Reference semantics kept:
- box: mean(1 - CIoU) over assigned candidates
- obj: BCE(pred_obj, tobj) where tobj holds the detached CIoU at assigned
  cells (gr=1.0), per-level balance [4.0, 1.0, 0.4] (P3-P5) or the 4/5-level
  tables, summed with obj gain
- cls: BCE one-vs-all with label smoothing, only when nc > 1
- gains scaled: box*=3/nl·hyp, cls*=nc/80·3/nl, obj*=(img/640)²·3/nl
  (that scaling lives in the trainer, reference train.py:325-328)
- total loss multiplied by batch size (reference loss.py:182)

Known deviation (documented): when several targets claim one cell the
reference's serial scatter keeps the *last* writer; we scatter-max on the
IoU value instead, which is deterministic under parallelism.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from yolov5_tpu.ops.boxes import bbox_iou, smooth_bce
from yolov5_tpu.train.assigner import build_targets_level

# per-level objectness balance (reference loss.py:119-121)
BALANCE = {3: (4.0, 1.0, 0.4), 4: (4.0, 1.0, 0.25, 0.06), 5: (4.0, 1.0, 0.25, 0.06, 0.02)}


def bce_with_logits(x, z, pos_weight=1.0):
    """Numerically-stable binary cross-entropy with logits + pos_weight,
    matching torch BCEWithLogitsLoss semantics."""
    log_sig = jax.nn.log_sigmoid(x)
    log_sig_neg = jax.nn.log_sigmoid(-x)
    return -(pos_weight * z * log_sig + (1.0 - z) * log_sig_neg)


def focal_scale(x, z, gamma=1.5, alpha=0.25):
    """Focal modulation factors for BCE terms (reference loss.py:36-57)."""
    p = jax.nn.sigmoid(x)
    p_t = z * p + (1 - z) * (1 - p)
    alpha_t = z * alpha + (1 - z) * (1 - alpha)
    return alpha_t * (1.0 - p_t) ** gamma


def qfocal_scale(x, z, gamma=1.5, alpha=0.25):
    """Quality-focal modulation (reference QFocalLoss, loss.py:76-98):
    weights by |z - sigmoid(x)|^gamma so soft targets (IoU-valued obj) are
    treated as quality scores, not hard classes."""
    p = jax.nn.sigmoid(x)
    alpha_t = z * alpha + (1 - z) * (1 - alpha)
    return alpha_t * jnp.abs(z - p) ** gamma


def bce_blur_with_logits(x, z, alpha=0.05, pos_weight=1.0):
    """BCE that fades the penalty of confident FPs (the reference's
    BCEBlurWithLogitsLoss, loss.py:11-33 — a 'missing label' mitigation)."""
    loss = bce_with_logits(x, z, pos_weight)
    dx = jax.nn.sigmoid(x) - z
    return loss * (1.0 - jnp.exp((dx - 1.0) / (alpha + 1e-4)))


def masked_mean(x, mask, eps=1e-9):
    return (x * mask).sum() / (mask.sum() + eps)


class ComputeLoss:
    """Detection loss. Construct once per model; call inside jit.

    Args:
      anchors_per_stride: (nl, na, 2) anchors in stride units
        (DetectionModel.anchors_per_stride).
      nc: class count. hyp: hyperparameter dict (box/obj/cls gains, *_pw,
      label_smoothing, fl_gamma, anchor_t).
    """

    def __init__(self, anchors_per_stride, nc, hyp, nl=None, autobalance=False,
                 gain=1.0):
        self.anchors = tuple(tuple(map(tuple, a)) for a in anchors_per_stride)
        self.nc = nc
        self.hyp = dict(hyp)
        self.nl = nl or len(self.anchors)
        self.balance = BALANCE.get(self.nl, (4.0, 1.0, 0.4))
        self.cp, self.cn = smooth_bce(self.hyp.get("label_smoothing", 0.0))
        self.gr = 1.0
        # quad mode trains on bs/4 images, so x4 restores the reference's
        # effective loss scale (train.py:411 `if opt.quad: loss *= 4.`)
        self.gain = gain

    def __call__(self, raw_maps: Sequence[jax.Array], targets, valid):
        """raw_maps: list of (bs, ny, nx, na, no) logits. targets (bs, M, 5)
        [cls,x,y,w,h] normalized; valid (bs, M) bool.

        Returns (total_loss, dict of components). Total is already scaled by
        batch size, matching the reference's `loss * bs`.
        """
        hyp = self.hyp
        bs = raw_maps[0].shape[0]
        f32 = jnp.float32
        lbox = jnp.zeros((), f32)
        lobj = jnp.zeros((), f32)
        lcls = jnp.zeros((), f32)
        fl_gamma = hyp.get("fl_gamma", 0.0)
        # hyp fl_type selects the focal variant: 'focal' (default) | 'qfocal'
        fscale = qfocal_scale if hyp.get("fl_type") == "qfocal" else focal_scale

        for i, pred in enumerate(raw_maps):
            # keep the full map in its compute dtype (bf16 on TPU): converting
            # the whole (bs,ny,nx,na,no) map to fp32 up front materializes
            # ~270 MB/step at b32@640 plus layout copies; gathering from bf16
            # and converting the 480-candidate slice is bit-identical (the
            # stored values are already bf16) and saves ~10% of step time
            _, ny, nx, na, no = pred.shape
            anchors = jnp.asarray(self.anchors[i], f32)
            asn = build_targets_level(
                targets.astype(f32), valid, anchors, ny, nx, hyp.get("anchor_t", 4.0)
            )
            mask = asn["mask"].astype(f32)  # (bs, M, na, 5)
            n_cand = mask.size // bs

            # gather predictions at assigned cells. The head emits the conv
            # output (bs,ny,nx,na*no) and reshapes to (bs,ny,nx,na,no); undoing
            # that reshape here lets XLA cancel the pair, so the 5D view (and
            # its tiled-layout copies in fwd AND grad) never materializes —
            # the loss reads the conv output directly. Cell gather first
            # (spatial index), anchor-block select second.
            lin = (asn["gj"] * nx + asn["gi"]) * na + asn["a"]  # (bs,M,na,5)
            lin_flat = lin.reshape(bs, -1)
            spat_flat = (asn["gj"] * nx + asn["gi"]).reshape(bs, -1)  # (bs, C)
            a_flat = asn["a"].reshape(bs, -1)
            pred2d = pred.reshape(bs, ny * nx, na * no)
            cells = jnp.take_along_axis(
                pred2d, spat_flat[..., None], axis=1
            )  # (bs, C, na*no)
            c = cells.shape[1]
            p = jnp.take_along_axis(
                cells.reshape(bs, c, na, no), a_flat[..., None, None], axis=2
            ).squeeze(2).astype(f32)  # (bs, C, no)
            m_flat = mask.reshape(bs, -1)

            # box regression
            pxy = jax.nn.sigmoid(p[..., 0:2]) * 2.0 - 0.5
            anch = anchors[asn["a"].reshape(bs, -1)]  # (bs, C, 2)
            pwh = (jax.nn.sigmoid(p[..., 2:4]) * 2.0) ** 2 * anch
            pbox = jnp.concatenate([pxy, pwh], axis=-1)
            tbox = asn["tbox"].reshape(bs, -1, 4)
            # padded candidates have w=h=0 which NaNs CIoU (atan(0/0)); give
            # them a unit box — their mask weight is 0 so the value is unused
            safe = jnp.asarray([0.0, 0.0, 1.0, 1.0], f32)
            tbox = jnp.where(m_flat[..., None] > 0, tbox, safe)
            iou = bbox_iou(pbox, tbox, xywh=True, CIoU=True).squeeze(-1)  # (bs, C)
            lbox += masked_mean(1.0 - iou, m_flat)

            # objectness target: detached iou scattered to cells (max-combine)
            iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0, None) * m_flat
            tobj = jnp.zeros((bs, ny * nx * na), f32)
            tobj = jax.vmap(lambda t, l, v: t.at[l].max(v))(tobj, lin_flat, iou_d)
            # obj logits via a 0/1 selection-matrix dot over the conv
            # output's channel dim (channel a*no+4) — ordering (spatial,
            # anchor) matches lin above. Exact (one term per output, f32
            # accumulate); an MXU dot reads pred2d in its native layout,
            # where the strided slice forced a full relayout copy of the
            # (bs, ny*nx, na*no) map (~1.4% of the train step at b32@640).
            sel = jnp.zeros((na * no, na), pred2d.dtype).at[
                jnp.arange(na) * no + 4, jnp.arange(na)].set(1)
            pobj = jax.lax.dot_general(
                pred2d, sel, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(bs, -1)
            obj_bce = bce_with_logits(pobj, tobj, hyp.get("obj_pw", 1.0))
            if fl_gamma > 0:
                obj_bce = obj_bce * fscale(pobj, tobj, fl_gamma)
            lobj += obj_bce.mean() * self.balance[i]

            # classification (one-vs-all BCE), only when multi-class
            if self.nc > 1:
                tcls_onehot = jax.nn.one_hot(asn["tcls"].reshape(bs, -1), self.nc, dtype=f32)
                tcls_sm = tcls_onehot * (self.cp - self.cn) + self.cn
                pcls = p[..., 5 : 5 + self.nc]
                cls_bce = bce_with_logits(pcls, tcls_sm, hyp.get("cls_pw", 1.0))
                if fl_gamma > 0:
                    cls_bce = cls_bce * fscale(pcls, tcls_sm, fl_gamma)
                lcls += masked_mean(cls_bce.mean(-1), m_flat)

        lbox *= hyp.get("box", 0.05)
        lobj *= hyp.get("obj", 1.0)
        lcls *= hyp.get("cls", 0.5)
        total = (lbox + lobj + lcls) * bs * self.gain
        return total, {"box": lbox, "obj": lobj, "cls": lcls}


def crop_mask(masks, boxes):
    """Zero mask pixels outside their xyxy box (reference
    utils/segment/general.py:10-22). masks (n, h, w), boxes (n, 4) in mask px."""
    n, h, w = masks.shape
    x = jnp.arange(w, dtype=boxes.dtype)[None, None, :]
    y = jnp.arange(h, dtype=boxes.dtype)[None, :, None]
    x1, y1, x2, y2 = (boxes[:, i].reshape(n, 1, 1) for i in range(4))
    inside = (x >= x1) & (x < x2) & (y >= y1) & (y < y2)
    return masks * inside


class ComputeSegmentLoss(ComputeLoss):
    """Adds the prototype-mask term (reference utils/segment/loss.py:15-195).

    Per assigned candidate: mask_pred = sigmoid(coeff @ proto), BCE vs the
    GT instance mask, cropped to the (downsampled) GT box, normalized by box
    area, `overlap` semantics supported via index-encoded GT masks.
    """

    def __init__(self, anchors_per_stride, nc, hyp, nm=32, overlap=True, seg_k=256, **kw):
        super().__init__(anchors_per_stride, nc, hyp, **kw)
        self.nm = nm
        self.overlap = overlap
        # fixed per-level capacity of mask-loss candidates: the (bs, K, hm, wm)
        # BCE tensor is the memory hot spot, so active candidates are compacted
        # to the front with top_k before any mask math
        self.seg_k = seg_k

    def __call__(self, raw, targets, valid, gt_masks=None):
        """raw: (maps, proto) from SegmentationModel. gt_masks: overlap mode
        (bs, hm, wm) int32 instance-index masks (0 = background), where
        instance i+1 corresponds to label row i; else (bs, M, hm, wm)."""
        raw_maps, proto = raw
        total, comps = super().__call__(raw_maps, targets, valid)
        if gt_masks is None:
            return total, comps

        hyp = self.hyp
        f32 = jnp.float32
        proto = proto.astype(f32)  # (bs, hm, wm, nm)
        bs, hm, wm, nm = proto.shape
        lseg = jnp.zeros((), f32)
        denom = jnp.zeros((), f32)
        overflow = jnp.zeros((), f32)  # mask-loss candidates beyond seg_k

        for i, pred in enumerate(raw_maps):
            # same gather-before-convert trick as the detection loss above
            _, ny, nx, na, no = pred.shape
            anchors = jnp.asarray(self.anchors[i], f32)
            asn = build_targets_level(
                targets.astype(f32), valid, anchors, ny, nx, hyp.get("anchor_t", 4.0)
            )
            mask = asn["mask"].astype(f32).reshape(bs, -1)
            lin = ((asn["gj"] * nx + asn["gi"]) * na + asn["a"]).reshape(bs, -1)
            m = targets.shape[1]
            tgt_row = jnp.broadcast_to(
                jnp.arange(m)[None, :, None, None], asn["mask"].shape
            ).reshape(bs, -1)  # label row index per candidate

            # compact active candidates to a fixed capacity K. Overflow is
            # counted and surfaced (comps['seg_overflow']) rather than
            # silently dropped: a crowded image (or mosaic of 4 busy images)
            # can exceed K, and the caller warns / the user raises seg_k.
            k = min(self.seg_k, mask.shape[1])
            n_active = mask.sum(axis=1)  # (bs,) real candidates this level
            overflow = overflow + jnp.maximum(n_active - k, 0.0).sum()
            sel_mask, sel = jax.lax.top_k(mask, k)  # (bs, K)
            lin = jnp.take_along_axis(lin, sel, axis=1)
            tgt_row = jnp.take_along_axis(tgt_row, sel, axis=1)
            mask = sel_mask

            # same reshape-cancelling gather as the detection loss
            spat = jnp.take_along_axis(
                pred.reshape(bs, ny * nx, na * no), (lin // na)[..., None], axis=1
            )  # (bs, K, na*no)
            p = jnp.take_along_axis(
                spat.reshape(bs, spat.shape[1], na, no),
                (lin % na)[..., None, None], axis=2,
            ).squeeze(2).astype(f32)
            coeff = p[..., 5 + self.nc :]  # (bs, K, nm)

            # GT instance mask per candidate
            if self.overlap:
                inst = (tgt_row + 1).astype(jnp.int32)  # (bs, K)
                gmask = (gt_masks[:, None, :, :] == inst[:, :, None, None]).astype(f32)
            else:
                gmask = jnp.take_along_axis(
                    gt_masks.astype(f32), tgt_row[:, :, None, None], axis=1
                )

            # predicted mask: coeff @ proto -> (bs, C, hm, wm)
            pm = jnp.einsum("bcn,bhwn->bchw", coeff, proto)
            seg_bce = bce_with_logits(pm, gmask)  # (bs, C, hm, wm)

            # crop to GT box (in mask pixels) and normalize by box area
            xywh = targets[..., 1:5].astype(f32)  # normalized
            box_px = jnp.concatenate(
                [
                    (xywh[..., 0:1] - xywh[..., 2:3] / 2) * wm,
                    (xywh[..., 1:2] - xywh[..., 3:4] / 2) * hm,
                    (xywh[..., 0:1] + xywh[..., 2:3] / 2) * wm,
                    (xywh[..., 1:2] + xywh[..., 3:4] / 2) * hm,
                ],
                axis=-1,
            )  # (bs, M, 4) xyxy
            cand_box = jnp.take_along_axis(box_px, tgt_row[..., None], axis=1)  # (bs,C,4)
            xg = jnp.arange(wm, dtype=f32)[None, None, None, :]
            yg = jnp.arange(hm, dtype=f32)[None, None, :, None]
            inside = (
                (xg >= cand_box[..., 0, None, None])
                & (xg < cand_box[..., 2, None, None])
                & (yg >= cand_box[..., 1, None, None])
                & (yg < cand_box[..., 3, None, None])
            )
            area = jnp.clip(
                (cand_box[..., 2] - cand_box[..., 0]) * (cand_box[..., 3] - cand_box[..., 1]),
                1.0,
            )
            per_cand = (seg_bce * inside).sum((-1, -2)) / area  # (bs, C)
            lseg += (per_cand * mask).sum()
            denom += mask.sum()

        lseg = lseg / jnp.maximum(denom, 1.0) * hyp.get("box", 0.05)
        total = total + lseg * bs
        comps = dict(comps, seg=lseg, seg_overflow=overflow)
        return total, comps


def classification_loss(logits, labels, label_smoothing=0.0):
    """Plain cross entropy (reference utils/torch_utils.py:52-58)."""
    import optax

    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels, label_smoothing=label_smoothing
    ).mean()
