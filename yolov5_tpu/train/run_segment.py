"""Segmentation workload: masks dataloader + 4-component loss + mask mAP val.

Equivalent of /root/reference/segment/train.py and segment/val.py
(forks of the detect scripts with mask plumbing, SURVEY.md §0.3).
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from yolov5_tpu.data.dataset import create_loader
from yolov5_tpu.eval.metrics import ap_per_class, process_batch
from yolov5_tpu.models import SegmentationModel
from yolov5_tpu.ops.masks import process_mask
from yolov5_tpu.ops.nms import detections_to_numpy, non_max_suppression
from yolov5_tpu.parallel.mesh import make_mesh, prefetch_to_mesh, replicate
from yolov5_tpu.train.loss import ComputeSegmentLoss
from yolov5_tpu.train.optim import build_optimizer
from yolov5_tpu.train.trainer import init_train_state, make_train_step, scale_hyp
from yolov5_tpu.utils.checkpoint import save_checkpoint
from yolov5_tpu.utils.general import check_dataset, check_img_size, increment_path, init_seeds
from yolov5_tpu.utils.hyp import load_hyp
from yolov5_tpu.utils.loggers import Loggers


def _segm_json_rows(pred, proto_b, im_file, native_hw, lb_hw, coco91):
    """COCO segm rows for one image (reference segment/val.py:72-101
    save_one_json). pred (n, 6+nm) [xyxy conf cls coeffs] in letterbox px;
    proto_b (hm, wm, nm) fp32. Masks: sigmoid(coeff@proto) at proto res,
    crop to box, bilinear to letterbox, >0.5, un-letterbox to native, >0.5,
    RLE-encode."""
    import cv2

    from yolov5_tpu.eval.evaluator import COCO80_TO_COCO91, _scale_to_native
    from yolov5_tpu.eval.rle import mask_to_rle

    nh, nw = native_hw
    bh, bw = lb_hw
    hm, wm, nm = proto_b.shape
    n = pred.shape[0]
    coeff = pred[:, 6:6 + nm].astype(np.float32)
    logits = coeff @ proto_b.reshape(hm * wm, nm).T  # (n, hm*wm)
    masks = 1.0 / (1.0 + np.exp(-logits))
    masks = masks.reshape(n, hm, wm)
    # crop at proto resolution (reference process_mask crop-before-upsample)
    bx = pred[:, :4] * np.array([wm / bw, hm / bh, wm / bw, hm / bh],
                                np.float32)
    xg = np.arange(wm, dtype=np.float32)[None, None, :]
    yg = np.arange(hm, dtype=np.float32)[None, :, None]
    inside = ((xg >= bx[:, 0, None, None]) & (xg < bx[:, 2, None, None])
              & (yg >= bx[:, 1, None, None]) & (yg < bx[:, 3, None, None]))
    masks *= inside

    gain = min(bh / nh, bw / nw)
    pad_x, pad_y = (bw - nw * gain) / 2, (bh - nh * gain) / 2
    top, left = int(round(pad_y - 0.1)), int(round(pad_x - 0.1))
    bottom, right = int(round(bh - pad_y + 0.1)), int(round(bw - pad_x + 0.1))

    box_n = _scale_to_native(pred[:, :4].astype(np.float64), lb_hw, native_hw)
    stem = Path(im_file).stem
    image_id = int(stem) if stem.isnumeric() else stem
    rows = []
    for i in range(n):
        ml = cv2.resize(masks[i], (bw, bh), interpolation=cv2.INTER_LINEAR)
        mb = (ml > 0.5).astype(np.float32)[top:bottom, left:right]
        mn = cv2.resize(mb, (nw, nh), interpolation=cv2.INTER_LINEAR) > 0.5
        cid = int(pred[i, 5])
        if coco91 and cid < len(COCO80_TO_COCO91):
            cid = COCO80_TO_COCO91[cid]
        x1, y1, x2, y2 = box_n[i]
        rows.append({
            "image_id": image_id,
            "category_id": cid,
            "bbox": [round(float(x1), 3), round(float(y1), 3),
                     round(float(x2 - x1), 3), round(float(y2 - y1), 3)],
            "score": round(float(pred[i, 4]), 5),
            "segmentation": mask_to_rle(mn),
        })
    return rows


def evaluate_segment(model, variables, loader, conf_thres=0.001, iou_thres=0.6,
                     max_det=300, overlap=True, verbose=False,
                     save_json=None, coco91=False):
    """Box + mask mAP (reference segment/val.py:160-320).

    save_json: path for COCO-format rows {image_id, category_id, bbox,
    score, segmentation: RLE} — the reference's segm save_one_json
    (segment/val.py:72-101) with pycocotools-compatible RLE (eval/rle.py).
    Masks are re-derived on the host from the fetched prototypes + NMS
    coefficients at proto resolution, upsampled to letterbox space,
    thresholded, un-letterboxed to native size (reference process_mask
    upsample=True -> scale_image order)."""
    iouv = np.linspace(0.5, 0.95, 10)
    s = loader.ds.img_size
    json_rows = [] if save_json is not None else None

    forward = getattr(model, "_seg_eval_forward", None)
    if forward is None:
        @jax.jit
        def forward(v, images):
            x = images.astype(model.dtype) / 255.0
            maps, proto = model.apply(v, x, train=False)
            return model.decode(maps), proto

        model._seg_eval_forward = forward

    # Mask IoU runs ON DEVICE: pred masks (process_mask at image resolution,
    # reference segment/val.py upsample=True semantics) and bilinear-upsampled
    # GT stay in HBM; intersection is one (G, hw) @ (hw, P) MXU matmul and
    # only the tiny (G, P) IoU matrix crosses to the host. Shipping the
    # full-resolution masks instead (max_det * s * s floats PER IMAGE) is
    # catastrophic on remote/tunneled devices.
    iou_key = f"_seg_mask_iou_{s}_{max_det}_{overlap}"
    mask_iou_dev = getattr(model, iou_key, None)
    if mask_iou_dev is None:
        def _iou_one(proto_b, coeffs, boxes, pvalid, gm, gvalid):
            pm = process_mask(proto_b, coeffs, boxes, (s, s), upsample=True)
            pmf = ((pm > 0.5) & pvalid[:, None, None]).reshape(
                pm.shape[0], -1).astype(jnp.bfloat16)
            G = gvalid.shape[0]
            if overlap:
                inst = jnp.arange(1, G + 1, dtype=gm.dtype)
                gt = (gm[None] == inst[:, None, None])
            else:
                gt = gm.astype(bool)
            gt = jax.image.resize(gt.astype(jnp.float32), (G, s, s), "bilinear")
            gtf = ((gt > 0.5) & gvalid[:, None, None]).reshape(
                G, -1).astype(jnp.bfloat16)
            inter = jax.lax.dot_general(
                gtf, pmf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # exact: 0/1 sums < 2^24
            area_g = jnp.sum(gtf.astype(jnp.float32), axis=1)
            area_p = jnp.sum(pmf.astype(jnp.float32), axis=1)
            union = area_g[:, None] + area_p[None, :] - inter
            return inter / jnp.maximum(union, 1e-9)

        # lax.map = sequential per-image execution (per-image VMEM/HBM
        # footprint, unlike vmap) but ONE dispatch per val batch — on a
        # tunneled device the per-call round trip dominates, so batching
        # the calls is worth ~bs x in eval wall time
        @jax.jit
        def mask_iou_dev(proto, coeffs, boxes, pvalid, gms, gvalids):
            return jax.lax.map(lambda t: _iou_one(*t),
                               (proto, coeffs, boxes, pvalid, gms, gvalids))

        setattr(model, iou_key, mask_iou_dev)

    stats_box, stats_mask = [], []
    n_images = 0
    # host pre-pack (layers.fold_s2d): skip the in-graph s2d input fold —
    # same as eval/evaluator.py
    can_pack = hasattr(model, "wants_packed_input")
    for batch in loader:
        im_np = batch["images"]
        if can_pack and model.wants_packed_input(int(im_np.shape[1]),
                                                 int(im_np.shape[2])):
            from yolov5_tpu.models.layers import fold_s2d

            im_np = np.ascontiguousarray(fold_s2d(np.asarray(im_np)))
        images = jnp.asarray(im_np)
        preds, proto = forward(variables, images)
        dets = non_max_suppression(preds, conf_thres=conf_thres,
                                   iou_thres=iou_thres, multi_label=True,
                                   max_det=max_det, nc=model.nc)
        rows = detections_to_numpy(dets)
        bs = int(batch.get("real", images.shape[0]))  # skip pad duplicates
        n_images += bs
        hm, wm = proto.shape[1], proto.shape[2]
        masks_dev = jnp.asarray(batch["masks"])  # one upload per batch
        valid_np = np.asarray(batch["valid"])
        # one device call computes mask IoU for every image in the batch
        nb_full = rows[0].shape[1] - 6 if rows and rows[0].shape[1] > 6 else 0
        iou_all = None
        if nb_full:
            B = images.shape[0]
            coeffs_b = np.zeros((B, max_det, nb_full), np.float32)
            boxes_b = np.zeros((B, max_det, 4), np.float32)
            pvalid_b = np.zeros((B, max_det), bool)
            for b in range(bs):
                npred = rows[b].shape[0]
                coeffs_b[b, :npred] = rows[b][:, 6:]
                boxes_b[b, :npred] = rows[b][:, :4]
                pvalid_b[b, :npred] = True
            iou_all = np.asarray(mask_iou_dev(
                proto, jnp.asarray(coeffs_b), jnp.asarray(boxes_b),
                jnp.asarray(pvalid_b), masks_dev, jnp.asarray(valid_np)))
        for b in range(bs):
            pred = rows[b]
            lab = batch["targets"][b][batch["valid"][b]]
            if len(lab):
                xyxy = np.empty((len(lab), 4), np.float32)
                xyxy[:, 0] = (lab[:, 1] - lab[:, 3] / 2) * s
                xyxy[:, 1] = (lab[:, 2] - lab[:, 4] / 2) * s
                xyxy[:, 2] = (lab[:, 1] + lab[:, 3] / 2) * s
                xyxy[:, 3] = (lab[:, 2] + lab[:, 4] / 2) * s
                labels = np.concatenate([lab[:, 0:1], xyxy], axis=1)
            else:
                labels = np.zeros((0, 5), np.float32)
            correct_box = process_batch(pred[:, :6], labels, iouv)
            stats_box.append((correct_box, pred[:, 4], pred[:, 5], labels[:, 0]))

            # mask branch — matched at IMAGE resolution like the reference
            # (segment/val.py: process_mask(upsample=True) + interpolated GT;
            # binary IoU at proto resolution is boundary-dominated for small
            # objects and lands right on the 0.5 matching threshold). The IoU
            # matrix itself is computed on-device (see mask_iou_dev above).
            n_pred = int(pred.shape[0])
            nl = len(labels)
            if n_pred and iou_all is not None and nl:
                correct_mask = process_batch(pred[:, :6], labels, iouv,
                                             iou=iou_all[b][:nl, :n_pred])
            else:
                correct_mask = np.zeros((n_pred, len(iouv)), bool)
            stats_mask.append((correct_mask, pred[:, 4], pred[:, 5], labels[:, 0]))

            if json_rows is not None and n_pred:
                idx = int(batch["indices"][b])
                json_rows.extend(_segm_json_rows(
                    pred, np.asarray(proto[b], np.float32),
                    loader.ds.im_files[idx],
                    tuple(int(x) for x in loader.ds.shapes[idx]),
                    (s, s), coco91))

    def summarize(stats):
        if not stats:
            return {"p": 0.0, "r": 0.0, "map50": 0.0, "map": 0.0}
        tp = np.concatenate([x[0] for x in stats])
        conf = np.concatenate([x[1] for x in stats])
        cls = np.concatenate([x[2] for x in stats])
        tcls = np.concatenate([x[3] for x in stats])
        if tp.shape[0] and tcls.shape[0]:
            r = ap_per_class(tp, conf, cls, tcls)
            return {"p": r["p"].mean(), "r": r["r"].mean(),
                    "map50": r["ap"][:, 0].mean(), "map": r["ap"].mean()}
        return {"p": 0.0, "r": 0.0, "map50": 0.0, "map": 0.0}

    box = summarize(stats_box)
    mask = summarize(stats_mask)
    out = {"box": box, "mask": mask, "images": n_images,
           "fitness": 0.9 * (box["map"] + mask["map"]) / 2
                      + 0.1 * (box["map50"] + mask["map50"]) / 2}
    if json_rows is not None:
        import json

        Path(save_json).parent.mkdir(parents=True, exist_ok=True)
        Path(save_json).write_text(json.dumps(json_rows))
        out["json"] = str(save_json)
        print(f"saved {len(json_rows)} segm rows to {save_json}")
    if verbose:
        print(f"seg val: box mAP50 {box['map50']:.3f} mAP {box['map']:.3f} | "
              f"mask mAP50 {mask['map50']:.3f} mAP {mask['map']:.3f}")
    return out


def run(data, cfg="yolov5n-seg", hyp=None, epochs=100, batch_size=16,
        imgsz=640, optimizer="sgd", cos_lr=False, seed=0, workers=8,
        max_labels=128, single_cls=False, mask_ratio=4, no_overlap=False,
        seg_k=256,
        project="runs/train-seg", name="exp", exist_ok=False, nosave=False,
        noval=False, save_dir=None, dtype="bfloat16", device_aug=False,
        cache=None, segments_v=32, weights="", resume="", patience=100,
        freeze=None, label_smoothing=0.0, save_period=-1, noautoanchor=False,
        noplots=False, sync_bn=False, multi_scale=False, _resume_ckpt=None):
    """Train an instance-segmentation model. Returns (best_fitness, results, dir).

    Full training-feature surface of the reference segment/train.py (which
    forks train.py wholesale): resume/patience/freeze/save_period/
    label_smoothing/autoanchor/plots behave exactly like train/run.py."""
    from yolov5_tpu.train.run import EarlyStopper, find_resume_ckpt
    from yolov5_tpu.utils.checkpoint import (
        anchors_from_yaml,
        anchors_to_yaml,
        load_checkpoint,
        restore_train_state,
        variables_from_checkpoint,
    )

    if resume and _resume_ckpt is None:
        import yaml

        ckpt_path = find_resume_ckpt(resume, project)
        run_dir = ckpt_path.parent
        opt_file, hyp_file = run_dir / "opt.yaml", run_dir / "hyp.yaml"
        if opt_file.exists():
            saved = yaml.safe_load(opt_file.read_text()) or {}
            saved.pop("resume", None)
            if hyp_file.exists():
                saved["hyp"] = str(hyp_file)
            print(f"resuming {run_dir} from saved config")
            return run(**saved, _resume_ckpt=str(ckpt_path),
                       save_dir=str(run_dir))
        _resume_ckpt = str(ckpt_path)
        save_dir = save_dir or str(ckpt_path.parent)
    init_seeds(seed)
    data_dict = check_dataset(data)
    nc = 1 if single_cls else int(data_dict["nc"])
    opt_dict = {
        k: (str(v) if isinstance(v, Path) else v) for k, v in dict(
            data=data, cfg=cfg, hyp=hyp, epochs=epochs, batch_size=batch_size,
            imgsz=imgsz, optimizer=optimizer, cos_lr=cos_lr, seed=seed,
            workers=workers, max_labels=max_labels, single_cls=single_cls,
            mask_ratio=mask_ratio, no_overlap=no_overlap, project=project,
            name=name, nosave=nosave, noval=noval, dtype=dtype,
            device_aug=device_aug, cache=cache, segments_v=segments_v,
            weights=weights, patience=patience, freeze=freeze,
            label_smoothing=label_smoothing, save_period=save_period,
            noautoanchor=noautoanchor, noplots=noplots,
            multi_scale=multi_scale,
        ).items()
    }
    hyp = load_hyp(hyp)
    if label_smoothing:
        hyp["label_smoothing"] = float(label_smoothing)
    if sync_bn:
        print("--sync-bn: cross-device BN stats are always on under GSPMD")
    overlap = not no_overlap

    save_dir = Path(save_dir) if save_dir else increment_path(
        Path(project) / name, exist_ok=exist_ok)
    save_dir.mkdir(parents=True, exist_ok=True)
    import yaml as _yaml

    (save_dir / "hyp.yaml").write_text(_yaml.safe_dump(hyp, sort_keys=False))
    (save_dir / "opt.yaml").write_text(_yaml.safe_dump(opt_dict, sort_keys=False))
    loggers = Loggers(save_dir)

    model = SegmentationModel(cfg, nc=nc,
                              dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    if data_dict.get("names"):
        model.names = {int(k): v for k, v in data_dict["names"].items()}
    imgsz = check_img_size(imgsz, s=max(model.stride))
    nm = dict(model.head_spec.kwargs).get("nm", 32)
    start_epoch = 0
    best_fitness = 0.0
    resume_payload = None
    if _resume_ckpt:
        resume_payload, meta = load_checkpoint(_resume_ckpt)
        model.variables = {"params": resume_payload["params"],
                           "batch_stats": resume_payload["batch_stats"]}
        if meta.get("anchors"):
            model.anchors = anchors_from_yaml(meta["anchors"])
            model.cfg["anchors"] = meta["anchors"]
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_fitness = float(meta.get("best_fitness", 0.0))
        # reference smart_resume semantics (torch_utils.py:296-309)
        assert start_epoch > 0, (
            f"{_resume_ckpt} training is finished, nothing to resume")
        if epochs < start_epoch:
            print(f"{_resume_ckpt} has been trained for {start_epoch - 1} "
                  f"epochs; fine-tuning for {epochs} more epochs")
            epochs += start_epoch - 1
    elif weights:
        if str(weights).endswith(".pt"):
            from yolov5_tpu.models.weights import import_torch_weights, load_torch_state_dict

            sd = load_torch_state_dict(weights)
            model.variables, missed = import_torch_weights(model, sd)
            if missed:
                print(f"weight import: {len(missed)} unmatched entries")
        else:
            payload, _ = load_checkpoint(weights)
            model.variables = variables_from_checkpoint(payload, prefer_ema=True)

    rank, world = jax.process_index(), jax.process_count()
    train_ds, train_loader = create_loader(
        data_dict["train"], img_size=imgsz, batch_size=batch_size, augment=True,
        hyp=hyp, workers=workers, max_labels=max_labels, seed=seed,
        shard=(rank, world), single_cls=single_cls, masks=True,
        mask_ratio=mask_ratio, overlap=overlap,
        # 'device' is handled below; ram/disk are host-side loader caches
        cache=cache if cache in ("ram", "disk") else None,
    )
    if not noautoanchor and not _resume_ckpt and not weights:
        from yolov5_tpu.utils.autoanchor import check_anchors

        new_anchors = check_anchors(train_ds, model, thr=hyp.get("anchor_t", 4.0),
                                    imgsz=imgsz)
        if new_anchors != model.anchors:
            model.anchors = new_anchors
            model.cfg["anchors"] = anchors_to_yaml(new_anchors)
            print("autoanchor: anchors updated")
    val_loader = None
    if data_dict.get("val") and not noval:
        _, val_loader = create_loader(
            data_dict["val"], img_size=imgsz, batch_size=batch_size,
            augment=False, shuffle=False, workers=workers,
            max_labels=max_labels, single_cls=single_cls, masks=True,
            mask_ratio=mask_ratio, overlap=overlap,
        )

    nb = len(train_loader)
    ms_sizes, ms_rng = [], None
    if multi_scale:
        from yolov5_tpu.train.run import multiscale_sizes

        ms_sizes = multiscale_sizes(imgsz, max(model.stride))
        ms_rng = np.random.default_rng(seed + 0x5CA1E)
        print(f"multi-scale: per-batch sizes {ms_sizes}")
    hyp_scaled = scale_hyp(hyp, nl=len(model.stride), nc=nc, imgsz=imgsz)
    loss_fn = ComputeSegmentLoss(model.anchors_per_stride, nc, hyp_scaled,
                                 nm=nm, overlap=overlap, seg_k=seg_k)
    tx = build_optimizer(model.params, hyp_scaled, epochs=epochs,
                         steps_per_epoch=nb, batch_size=batch_size,
                         name=optimizer, cos_lr=cos_lr, freeze=freeze)
    state = init_train_state(model, tx)
    if resume_payload is not None:
        state = restore_train_state(state, resume_payload)
        resume_payload = None
    stopper = EarlyStopper(patience)
    stopper.best_fitness, stopper.best_epoch = best_fitness, start_epoch
    mesh = make_mesh()

    # device-resident fast path (mirrors train/run.py): dataset + polygon
    # segments cached in HBM, mosaic/HSV/flips AND GT-mask rasterization all
    # inside the jitted step (data/device_aug.py:device_augment_seg). Falls
    # back to the host pipeline for non-separable geometry or copy_paste
    # (those augs are host-side) or when the cache doesn't fit.
    use_device_cache = False
    cache_host = None
    separable = not any(hyp.get(k, 0)
                        for k in ("degrees", "shear", "perspective", "copy_paste"))
    if device_aug and separable and hyp.get("mosaic", 0) > 0 \
            and cache in (None, "device"):
        from yolov5_tpu.data.device_cache import (
            build_cache_arrays,
            cache_nbytes,
            device_memory_budget,
        )

        need = cache_nbytes(train_ds, max_labels, segments_v=segments_v)
        if cache == "device" or need <= device_memory_budget():
            train_ds.cache = None
            cache_host = build_cache_arrays(train_ds, max_labels,
                                            segments_v=segments_v)
            use_device_cache = True
            print(f"device cache: {len(train_ds)} images + segments "
                  f"({need / 1e6:.0f} MB) resident in HBM")

    # diagnostic escape hatch: device cache + per-batch dispatch (no epoch
    # scan) — isolates data-pipeline effects from the scan when comparing
    no_scan = bool(os.environ.get("YOLOV5_TPU_NO_EPOCH_SCAN"))
    epoch_step = epoch_steps = step_fn = None
    if use_device_cache and no_scan:
        step_fn = make_train_step(
            model, loss_fn, tx, mesh=mesh, has_masks=True, device_aug_hyp=hyp,
            device_cache=True,
            mask_shape=(imgsz // mask_ratio, imgsz // mask_ratio),
            overlap=overlap)
    elif use_device_cache:
        from yolov5_tpu.train.trainer import make_epoch_step

        if multi_scale:
            # one compiled epoch-scan per stride bucket; GT masks rasterize
            # at the bucket's proto resolution (reference segment/train.py
            # :371 multi-scale + the loss's mask-to-proto downsample)
            epoch_steps = {
                sz: make_epoch_step(
                    model, loss_fn, tx, mesh, has_masks=True,
                    device_aug_hyp=hyp, overlap=overlap, ms_size=sz,
                    mask_shape=(sz // mask_ratio, sz // mask_ratio))
                for sz in ms_sizes}
        else:
            epoch_step = make_epoch_step(
                model, loss_fn, tx, mesh, has_masks=True, device_aug_hyp=hyp,
                mask_shape=(imgsz // mask_ratio, imgsz // mask_ratio),
                overlap=overlap)
    else:
        step_fn = make_train_step(
            model, loss_fn, tx, mesh=mesh, has_masks=True,
            mask_shape=(imgsz // mask_ratio, imgsz // mask_ratio),
            overlap=overlap)

    results = {}
    print(f"seg training {cfg}: {nb} steps/epoch, imgsz {imgsz}")
    with mesh:
        state = replicate(state, mesh)
        cache_dev = None
        if use_device_cache:
            cache_dev = replicate(cache_host, mesh)
            cache_host = None
        for epoch in range(start_epoch, epochs):
            train_loader.set_epoch(epoch)
            agg = None
            t0 = time.time()
            keys = ("images", "targets", "valid", "masks")
            if use_device_cache:
                from yolov5_tpu.data.device_cache import index_batches

                if no_scan:  # per-batch dispatch over the device cache
                    for b in index_batches(train_loader):
                        state, metrics = step_fn(
                            state, {"idx": jnp.asarray(b["idx"])}, cache_dev)
                        agg = metrics if agg is None else jax.tree.map(
                            jnp.add, agg, metrics)
                else:
                    # one dispatch per epoch: scan over the index batches
                    # (one per stride bucket under multi-scale)
                    idx_epoch = np.stack(
                        [b["idx"] for b in index_batches(train_loader)])
                    if multi_scale:
                        from yolov5_tpu.train.run import multiscale_epoch_plan

                        for sz, sel in multiscale_epoch_plan(
                                idx_epoch, ms_sizes, ms_rng):
                            state, m = epoch_steps[sz](
                                state, jnp.asarray(sel), cache_dev)
                            agg = m if agg is None else jax.tree.map(
                                jnp.add, agg, m)
                    else:
                        state, agg = epoch_step(state, jnp.asarray(idx_epoch),
                                                cache_dev)
            else:
                def host_prep_seg(b):
                    b = {k: b[k] for k in keys}
                    if multi_scale:
                        # reference segment/train.py:371: bilinear image
                        # resize per batch; GT masks follow with the nearest
                        # resample the reference loss applies to match proto
                        s_b = int(ms_rng.choice(ms_sizes))
                        if s_b != imgsz:
                            import cv2

                            b["images"] = np.stack([
                                cv2.resize(im, (s_b, s_b),
                                           interpolation=cv2.INTER_LINEAR)
                                for im in b["images"]])
                            mm = s_b // mask_ratio
                            mk = b["masks"]
                            yi = (np.arange(mm) * (mk.shape[-2] / mm)).astype(int)
                            xi = (np.arange(mm) * (mk.shape[-1] / mm)).astype(int)
                            b["masks"] = mk[..., yi[:, None], xi[None, :]]
                    return b

                for batch in prefetch_to_mesh(
                        iter(train_loader), mesh, depth=2,
                        transform=host_prep_seg,
                        put=getattr(step_fn, "put", None)):
                    state, metrics = step_fn(state, batch)
                    # device-side accumulation: no per-step host sync
                    agg = metrics if agg is None else jax.tree.map(jnp.add, agg, metrics)
            n = max(len(train_loader), 1)
            row = {f"train/{k}": float(v) / n for k, v in jax.device_get(agg).items()}
            ovf = row.pop("train/seg_overflow", 0.0) * n
            if ovf > 0:
                # no silent caps: candidates beyond seg_k lost mask supervision
                print(f"WARNING: {ovf:.0f} mask-loss candidates exceeded "
                      f"--seg-k {seg_k} this epoch and were dropped; raise "
                      f"seg_k to restore full mask supervision")
            row["train/imgs_per_sec"] = n * batch_size / (time.time() - t0)
            fi = 0.0
            if val_loader is not None:
                ema_vars = {"params": state.ema.params, "batch_stats": state.ema.batch_stats}
                results = evaluate_segment(model, ema_vars, val_loader, overlap=overlap)
                row.update({"val/box_map50": results["box"]["map50"],
                            "val/box_map": results["box"]["map"],
                            "val/mask_map50": results["mask"]["map50"],
                            "val/mask_map": results["mask"]["map"]})
                fi = results["fitness"]
            row["fitness"] = fi
            loggers.log_metrics(row, epoch)
            print(f"epoch {epoch + 1}/{epochs}  " +
                  "  ".join(f"{k.split('/')[-1]} {v:.4g}" for k, v in row.items()))
            improved = fi > best_fitness
            best_fitness = max(best_fitness, fi)
            if not nosave:
                # one tunnel download serves both files (strict > like the
                # fixed detect loop: ties must not rewrite best.ckpt)
                host_state = jax.device_get(state)
                # last.ckpt keeps the optimizer so --resume restores momentum
                save_checkpoint(save_dir / "last.ckpt", host_state, model,
                                epoch, best_fitness, include_opt=True)
                if improved and val_loader is not None:
                    save_checkpoint(save_dir / "best.ckpt", host_state, model,
                                    epoch, best_fitness)
                if save_period > 0 and epoch % save_period == 0:
                    save_checkpoint(save_dir / f"epoch{epoch}.ckpt",
                                    host_state, model, epoch, best_fitness)
            if stopper(epoch, fi):
                print(f"early stopping at epoch {epoch + 1} "
                      f"(no fitness gain in {patience} epochs)")
                break
    train_loader.close()
    if not noplots:
        from yolov5_tpu.utils.plots import plot_labels, plot_results

        plot_results(save_dir / "results.csv")
        plot_labels(train_ds.labels, model.names, save_dir)
    if (save_dir / "best.ckpt").exists():
        loggers.log_model(save_dir / "best.ckpt")
    loggers.close()
    return best_fitness, results, save_dir
