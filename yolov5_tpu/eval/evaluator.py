"""Validation loop: device forward + decode + NMS, host matching + AP.

Equivalent of /root/reference/val.py:112-393. The device side is one jitted
function per image-size; matching/AP stay in numpy for exactness (SURVEY §7).
Predictions and labels are compared in ORIGINAL image coordinates by default
(the reference's native-space protocol, val.py:282-310); letterbox-space
matching remains available via native_space=False and agrees to within
0.0004 mAP (the letterbox transform is a similarity).
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from yolov5_tpu.eval.metrics import ap_per_class, fitness, process_batch
from yolov5_tpu.ops.nms import detections_to_numpy, non_max_suppression

# COCO class-id remap: the 80 contiguous training ids -> the 91-id COCO
# annotation space (reference coco80_to_coco91_class via ultralytics)
COCO80_TO_COCO91 = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42,
    43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
    62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84,
    85, 86, 87, 88, 89, 90,
]


def _scale_to_native(boxes, lb_hw, native_hw):
    """letterbox-space xyxy -> native-space xyxy (numpy)."""
    gain = min(lb_hw[0] / native_hw[0], lb_hw[1] / native_hw[1])
    pad_x = (lb_hw[1] - native_hw[1] * gain) / 2
    pad_y = (lb_hw[0] - native_hw[0] * gain) / 2
    out = boxes.copy()
    out[:, [0, 2]] = ((boxes[:, [0, 2]] - pad_x) / gain).clip(0, native_hw[1])
    out[:, [1, 3]] = ((boxes[:, [1, 3]] - pad_y) / gain).clip(0, native_hw[0])
    return out


def evaluate(model, variables, loader, conf_thres=0.001, iou_thres=0.6,
             max_det=300, max_nms=30720, multi_label=True, verbose=False,
             compute_loss=None, save_json=None, coco91=False,
             native_space=True, tta_forward=None, save_txt_dir=None,
             save_conf=False, save_hybrid=False, names=None):
    """Returns a dict: mp, mr, map50, map, fitness, per-class ap, speeds.

    save_json: path to write COCO-format detections (xywh top-left, native
    image space; image_id from the filename stem like the reference
    save_one_json, val.py:65-108). coco91 remaps class ids to annotation ids.
    native_space (default True, matching the reference): match predictions
    against labels in ORIGINAL image coordinates (the reference's scale_boxes
    path, val.py:282-310). Pass False to match in letterbox space — the
    letterbox transform is a similarity so the two agree up to boundary
    clipping (measured delta 0.0004 mAP); the option exists to quantify that.
    """
    json_rows = []
    shapes = loader.ds.shapes if (save_json or native_space or save_txt_dir) \
        else None
    if save_txt_dir is not None:
        from pathlib import Path as _P

        save_txt_dir = _P(save_txt_dir)
        save_txt_dir.mkdir(parents=True, exist_ok=True)
    iouv = np.linspace(0.5, 0.95, 10)
    img_size = loader.ds.img_size

    # cache the jitted forward on the model so per-epoch validation during
    # training reuses the compiled executable
    forward = tta_forward or getattr(model, "_eval_forward", None)
    if forward is None:
        @jax.jit
        def forward(v, images):
            x = images.astype(model.dtype) / 255.0
            out = model.apply(v, x, train=False)
            maps = out[0] if isinstance(out, tuple) else out
            return model.decode(maps)

        model._eval_forward = forward

    stats = []
    losses = []
    # per-batch timings; the first batch pays the jit compile on TPU, so the
    # reported speeds (reference val.py prints steady-state ms/img) drop it
    # whenever there is more than one batch
    bt_fwd, bt_nms, bt_host = [], [], []
    bt_imgs = []
    n_images = 0
    # Host pre-pack (layers.fold_s2d) when the packed stem can consume the
    # batch in place: the in-graph space-to-depth fold of the input is the
    # largest single item in the forward HLO (pure layout copies) — same
    # trick as the train pipeline / serving Detector. Only for the standard
    # cached forward; a caller-supplied tta_forward expects canonical 4D.
    can_pack = tta_forward is None and hasattr(model, "wants_packed_input")
    for batch in loader:
        im_np = batch["images"]
        bh, bw = int(im_np.shape[1]), int(im_np.shape[2])
        if can_pack and model.wants_packed_input(bh, bw):
            from yolov5_tpu.models.layers import fold_s2d

            im_np = np.ascontiguousarray(fold_s2d(np.asarray(im_np)))
        images = jnp.asarray(im_np)
        t0 = time.perf_counter()
        preds = forward(variables, images)
        if save_hybrid:
            # inject GT boxes as unit-confidence candidates before NMS — the
            # reference's autolabelling path (val.py lb= -> general.py
            # non_max_suppression(labels=...))
            tgt = jnp.asarray(batch["targets"], jnp.float32)  # (bs, M, 5)
            vmask = jnp.asarray(batch["valid"])
            bh_, bw_ = bh, bw
            nc_ = preds.shape[-1] - 5
            lab_xywh = tgt[..., 1:5] * jnp.asarray([bw_, bh_, bw_, bh_],
                                                   jnp.float32)
            onehot = jax.nn.one_hot(tgt[..., 0].astype(jnp.int32), nc_)
            conf1 = vmask[..., None].astype(jnp.float32)
            lab_rows = jnp.concatenate([lab_xywh, conf1, onehot * conf1], -1)
            preds = jnp.concatenate([preds, lab_rows], axis=1)
        preds.block_until_ready()
        t1 = time.perf_counter()
        dets = non_max_suppression(
            preds, conf_thres=conf_thres, iou_thres=iou_thres,
            multi_label=multi_label, max_det=max_det, max_nms=max_nms,
        )
        dets = detections_to_numpy(dets)
        t2 = time.perf_counter()

        targets = batch["targets"]
        valid = batch["valid"]
        bs = int(batch.get("real", images.shape[0]))  # skip pad duplicates
        n_images += bs
        for b in range(bs):
            pred = dets[b]  # (n, 6) xyxy+conf+cls in letterbox px
            if native_space:
                # reference val.py:282-310: un-letterbox predictions, take
                # labels straight from the dataset in original coordinates
                idx = int(batch["indices"][b])
                nh, nw = (int(x) for x in loader.ds.shapes[idx])
                pred = pred.copy()
                pred[:, :4] = _scale_to_native(pred[:, :4], (bh, bw), (nh, nw))
                lab = loader.ds.labels[idx]
                if len(lab):
                    xyxy = np.empty((len(lab), 4), np.float32)
                    xyxy[:, 0] = (lab[:, 1] - lab[:, 3] / 2) * nw
                    xyxy[:, 1] = (lab[:, 2] - lab[:, 4] / 2) * nh
                    xyxy[:, 2] = (lab[:, 1] + lab[:, 3] / 2) * nw
                    xyxy[:, 3] = (lab[:, 2] + lab[:, 4] / 2) * nh
                    labels = np.concatenate([lab[:, 0:1].astype(np.float32), xyxy], 1)
                else:
                    labels = np.zeros((0, 5), np.float32)
            else:
                lab = targets[b][valid[b]]
                # labels: normalized xywh -> letterbox-space xyxy px
                if len(lab):
                    xyxy = np.empty((len(lab), 4), np.float32)
                    xyxy[:, 0] = (lab[:, 1] - lab[:, 3] / 2) * bw
                    xyxy[:, 1] = (lab[:, 2] - lab[:, 4] / 2) * bh
                    xyxy[:, 2] = (lab[:, 1] + lab[:, 3] / 2) * bw
                    xyxy[:, 3] = (lab[:, 2] + lab[:, 4] / 2) * bh
                    labels = np.concatenate([lab[:, 0:1], xyxy], axis=1)
                else:
                    labels = np.zeros((0, 5), np.float32)
            correct = process_batch(pred, labels, iouv)
            stats.append((correct, pred[:, 4], pred[:, 5], labels[:, 0]))
            if save_txt_dir is not None:
                from pathlib import Path as _P

                idx = int(batch["indices"][b])
                nh, nw = (int(x) for x in loader.ds.shapes[idx])
                nb_ = (pred[:, :4] if native_space
                       else _scale_to_native(pred[:, :4], (bh, bw), (nh, nw)))
                lines = []
                for (x1, y1, x2, y2), row in zip(nb_, pred):
                    rec = [int(row[5]), (x1 + x2) / 2 / nw, (y1 + y2) / 2 / nh,
                           (x2 - x1) / nw, (y2 - y1) / nh]
                    if save_conf:
                        rec.append(row[4])
                    lines.append(" ".join(f"{v:.6g}" for v in rec))
                (save_txt_dir / f"{_P(batch['paths'][b]).stem}.txt").write_text(
                    "\n".join(lines) + ("\n" if lines else ""))
            if save_json and len(pred):
                from pathlib import Path

                idx = int(batch["indices"][b])
                stem = Path(batch["paths"][b]).stem
                image_id = int(stem) if stem.isnumeric() else stem
                native = shapes[idx]
                nb_ = (pred[:, :4] if native_space  # already un-letterboxed
                       else _scale_to_native(pred[:, :4], (bh, bw), native))
                for (x1, y1, x2, y2), row in zip(nb_, pred):
                    cid = int(row[5])
                    if coco91 and cid < len(COCO80_TO_COCO91):
                        cid = COCO80_TO_COCO91[cid]
                    json_rows.append({
                        "image_id": image_id,
                        "category_id": cid,
                        "bbox": [round(float(x1), 3), round(float(y1), 3),
                                 round(float(x2 - x1), 3), round(float(y2 - y1), 3)],
                        "score": round(float(row[4]), 5),
                    })
        t3 = time.perf_counter()
        bt_fwd.append(t1 - t0)
        bt_nms.append(t2 - t1)
        bt_host.append(t3 - t2)
        bt_imgs.append(bs)

    tp = np.concatenate([s[0] for s in stats]) if stats else np.zeros((0, 10), bool)
    conf = np.concatenate([s[1] for s in stats]) if stats else np.zeros(0)
    pred_cls = np.concatenate([s[2] for s in stats]) if stats else np.zeros(0)
    target_cls = np.concatenate([s[3] for s in stats]) if stats else np.zeros(0)

    if tp.shape[0] and target_cls.shape[0]:
        res = ap_per_class(tp, conf, pred_cls, target_cls)
        ap50 = res["ap"][:, 0]
        ap = res["ap"].mean(1)
        mp, mr = res["p"].mean(), res["r"].mean()
        map50, mean_ap = ap50.mean(), ap.mean()
        per_class = {int(c): (float(a50), float(a)) for c, a50, a in
                     zip(res["classes"], ap50, ap)}
    else:
        mp = mr = map50 = mean_ap = 0.0
        per_class = {}

    skip = 1 if len(bt_imgs) > 1 else 0  # drop the compile-paying first batch
    n_timed = max(sum(bt_imgs[skip:]), 1)
    ms = lambda ts: 1000 * sum(ts[skip:]) / n_timed
    out = {
        "mp": float(mp), "mr": float(mr), "map50": float(map50),
        "map": float(mean_ap),
        "fitness": fitness([mp, mr, map50, mean_ap]),
        "per_class": per_class,
        "speed_ms": {"forward": ms(bt_fwd), "nms": ms(bt_nms), "host": ms(bt_host)},
        "images": n_images,
    }
    if save_json:
        import json
        from pathlib import Path

        Path(save_json).parent.mkdir(parents=True, exist_ok=True)
        Path(save_json).write_text(json.dumps(json_rows))
        out["json"] = str(save_json)
        # score with the COCO protocol (in-house COCOEvalLite; pycocotools
        # is not in this image) — cross-validates the ap_per_class numbers
        # (reference val.py:368-383)
        try:
            from yolov5_tpu.eval.coco import gt_from_dataset, score_detections_json

            gt = gt_from_dataset(loader.ds, coco91=coco91)
            out["coco"] = score_detections_json(json_rows, gt)
            if verbose:
                c = out["coco"]
                print(f"COCO eval: mAP {c['map']:.4f}  mAP50 {c['map50']:.4f} "
                      f"mAP75 {c['map75']:.4f} (in-house mAP {mean_ap:.4f})")
        except Exception as e:  # scoring must never kill a val run
            print(f"COCO scoring failed: {e}")
    if verbose:
        print(
            f"val: {n_images} imgs  P {mp:.3f}  R {mr:.3f}  mAP50 {map50:.3f} "
            f"mAP50-95 {mean_ap:.3f}  ({out['speed_ms']})"
        )
        if names and per_class and len(per_class) > 1:
            # per-class AP table (reference val.py:252-259 verbose block)
            for c, (a50, a) in sorted(per_class.items()):
                n_t = int((target_cls == c).sum())
                print(f"  {str(names.get(c, c)):>20s} {n_t:6d}  "
                      f"mAP50 {a50:.3f}  mAP50-95 {a:.3f}")
    return out


def run(data, weights="", cfg="yolov5s", imgsz=640, batch_size=32,
        conf_thres=0.001, iou_thres=0.6, max_det=300, single_cls=False,
        workers=8, half=False, verbose=True, task="val", save_json=None,
        coco91=None, rect=True, native_space=True, augment=False,
        save_txt=False, save_conf=False, save_hybrid=False,
        project="runs/val", name="exp", exist_ok=False, dnn=False):
    """Standalone validation entry (reference val.py:112-440).

    Defaults match the reference protocol: rect batching (pad 0.5,
    val.py:196) and native-space matching (val.py:240). Pass rect=False /
    native_space=False for square-letterbox / letterbox-space variants
    (measured delta vs native: ~0.0004 mAP on the shapes sets)."""
    import jax.numpy as jnp

    from yolov5_tpu.data.dataset import create_loader
    from yolov5_tpu.infer import Detector
    from yolov5_tpu.utils.general import check_dataset, check_img_size

    data_dict = check_dataset(data)
    det = Detector(weights, cfg=cfg, imgsz=imgsz, half=half, fuse=True, dnn=dnn)
    # exported backends (.onnx/.tflite/_saved_model) carry no model object —
    # they run through det._forward with a fixed input size (reference
    # DetectMultiBackend val, val.py:152-170)
    if det.model is not None:
        stride = max(det.model.stride)
    else:
        stride = 32
        # a fixed-shape exported graph only accepts its export-time size;
        # override a mismatched --imgsz like the reference DetectMultiBackend
        # does (models/common.py metadata imgsz)
        export_sz = getattr(det, "imgsz", None)
        if export_sz:
            export_sz = export_sz[0] if isinstance(export_sz, (tuple, list)) \
                else export_sz
            if export_sz and imgsz != export_sz:
                print(f"WARNING: --imgsz {imgsz} does not match the export "
                      f"size {export_sz} of {weights}; using {export_sz}")
                imgsz = int(export_sz)
    imgsz = check_img_size(imgsz, s=stride)
    split = data_dict.get(task) or data_dict.get("val") or data_dict["train"]
    _, loader = create_loader(split, img_size=imgsz, batch_size=batch_size,
                              augment=False, shuffle=False, workers=workers,
                              single_cls=single_cls,
                              rect=rect and det.model is not None,
                              stride=stride)
    if coco91 is None:  # auto: coco remap when the dataset looks like COCO
        coco91 = "coco" in str(data_dict.get("yaml_file", "")).lower()
    save_txt_dir = None
    if save_txt:
        from yolov5_tpu.utils.general import increment_path

        save_dir = increment_path(Path(project) / name, exist_ok=exist_ok,
                                  mkdir=True)
        save_txt_dir = save_dir / "labels"
    fwd = det._forward_tta if augment else None
    if det.model is None:
        if augment:
            print("WARNING: --augment (TTA) is unsupported for exported "
                  "backends, ignoring")
        fwd = det._forward  # exported backend: the graph already decodes
    results = evaluate(det.model, det.variables, loader, conf_thres=conf_thres,
                       iou_thres=iou_thres, max_det=max_det, verbose=verbose,
                       save_json=save_json, coco91=coco91,
                       native_space=native_space,
                       tta_forward=fwd,
                       save_txt_dir=save_txt_dir, save_conf=save_conf,
                       save_hybrid=save_hybrid,
                       names=det.names if verbose else None)
    if save_txt_dir is not None:
        results["save_dir"] = str(save_txt_dir.parent)
    return results


def run_speed(data, weights="", batch_size=1, conf_thres=0.25, iou_thres=0.45,
              **kwargs):
    """``--task speed`` (reference val.py:450): the published speed-table
    protocol — batch 1, conf 0.25, iou 0.45, no JSON scoring. Prints the
    steady-state ms/img split (forward / NMS / host postprocess; the
    compile-paying first batch is dropped by `evaluate`) and returns the
    results dict."""
    kwargs.pop("save_json", None)
    res = run(data, weights=weights, batch_size=batch_size,
              conf_thres=conf_thres, iou_thres=iou_thres, save_json=None,
              **kwargs)
    s = res["speed_ms"]
    total = s["forward"] + s["nms"] + s["host"]
    print(f"speed: {s['forward']:.1f} ms forward, {s['nms']:.1f} ms NMS, "
          f"{s['host']:.1f} ms host per image at batch {batch_size} "
          f"({total:.1f} ms total)")
    res["speed_total_ms"] = total
    return res


def run_study(data, weights="", imgsz_range=(256, 1536, 128), project="runs/val",
              name="study", exist_ok=True, **kwargs):
    """``--task study`` (reference val.py:474-528): mAP-vs-latency sweep over
    image sizes 256..1536 step 128. Writes ``study_{data}_{weights}.txt``
    (one row per size: imgsz, P, R, mAP50, mAP50-95, fwd/nms/host ms) next to
    a ``study.png`` speed-accuracy curve, mirroring the reference's
    ``plot_val_study``. Returns the list of per-size result dicts."""
    from yolov5_tpu.utils.general import increment_path

    lo, hi, step = imgsz_range
    sizes = list(range(lo, hi + step, step))
    save_dir = increment_path(Path(project) / name, exist_ok=exist_ok,
                              mkdir=True)
    stem_d = Path(str(data)).stem
    cfgv = kwargs.get("cfg", "")
    stem_w = (Path(str(weights)).stem if weights
              else (cfgv if isinstance(cfgv, str) else "cfg"))
    out_txt = save_dir / f"study_{stem_d}_{stem_w}.txt"
    rows, results = [], []
    kwargs.pop("save_json", None)
    for s in sizes:
        res = run(data, weights=weights, imgsz=s, save_json=None, **kwargs)
        sp = res["speed_ms"]
        rows.append([s, res["mp"], res["mr"], res["map50"], res["map"],
                     sp["forward"], sp["nms"], sp["host"]])
        results.append(dict(res, imgsz=s))
        print(f"study @{s}: mAP50-95 {res['map']:.4f}  "
              f"{sp['forward'] + sp['nms']:.1f} ms/img device")
    np.savetxt(out_txt, np.array(rows), fmt="%10.4g",
               header="imgsz P R mAP50 mAP50-95 fwd_ms nms_ms host_ms")
    try:
        from yolov5_tpu.utils.plots import plot_study

        plot_study([out_txt], save_dir / "study.png")
    except Exception as e:  # plotting must never kill the sweep
        print(f"study plot failed: {e}")
    print(f"study saved to {out_txt}")
    return results
