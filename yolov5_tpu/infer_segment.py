"""Segmentation inference: forward -> NMS (with mask coeffs) -> process_mask
-> render overlays / polygon txt (reference segment/predict.py:71-248)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from yolov5_tpu.data.sources import LoadImages
from yolov5_tpu.infer import annotate, color_for, scale_boxes_np
from yolov5_tpu.models import SegmentationModel
from yolov5_tpu.ops.masks import masks2segments, process_mask, scale_image
from yolov5_tpu.ops.nms import detections_to_numpy, non_max_suppression
from yolov5_tpu.utils.general import increment_path


def run(weights="", source="", cfg="yolov5n-seg", imgsz=640, conf_thres=0.25,
        iou_thres=0.45, max_det=300, save_img=True, save_txt=False,
        project="runs/predict-seg", name="exp", exist_ok=False, verbose=True):
    import cv2

    save_dir = increment_path(Path(project) / name, exist_ok=exist_ok, mkdir=True)
    (save_dir / "labels").mkdir(exist_ok=True)

    if str(weights).endswith(".ckpt"):
        from yolov5_tpu.utils.checkpoint import load_checkpoint, variables_from_checkpoint

        payload, meta = load_checkpoint(weights)
        model = SegmentationModel(meta.get("cfg", cfg), anchors=meta.get("anchors"))
        variables = variables_from_checkpoint(payload)
        names = {int(k): v for k, v in meta.get("names", {}).items()} or model.names
    else:
        model = SegmentationModel(cfg)
        variables = model.variables
        names = model.names

    @jax.jit
    def forward(v, images):
        x = images.astype(model.dtype) / 255.0
        maps, proto = model.apply(v, x, train=False)
        return model.decode(maps), proto

    # host pre-pack (layers.fold_s2d): the packed stem consumes the folded
    # form in place, skipping the in-graph s2d fold (pure layout copies) —
    # same as infer.Detector / eval / train
    wants_packed = (hasattr(model, "wants_packed_input")
                    and model.wants_packed_input(imgsz, imgsz))

    results = []
    for path, im, im0, meta_s in LoadImages(source, img_size=imgsz):
        im_in = im[None]
        if wants_packed:
            from yolov5_tpu.models.layers import fold_s2d

            im_in = np.ascontiguousarray(fold_s2d(im_in))
        preds, proto = forward(variables, jnp.asarray(im_in))
        dets = non_max_suppression(preds, conf_thres=conf_thres,
                                   iou_thres=iou_thres, max_det=max_det,
                                   nc=model.nc)
        r = detections_to_numpy(dets)[0]
        masks = None
        if len(r):
            coeffs = jnp.asarray(r[:, 6:], jnp.float32)
            boxes_lb = jnp.asarray(r[:, :4], jnp.float32)
            masks = np.asarray(
                process_mask(proto[0], coeffs, boxes_lb, (imgsz, imgsz), upsample=True)
            ) > 0.5
        results.append((path, r, masks))
        if verbose:
            print(f"{path}: {len(r)} instances")
        if save_img:
            im_out = im0.copy()
            if masks is not None and len(masks):
                # un-letterbox mask stack to native size, overlay colors
                m = scale_image(np.transpose(masks.astype(np.float32), (1, 2, 0)),
                                im0.shape[:2])
                m = m.reshape(im0.shape[0], im0.shape[1], -1)
                overlay = im_out.astype(np.float32)
                for i in range(m.shape[-1]):
                    color = np.array(color_for(r[i, 5]), np.float32)
                    mi = m[..., i] > 0.5
                    overlay[mi] = overlay[mi] * 0.5 + color * 0.5
                im_out = overlay.astype(np.uint8)
            boxes_native = (scale_boxes_np(im.shape[:2], r[:, :4].copy(), im0.shape[:2])
                            if len(r) else np.zeros((0, 4)))
            annotate(im_out, boxes_native, r[:, 4], r[:, 5], names)
            cv2.imwrite(str(save_dir / Path(path).name), im_out)
        if save_txt and masks is not None:
            segs = masks2segments(masks)
            lines = []
            h0, w0 = im0.shape[:2]
            gain = min(im.shape[0] / h0, im.shape[1] / w0)
            pad_x = (im.shape[1] - w0 * gain) / 2
            pad_y = (im.shape[0] - h0 * gain) / 2
            for (cls, seg) in zip(r[:, 5].astype(int), segs):
                if not len(seg):
                    continue
                xs = ((seg[:, 0] - pad_x) / gain).clip(0, w0)
                ys = ((seg[:, 1] - pad_y) / gain).clip(0, h0)
                flat = " ".join(f"{x / w0:.6g} {y / h0:.6g}" for x, y in zip(xs, ys))
                lines.append(f"{cls} {flat}")
            (save_dir / "labels" / f"{Path(path).stem}.txt").write_text(
                "\n".join(lines) + "\n")
    if verbose:
        print(f"results saved to {save_dir}")
    return results, save_dir
