#!/usr/bin/env python
"""Segmentation CLI: train / val / predict subcommands
(the reference's segment/{train,val,predict}.py)."""

import argparse


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--data", default="",
                   help="dataset yaml (optional with --resume: the saved "
                        "opt.yaml supplies it)")
    t.add_argument("--cfg", default="yolov5n-seg")
    t.add_argument("--hyp", default=None)
    t.add_argument("--epochs", type=int, default=100)
    t.add_argument("--batch-size", type=int, default=16)
    t.add_argument("--imgsz", "--img", type=int, default=640)
    t.add_argument("--optimizer", default="sgd")
    t.add_argument("--cos-lr", action="store_true")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--workers", type=int, default=8)
    t.add_argument("--single-cls", action="store_true")
    t.add_argument("--mask-ratio", type=int, default=4)
    t.add_argument("--seg-k", type=int, default=256,
                   help="per-level mask-loss candidate capacity; overflow is "
                        "counted and warned, raise if crowded images overflow")
    t.add_argument("--no-overlap", action="store_true")
    t.add_argument("--project", default="runs/train-seg")
    t.add_argument("--name", default="exp")
    t.add_argument("--exist-ok", action="store_true")
    t.add_argument("--noval", action="store_true")
    t.add_argument("--nosave", action="store_true")
    t.add_argument("--device-aug", action="store_true",
                   help="device-resident dataset + on-device mosaic/aug/mask raster")
    t.add_argument("--cache", default=None, choices=["ram", "disk", "device"])
    t.add_argument("--weights", default="", help="pretrained init: .ckpt or reference .pt")
    t.add_argument("--resume", nargs="?", const=True, default="",
                   help="resume most recent (or given) seg run; the run's "
                        "saved opt.yaml overrides other train flags")
    t.add_argument("--patience", type=int, default=100)
    t.add_argument("--freeze", type=int, default=0, help="freeze first N layers")
    t.add_argument("--label-smoothing", type=float, default=0.0)
    t.add_argument("--save-period", type=int, default=-1)
    t.add_argument("--noautoanchor", action="store_true")
    t.add_argument("--multi-scale", action="store_true",
                   help="per-batch 0.5-1.5x size over stride buckets "
                        "(reference segment/train.py:371)")
    t.add_argument("--noplots", action="store_true")
    t.add_argument("--sync-bn", action="store_true",
                   help="accepted for reference CLI parity (always on under GSPMD)")
    t.add_argument("--device", default="", help="'' = default backend, 'cpu' forces CPU")

    v = sub.add_parser("val")
    v.add_argument("--data", required=True)
    v.add_argument("--weights", required=True)
    v.add_argument("--imgsz", "--img", type=int, default=640)
    v.add_argument("--batch-size", type=int, default=16)
    v.add_argument("--mask-ratio", type=int, default=4)
    v.add_argument("--no-overlap", action="store_true")
    v.add_argument("--save-json", default=None,
                   help="write COCO segm rows (bbox + RLE masks) and score "
                        "them bbox+segm against the dataset GT")
    v.add_argument("--coco91", action="store_true",
                   help="remap class ids to the 91-id COCO annotation space")

    d = sub.add_parser("predict")
    d.add_argument("--weights", required=True)
    d.add_argument("--source", required=True)
    d.add_argument("--imgsz", "--img", type=int, default=640)
    d.add_argument("--conf-thres", type=float, default=0.25)
    d.add_argument("--iou-thres", type=float, default=0.45)
    d.add_argument("--project", default="runs/predict-seg")
    d.add_argument("--name", default="exp")

    opt = p.parse_args()
    if opt.cmd == "train":
        if not opt.data and not opt.resume:
            p.error("--data is required unless --resume is given")
        if opt.device == "cpu":
            import jax

            jax.config.update("jax_platforms", "cpu")
        from yolov5_tpu.parallel.distributed import init_distributed

        init_distributed()  # no-op unless WORLD_SIZE/RANK env set
        from yolov5_tpu.train.run_segment import run

        run(data=opt.data, cfg=opt.cfg, hyp=opt.hyp, epochs=opt.epochs,
            batch_size=opt.batch_size, imgsz=opt.imgsz, optimizer=opt.optimizer,
            cos_lr=opt.cos_lr, seed=opt.seed, workers=opt.workers,
            single_cls=opt.single_cls, mask_ratio=opt.mask_ratio,
            seg_k=opt.seg_k,
            no_overlap=opt.no_overlap, project=opt.project, name=opt.name,
            exist_ok=opt.exist_ok, noval=opt.noval, nosave=opt.nosave,
            device_aug=opt.device_aug, cache=opt.cache, weights=opt.weights,
            resume=opt.resume, patience=opt.patience, freeze=opt.freeze or None,
            label_smoothing=opt.label_smoothing, save_period=opt.save_period,
            noautoanchor=opt.noautoanchor, noplots=opt.noplots,
            sync_bn=opt.sync_bn, multi_scale=opt.multi_scale)
    elif opt.cmd == "val":
        from yolov5_tpu.data.dataset import create_loader
        from yolov5_tpu.train.run_segment import evaluate_segment
        from yolov5_tpu.models import SegmentationModel
        from yolov5_tpu.utils.checkpoint import load_checkpoint, variables_from_checkpoint
        from yolov5_tpu.utils.general import check_dataset

        data = check_dataset(opt.data)
        payload, meta = load_checkpoint(opt.weights)
        model = SegmentationModel(meta.get("cfg", "yolov5n-seg"),
                                  anchors=meta.get("anchors"))
        variables = variables_from_checkpoint(payload)
        _, loader = create_loader(data["val"], img_size=opt.imgsz,
                                  batch_size=opt.batch_size, augment=False,
                                  masks=True, mask_ratio=opt.mask_ratio,
                                  overlap=not opt.no_overlap)
        out = evaluate_segment(model, variables, loader,
                               overlap=not opt.no_overlap, verbose=True,
                               save_json=opt.save_json, coco91=opt.coco91)
        if opt.save_json:
            # score the written JSON with the COCO protocol, both modes
            # (reference segment/val.py:366-382 COCOeval bbox + segm)
            from yolov5_tpu.eval.coco import (
                gt_from_dataset, gt_from_dataset_segm, score_detections_json)

            gt_box = gt_from_dataset(loader.ds, coco91=opt.coco91)
            gt_seg = gt_from_dataset_segm(loader.ds, coco91=opt.coco91)
            sb = score_detections_json(opt.save_json, gt_box, iou_type="bbox")
            ss = score_detections_json(opt.save_json, gt_seg, iou_type="segm")
            print(f"COCO bbox: mAP {sb['map']:.4f} mAP50 {sb['map50']:.4f} | "
                  f"COCO segm: mAP {ss['map']:.4f} mAP50 {ss['map50']:.4f}")
    else:
        from yolov5_tpu.infer_segment import run as predict

        predict(weights=opt.weights, source=opt.source, imgsz=opt.imgsz,
                conf_thres=opt.conf_thres, iou_thres=opt.iou_thres,
                project=opt.project, name=opt.name)


if __name__ == "__main__":
    main()
