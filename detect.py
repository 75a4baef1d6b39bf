#!/usr/bin/env python
"""Inference CLI (the reference detect.py equivalent).

Usage:
  python detect.py --weights runs/train/exp/best.ckpt --source path/to/images
"""

import argparse


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="")
    p.add_argument("--cfg", default="yolov5s", help="model config when weights lack meta")
    p.add_argument("--source", required=True, help="file/dir/glob/video")
    p.add_argument("--imgsz", "--img", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=1000)
    p.add_argument("--classes", nargs="+", type=int, default=None)
    p.add_argument("--agnostic-nms", action="store_true")
    p.add_argument("--save-txt", action="store_true")
    p.add_argument("--save-conf", action="store_true")
    p.add_argument("--save-crop", action="store_true", help="save cropped detection boxes")
    p.add_argument("--save-csv", action="store_true", help="save predictions.csv")
    p.add_argument("--augment", action="store_true", help="TTA inference")
    p.add_argument("--data", default=None, help="dataset yaml for class names")
    p.add_argument("--hide-labels", action="store_true")
    p.add_argument("--hide-conf", action="store_true")
    p.add_argument("--vid-stride", type=int, default=1, help="video frame-rate stride")
    p.add_argument("--view-img", action="store_true", help="show results (needs a display)")
    p.add_argument("--update", action="store_true", help="strip optimizer state from --weights")
    p.add_argument("--nosave", action="store_true")
    p.add_argument("--project", default="runs/detect")
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--line-thickness", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--half", action="store_true")
    p.add_argument("--dnn", action="store_true",
                   help="run .onnx weights via OpenCV DNN instead of the mini-runtime")
    p.add_argument("--device", default="")
    return p.parse_args()


def main():
    opt = parse_opt()
    if opt.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from yolov5_tpu.infer import run

    run(
        weights=opt.weights, source=opt.source, cfg=opt.cfg, imgsz=opt.imgsz,
        conf_thres=opt.conf_thres, iou_thres=opt.iou_thres, max_det=opt.max_det,
        classes=opt.classes, agnostic_nms=opt.agnostic_nms,
        save_txt=opt.save_txt, save_conf=opt.save_conf, save_img=not opt.nosave,
        project=opt.project, name=opt.name, exist_ok=opt.exist_ok,
        line_thickness=opt.line_thickness, batch_size=opt.batch_size,
        half=opt.half, augment=opt.augment, data=opt.data,
        hide_labels=opt.hide_labels, hide_conf=opt.hide_conf,
        save_crop=opt.save_crop, save_csv=opt.save_csv,
        vid_stride=opt.vid_stride, view_img=opt.view_img, dnn=opt.dnn,
    )
    if opt.update:
        from yolov5_tpu.utils.checkpoint import strip_optimizer

        strip_optimizer(opt.weights)


if __name__ == "__main__":
    main()
