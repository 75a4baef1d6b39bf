#!/usr/bin/env python
"""Export CLI (the reference export.py equivalent).

Usage:
  python export.py --weights runs/train/exp/best.ckpt --include stablehlo tflite
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="")
    p.add_argument("--cfg", default="yolov5s")
    p.add_argument("--imgsz", "--img", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--include", nargs="+", default=["ckpt", "stablehlo"])
    p.add_argument("--nms", action="store_true", help="embed NMS in the graph")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--data", default=None,
                   help="dataset yaml for int8 calibration images")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--device", default="")
    opt = p.parse_args()
    if opt.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from yolov5_tpu.export import run

    arts = run(weights=opt.weights, cfg=opt.cfg, imgsz=opt.imgsz,
               batch_size=opt.batch_size, include=tuple(opt.include),
               with_nms=opt.nms, int8=opt.int8, output_dir=opt.output_dir,
               data=opt.data)
    print({k: str(v) for k, v in arts.items()})


if __name__ == "__main__":
    main()
