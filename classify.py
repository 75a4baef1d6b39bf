#!/usr/bin/env python
"""Classification CLI: train / val / predict subcommands
(the reference's classify/{train,val,predict}.py)."""

import argparse


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--data", required=True, help="ImageFolder root with train/[val]")
    t.add_argument("--model", "--cfg", dest="cfg", default="yolov5s")
    t.add_argument("--epochs", type=int, default=10)
    t.add_argument("--batch-size", type=int, default=64)
    t.add_argument("--imgsz", "--img", type=int, default=224)
    t.add_argument("--lr0", type=float, default=0.001)
    t.add_argument("--optimizer", default="adam")
    t.add_argument("--label-smoothing", type=float, default=0.1)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--project", default="runs/train-cls")
    t.add_argument("--name", default="exp")
    t.add_argument("--exist-ok", action="store_true")
    t.add_argument("--no-device-aug", action="store_true",
                   help="disable the HBM dataset cache + one-dispatch epochs")

    v = sub.add_parser("val")
    v.add_argument("--data", required=True,
                   help="ImageFolder root (val/ or test/ subdir, or itself)")
    v.add_argument("--weights", required=True)
    v.add_argument("--imgsz", "--img", type=int, default=None,
                   help="default: the checkpoint's training size")
    v.add_argument("--batch-size", type=int, default=64)

    d = sub.add_parser("predict")
    d.add_argument("--weights", required=True)
    d.add_argument("--source", required=True)
    d.add_argument("--imgsz", "--img", type=int, default=224)

    opt = p.parse_args()
    if opt.cmd == "train":
        from yolov5_tpu.parallel.distributed import init_distributed

        init_distributed()  # no-op unless WORLD_SIZE/RANK env set
        from yolov5_tpu.train.run_classify import run

        run(data=opt.data, cfg=opt.cfg, epochs=opt.epochs,
            device_aug=not opt.no_device_aug,
            batch_size=opt.batch_size, imgsz=opt.imgsz, lr0=opt.lr0,
            optimizer=opt.optimizer, label_smoothing=opt.label_smoothing,
            seed=opt.seed, project=opt.project, name=opt.name,
            exist_ok=opt.exist_ok)
    elif opt.cmd == "val":
        from yolov5_tpu.train.run_classify import validate_classify

        validate_classify(opt.weights, opt.data, imgsz=opt.imgsz,
                          batch_size=opt.batch_size, verbose=True)
    else:
        import numpy as np
        import jax.numpy as jnp

        from yolov5_tpu.data.sources import LoadImages
        from yolov5_tpu.models import ClassificationModel
        from yolov5_tpu.train.run_classify import normalize
        from yolov5_tpu.utils.checkpoint import load_checkpoint, variables_from_checkpoint

        payload, meta = load_checkpoint(opt.weights)
        names = {int(k): v for k, v in meta.get("names", {}).items()}
        model = ClassificationModel(meta.get("cfg", "yolov5s"), nc=meta.get("nc", len(names)))
        variables = variables_from_checkpoint(payload)
        for path, im, im0, _ in LoadImages(opt.source, img_size=opt.imgsz):
            logits = np.asarray(model.apply(variables, normalize(jnp.asarray(im[None]))))
            prob = np.exp(logits - logits.max()) / np.exp(logits - logits.max()).sum()
            top5 = np.argsort(-prob[0])[:5]
            print(path, " ".join(f"{names.get(int(i), i)} {prob[0, i]:.2f}" for i in top5))


if __name__ == "__main__":
    main()
