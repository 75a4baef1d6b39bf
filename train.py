#!/usr/bin/env python
"""Detection training CLI (the reference train.py equivalent).

Usage:
  python train.py --data shapes.yaml --cfg yolov5n --epochs 3 --batch-size 16
"""

import argparse


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="", help="initial weights (.ckpt or torch .pt)")
    p.add_argument("--cfg", default="yolov5n", help="model config name/path")
    p.add_argument("--data", default="",
                   help="dataset yaml (optional with --resume: the saved "
                        "opt.yaml supplies it)")
    p.add_argument("--hyp", default=None, help="hyp preset name or yaml")
    p.add_argument("--label-smoothing", type=float, default=0.0, help="cls BCE eps")
    p.add_argument("--noplots", action="store_true", help="skip end-of-train plots")
    p.add_argument("--rect", action="store_true", help="rectangular training (no mosaic/shuffle)")
    p.add_argument("--sync-bn", action="store_true",
                   help="no-op: global-batch BN stats are always on under GSPMD")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--imgsz", "--img", type=int, default=640)
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adam", "adamw"])
    p.add_argument("--cos-lr", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--single-cls", action="store_true")
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--project", default="runs/train")
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--nosave", action="store_true")
    p.add_argument("--noval", action="store_true")
    p.add_argument("--save-period", type=int, default=-1)
    p.add_argument("--resume", nargs="?", const=True, default="",
                   help="resume most recent (or given) run; the run's saved "
                        "opt.yaml overrides other train flags. Also accepts "
                        "comet://workspace/project/exp and wandb-artifact:// "
                        "URIs (cloud checkpoint resume)")
    p.add_argument("--upload-dataset", action="store_true",
                   help="log the dataset as a versioned artifact to enabled "
                        "cloud sinks (reference --upload-dataset)")
    p.add_argument("--max-labels", type=int, default=None,
                   help="fixed label capacity per image (default: auto from dataset)")
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"],
                   help="compute dtype; bf16 activations with f32 params/stats/loss is the TPU analog of the reference's AMP-on default (train.py:344)")
    p.add_argument("--evolve", type=int, nargs="?", const=30, default=0,
                   help="evolve hyperparameters for N generations")
    p.add_argument("--freeze", type=int, default=0, help="freeze first N layers")
    p.add_argument("--multi-scale", action="store_true")
    p.add_argument("--image-weights", action="store_true")
    p.add_argument("--cache", default=None,
                   choices=[None, "ram", "disk", "device", "none"],
                   help="image cache: auto (default), ram, disk (decoded .npy),"
                        " device (HBM-resident dataset, requires --device-aug),"
                        " or none")
    p.add_argument("--noautoanchor", action="store_true")
    p.add_argument("--quad", action="store_true",
                   help="quad batches: every 4 samples -> one 2x-size image "
                        "(reference collate_fn4)")
    p.add_argument("--device-aug", action="store_true",
                   help="run HSV/perspective/flip augmentation on-device in the jitted step")
    p.add_argument("--device", default="", help="'' = default backend, 'cpu' forces CPU")
    return p.parse_args()


def main():
    opt = parse_opt()
    if not opt.data and not opt.resume:
        import sys
        sys.exit("error: --data is required unless --resume is given")
    if opt.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    # multi-host: no-op unless WORLD_SIZE/RANK env set (torchrun contract,
    # reference train.py:99-101); must run before any device computation
    from yolov5_tpu.parallel.distributed import init_distributed

    init_distributed()
    if opt.evolve:
        from yolov5_tpu.train.evolve import run_evolve

        run_evolve(data=opt.data, cfg=opt.cfg, hyp=opt.hyp,
                   generations=opt.evolve, epochs=opt.epochs,
                   batch_size=opt.batch_size, imgsz=opt.imgsz,
                   save_dir=f"{opt.project.replace('train', 'evolve')}/{opt.name}",
                   seed=opt.seed)
        return

    from yolov5_tpu.train.run import run

    run(
        data=opt.data, cfg=opt.cfg, hyp=opt.hyp, weights=opt.weights,
        label_smoothing=opt.label_smoothing, noplots=opt.noplots,
        rect=opt.rect, sync_bn=opt.sync_bn,
        epochs=opt.epochs, batch_size=opt.batch_size, imgsz=opt.imgsz,
        optimizer=opt.optimizer, cos_lr=opt.cos_lr, seed=opt.seed,
        workers=opt.workers, single_cls=opt.single_cls, patience=opt.patience,
        project=opt.project, name=opt.name, exist_ok=opt.exist_ok,
        nosave=opt.nosave, noval=opt.noval, save_period=opt.save_period,
        resume=opt.resume, max_labels=opt.max_labels, dtype=opt.dtype,
        freeze=opt.freeze or None, multi_scale=opt.multi_scale,
        image_weights=opt.image_weights,
        cache=False if opt.cache == "none" else opt.cache,
        noautoanchor=opt.noautoanchor, device_aug=opt.device_aug,
        quad=opt.quad, upload_dataset=opt.upload_dataset,
    )


if __name__ == "__main__":
    main()
