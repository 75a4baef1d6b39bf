#!/usr/bin/env python
"""Hyperparameter sweep CLI — the reference's Comet/ClearML HPO driver
analog (utils/loggers/comet/hpo.py, utils/loggers/clearml/hpo.py).

    python tools/hpo.py --data data.yaml --sweep sweep.json --epochs 10
    python tools/hpo.py ... --backend comet   # params from Comet Optimizer
    python tools/hpo.py ... --backend clearml # trials as ClearML Tasks

The sweep config uses the Comet Optimizer schema (see
yolov5_tpu/train/sweep_example.json); with --backend local (default) a
built-in random/grid sampler drives it, so sweeps run in zero-egress
environments too.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="dataset yaml")
    p.add_argument("--sweep", required=True,
                   help="sweep config (Comet optimizer_config.json schema)")
    p.add_argument("--cfg", default="yolov5n", help="model config")
    p.add_argument("--hyp", default=None, help="base hyp preset/yaml")
    p.add_argument("--epochs", type=int, default=10,
                   help="epochs per trial (a sweep 'epochs' param overrides)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--imgsz", type=int, default=320)
    p.add_argument("--project", default="runs/hpo")
    p.add_argument("--name", default="exp")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backend", choices=("local", "comet", "clearml"),
                   default="local")
    opt = p.parse_args()

    from yolov5_tpu.train.hpo import run_sweep

    best_params, best_obj = run_sweep(
        data=opt.data, sweep=opt.sweep, cfg=opt.cfg, hyp=opt.hyp,
        epochs=opt.epochs, batch_size=opt.batch_size, imgsz=opt.imgsz,
        save_dir=f"{opt.project}/{opt.name}", seed=opt.seed,
        backend=opt.backend,
    )
    print(f"best objective {best_obj:.4f} with {best_params}")


if __name__ == "__main__":
    main()
