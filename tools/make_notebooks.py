#!/usr/bin/env python
"""Generate the three quickstart notebooks (the reference ships
tutorial.ipynb, segment/tutorial.ipynb, classify/tutorial.ipynb; here they
are built from source so they stay in sync with the APIs).

  python tools/make_notebooks.py            # writes ./tutorial*.ipynb
  python tools/make_notebooks.py --execute  # also runs them top-to-bottom
                                            # (CPU; ~2-5 min each)
"""

import argparse
from pathlib import Path

import nbformat as nbf

REPO = Path(__file__).resolve().parent.parent

BACKEND_CELL = """\
# Backend select: default = whatever accelerator JAX finds (TPU if present).
# Set YOLOV5_TPU_NB_BACKEND=cpu to force CPU (laptops / CI executors).
import os

if os.environ.get("YOLOV5_TPU_NB_BACKEND"):
    import jax

    jax.config.update("jax_platforms", os.environ["YOLOV5_TPU_NB_BACKEND"])

import jax

print("devices:", jax.devices())"""


def nb(cells):
    out = nbf.v4.new_notebook()
    out.cells = [
        nbf.v4.new_markdown_cell(src) if kind == "md"
        else nbf.v4.new_code_cell(src)
        for kind, src in cells
    ]
    out.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3"}
    return out


def detect_nb():
    return nb([
        ("md", "# yolov5_tpu quickstart — detection\n\n"
               "Train → validate → predict → export on one chip, against a "
               "generated dataset (zero downloads). The TPU-native "
               "walkthrough of the reference `tutorial.ipynb`. First "
               "compilation of each (model, size, batch) takes 20 s–a few "
               "minutes; programs are cached under "
               "`~/.cache/yolov5_tpu/xla_cache`."),
        ("code", BACKEND_CELL),
        ("md", "## 1. A dataset\n\nDatasets use the reference YAML schema "
               "(`path`/`train`/`val`/`names`) with YOLO txt labels. For a "
               "self-contained run, generate the synthetic shapes set:"),
        ("code", """\
from pathlib import Path

import yaml

from yolov5_tpu.data.synthetic import generate_shapes_dataset

root = Path(".scratch/nb_shapes")
cfg = generate_shapes_dataset(root, n_images=48, img_size=224, seed=0,
                              splits=(("train", 1.0), ("val", 0.4)))
cfg["nc"] = 3
data_yaml = root / "data.yaml"
data_yaml.write_text(yaml.safe_dump(cfg))
print(yaml.safe_dump(cfg))"""),
        ("md", "## 2. Train\n\nThe CLI twin is `python train.py --data ... "
               "--cfg yolov5n --device-aug --cos-lr`. On a TPU, add "
               "`device_aug=True` to run mosaic/HSV/flips inside the jitted "
               "step and cache the dataset in HBM (`docs/tutorial.md` §3)."),
        ("code", """\
from yolov5_tpu.train.run import run

best, results, save_dir = run(
    data=str(data_yaml), cfg="yolov5n", epochs=30, batch_size=8, imgsz=160,
    workers=2, cos_lr=True, project="runs/nb", name="detect", exist_ok=True,
    noautoanchor=True, noplots=True, device_count=1,
    hyp={"lr0": 0.02, "momentum": 0.9, "weight_decay": 0.0,
         "warmup_epochs": 1.0, "box": 0.05, "cls": 0.3, "obj": 0.7,
         "anchor_t": 4.0, "fl_gamma": 0.0, "mosaic": 0.0, "scale": 0.0,
         "translate": 0.0, "fliplr": 0.5, "hsv_h": 0.0, "hsv_s": 0.0,
         "hsv_v": 0.0},
)
print(f"best fitness {best:.3f}  mAP50 {results['map50']:.3f}")"""),
        ("md", "## 3. Validate\n\nSame protocol as the reference `val.py`: "
               "rect batches, native-space matching, 101-pt AP. "
               "(`--task speed` / `--task study` run the benchmark "
               "protocols.)"),
        ("code", """\
from yolov5_tpu.eval.evaluator import run as val_run

res = val_run(data=str(data_yaml), weights=str(save_dir / "best.ckpt"),
              imgsz=160, batch_size=8, workers=2)
{k: round(v, 4) for k, v in res.items() if isinstance(v, float)}"""),
        ("md", "## 4. Predict\n\n`yolov5_tpu.hub` + `results.predict` are "
               "the AutoShape/Detections analog: paths, arrays or PIL in — "
               "rendered boxes, pandas records, crops out."),
        ("code", """\
import matplotlib.pyplot as plt

import yolov5_tpu.hub as hub
from yolov5_tpu.results import predict

det = hub.load(str(save_dir / "best.ckpt"))
val_images = sorted((root / "images" / "val").glob("*.jpg"))[:4]
r = predict(det, [str(p) for p in val_images], conf_thres=0.25)
r.print()
fig, axes = plt.subplots(1, len(val_images), figsize=(4 * len(val_images), 4))
for ax, im in zip(axes, r.render()):
    ax.imshow(im)
    ax.axis("off")"""),
        ("md", "## 5. Export\n\n12-format surface (`export.py --include "
               "...`); `ckpt` is the fused deploy artifact, `stablehlo` the "
               "portable compiler IR. SavedModel/TFLite/ONNX need their "
               "runtimes installed."),
        ("code", """\
from yolov5_tpu.export import run as export_run

arts = export_run(weights=str(save_dir / "best.ckpt"), imgsz=160,
                  include=("ckpt", "stablehlo"),
                  output_dir=str(save_dir / "export"))
{k: str(v) for k, v in arts.items()}"""),
        ("md", "Next: `docs/tutorial.md` (full CLI surface), "
               "`docs/multi_chip.md` (pod-slice training), "
               "`docs/tpu_performance.md` (how the speed happens)."),
    ])


def segment_nb():
    return nb([
        ("md", "# yolov5_tpu quickstart — instance segmentation\n\n"
               "The reference `segment/tutorial.ipynb` analog: train a "
               "yolov5n-seg, check box+mask mAP, predict with mask "
               "rendering."),
        ("code", BACKEND_CELL),
        ("code", """\
from pathlib import Path

import yaml

from yolov5_tpu.data.synthetic import generate_shapes_dataset

root = Path(".scratch/nb_shapes_seg")
cfg = generate_shapes_dataset(root, n_images=48, img_size=224, seed=0,
                              segments=True,
                              splits=(("train", 1.0), ("val", 0.4)))
cfg["nc"] = 3
data_yaml = root / "data.yaml"
data_yaml.write_text(yaml.safe_dump(cfg))"""),
        ("md", "## Train\n\nCLI twin: `python segment.py train --data ... "
               "--cfg yolov5n-seg`. On TPU, `device_aug=True` rasterizes GT "
               "masks on device from polygon vertices (`ops/rasterize.py`)."),
        ("code", """\
from yolov5_tpu.train.run_segment import run as seg_run

best, results, save_dir = seg_run(
    data=str(data_yaml), cfg="yolov5n-seg", epochs=30, batch_size=8,
    imgsz=160, workers=2, cos_lr=True, project="runs/nb", name="segment",
    exist_ok=True, noautoanchor=True, noplots=True,
    hyp={"lr0": 0.02, "momentum": 0.9, "weight_decay": 0.0,
         "warmup_epochs": 1.0, "box": 0.05, "cls": 0.3, "obj": 0.7,
         "anchor_t": 4.0, "fl_gamma": 0.0, "mosaic": 0.0, "scale": 0.0,
         "translate": 0.0, "fliplr": 0.5, "hsv_h": 0.0, "hsv_s": 0.0,
         "hsv_v": 0.0},
)
{k: round(float(v), 4) for k, v in results.items()
 if isinstance(v, (int, float))}"""),
        ("md", "## Predict\n\nMasks render over the boxes; `--save-txt` "
               "writes polygonized masks (reference `masks2segments`)."),
        ("code", """\
import matplotlib.pyplot as plt

from yolov5_tpu.infer_segment import run as seg_predict

out_dir = seg_predict(weights=str(save_dir / "best.ckpt"),
                      source=str(root / "images" / "val"), imgsz=160,
                      conf_thres=0.25, project="runs/nb", name="segment-pred",
                      exist_ok=True)
outs = sorted(Path(out_dir).glob("*.jpg"))[:4]
fig, axes = plt.subplots(1, len(outs), figsize=(4 * len(outs), 4))
for ax, p in zip(axes, outs):
    ax.imshow(plt.imread(p))
    ax.set_title(p.name, fontsize=8)
    ax.axis("off")"""),
    ])


def classify_nb():
    return nb([
        ("md", "# yolov5_tpu quickstart — classification\n\n"
               "The reference `classify/tutorial.ipynb` analog: train a "
               "classifier on an ImageFolder tree, validate top-1/top-5, "
               "predict."),
        ("code", BACKEND_CELL),
        ("code", """\
from pathlib import Path

from yolov5_tpu.data.synthetic import generate_classify_dataset

root = Path(".scratch/nb_shapes_cls")
generate_classify_dataset(root, n_per_class=24, img_size=96, seed=0)
sorted(p.name for p in (root / "train").iterdir())"""),
        ("md", "## Train\n\nCLI twin: `python classify.py train --data ... "
               "--model yolov5n`. The classifier is the detection backbone "
               "sliced at cutoff 10 + a Classify head (reference "
               "ClassificationModel)."),
        ("code", """\
from yolov5_tpu.train.run_classify import run as cls_run

top1, save_dir = cls_run(data=str(root), cfg="yolov5n", epochs=10,
                         batch_size=16, imgsz=96, project="runs/nb",
                         name="classify", exist_ok=True)
print(f"best top-1 {top1:.3f}")"""),
        ("md", "## Validate standalone\n\n(`python classify.py val`)"),
        ("code", """\
from yolov5_tpu.train.run_classify import validate_classify

metrics = validate_classify(str(Path(save_dir) / "best.ckpt"), str(root),
                            imgsz=96, batch_size=16)
metrics"""),
        ("md", "## Predict top-5"),
        ("code", """\
import numpy as np

import jax.numpy as jnp

from yolov5_tpu.data.sources import LoadImages
from yolov5_tpu.models import ClassificationModel
from yolov5_tpu.train.run_classify import normalize
from yolov5_tpu.utils.checkpoint import load_checkpoint, variables_from_checkpoint

payload, meta = load_checkpoint(str(Path(save_dir) / "best.ckpt"))
names = {int(k): v for k, v in meta.get("names", {}).items()}
model = ClassificationModel(meta.get("cfg", "yolov5n"), nc=len(names))
variables = variables_from_checkpoint(payload)
some_val = sorted((root / "val").rglob("*.jpg"))[:5]
for path, im, im0, _ in LoadImages([str(p) for p in some_val], img_size=96):
    logits = np.asarray(model.apply(variables, normalize(jnp.asarray(im[None]))))
    prob = np.exp(logits - logits.max())
    prob /= prob.sum()
    top = np.argsort(-prob[0])[:3]
    print(Path(path).parent.name, "->",
          " ".join(f"{names.get(int(i), i)}:{prob[0, i]:.2f}" for i in top))"""),
    ])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--execute", action="store_true",
                   help="run each notebook top-to-bottom after writing it")
    p.add_argument("--timeout", type=int, default=1800)
    opt = p.parse_args()

    books = {
        "tutorial.ipynb": detect_nb(),
        "tutorial_segment.ipynb": segment_nb(),
        "tutorial_classify.ipynb": classify_nb(),
    }
    for name, book in books.items():
        path = REPO / name
        if opt.execute:
            from nbclient import NotebookClient

            NotebookClient(book, timeout=opt.timeout,
                           resources={"metadata": {"path": str(REPO)}}).execute()
            print(f"executed {name}")
        nbf.write(book, path)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
