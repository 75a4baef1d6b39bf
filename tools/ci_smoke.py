#!/usr/bin/env python
"""CI smoke matrix — the reference's per-workload CI contract
(/root/reference/.github/workflows/ci-testing.yml:89-143) on synthetic data:

  detect:   train 1 epoch -> val -> detect -> export ckpt
  segment:  train 1 epoch (scratch) -> seg val
  classify: train 2 epochs -> val top1
  models:   build every models/configs/*.yaml (parse test, yolo.py --test role)

Runs on the CPU backend so it works on any machine (pass --tpu to use the
default accelerator). Exits non-zero on the first failure.
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true", help="use the default backend")
    ap.add_argument("--imgsz", type=int, default=96)
    args = ap.parse_args()
    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import yaml

    from yolov5_tpu.data.synthetic import (
        generate_classify_dataset,
        generate_shapes_dataset,
    )

    tmp = Path(tempfile.mkdtemp(prefix="ci_smoke_"))
    s = args.imgsz

    # ---- model build matrix (reference yolo.py:485-490) --------------------
    from yolov5_tpu.models import DetectionModel, SegmentationModel
    from yolov5_tpu.models.yolo import load_config

    cfg_dir = Path(__file__).parent.parent / "yolov5_tpu" / "models" / "configs"
    built = 0
    for f in sorted(cfg_dir.glob("*.yaml")):
        if f.stem == "anchors":
            continue  # data tables, not a model
        cfg = load_config(f.stem)
        model = (SegmentationModel if "-seg" in f.stem else DetectionModel)(cfg)
        assert model.num_params() > 0
        built += 1
    print(f"[models] built {built} configs OK")

    # ---- detect -------------------------------------------------------------
    cfg = generate_shapes_dataset(tmp / "det", n_images=16, img_size=s, seed=0,
                                  splits=(("train", 1.0), ("val", 0.5)))
    cfg["nc"] = 3
    data_yaml = tmp / "det.yaml"
    data_yaml.write_text(yaml.safe_dump(cfg))

    from yolov5_tpu.train.run import run as train_run

    best, results, save_dir = train_run(
        data=str(data_yaml), cfg="yolov5n", epochs=1, batch_size=8, imgsz=s,
        project=str(tmp / "runs"), name="det", exist_ok=True, workers=2,
        noautoanchor=True, patience=0)
    assert (save_dir / "last.ckpt").exists()
    print("[detect] 1-epoch train OK")

    from yolov5_tpu.eval.evaluator import run as val_run

    r = val_run(data=str(data_yaml), weights=str(save_dir / "last.ckpt"),
                imgsz=s, batch_size=8, verbose=False)
    assert "map50" in r
    print(f"[detect] val OK (map50={r['map50']:.3f})")

    from yolov5_tpu.infer import run as detect_run

    results, ddir = detect_run(weights=str(save_dir / "last.ckpt"),
                               source=str(tmp / "det" / "images" / "val"),
                               imgsz=s, project=str(tmp / "runs-detect"),
                               verbose=False)
    assert len(results)
    print(f"[detect] predict OK ({len(results)} images)")

    from yolov5_tpu.export import run as export_run

    arts = export_run(weights=str(save_dir / "last.ckpt"), include=("ckpt",),
                      imgsz=s)
    assert arts
    print("[detect] export OK")

    # ---- segment ------------------------------------------------------------
    scfg = generate_shapes_dataset(tmp / "seg", n_images=16, img_size=s, seed=1,
                                   splits=(("train", 1.0), ("val", 0.5)),
                                   segments=True)
    scfg["nc"] = 3
    seg_yaml = tmp / "seg.yaml"
    seg_yaml.write_text(yaml.safe_dump(scfg))

    from yolov5_tpu.train.run_segment import run as seg_run

    _, seg_results, seg_dir = seg_run(
        data=str(seg_yaml), cfg="yolov5n-seg", epochs=1, batch_size=8,
        imgsz=s, project=str(tmp / "runs-seg"), name="seg", exist_ok=True,
        workers=2)
    assert (Path(seg_dir) / "last.ckpt").exists()
    print("[segment] 1-epoch train + val OK")

    # ---- classify -----------------------------------------------------------
    generate_classify_dataset(tmp / "cls", n_per_class=8, img_size=s, seed=0)

    from yolov5_tpu.train.run_classify import run as cls_run

    top1, cls_dir = cls_run(data=str(tmp / "cls"), cfg="yolov5n", epochs=2,
                            batch_size=8, imgsz=s, project=str(tmp / "runs-cls"),
                            name="cls", exist_ok=True)
    assert (Path(cls_dir) / "last.ckpt").exists()
    print(f"[classify] 2-epoch train OK (top1={top1:.3f})")

    print("CI SMOKE PASSED")


if __name__ == "__main__":
    main()
