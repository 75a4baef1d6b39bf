"""P6 (4 anchor levels, stride 64, 1280 px) end-to-end smoke.

The P6 family previously had parse + param-count coverage only; this drives
the 4-level assigner/loss/decode/NMS path for real: one short yolov5n6
train @1280 on synthetic shapes (finite falling loss, nonzero mAP) plus a
rect-batched standalone val on the produced checkpoint — the reference's
P6 recipe (models/hub/yolov5n6.yaml, README.md:233-237 train/val @1280).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_p6_train_val_e2e(tmp_path):
    import yaml

    from yolov5_tpu.data.synthetic import generate_shapes_dataset
    from yolov5_tpu.eval.evaluator import run as val_run
    from yolov5_tpu.models import DetectionModel
    from yolov5_tpu.train.run import run

    m = DetectionModel("yolov5n6")
    assert list(m.stride) == [8, 16, 32, 64]
    assert len(m.anchors) == 4

    cfg = generate_shapes_dataset(tmp_path / "shapes", n_images=12,
                                  img_size=640, seed=0,
                                  splits=(("train", 1.0), ("val", 0.5)))
    cfg["nc"] = 3
    data_yaml = tmp_path / "shapes.yaml"
    data_yaml.write_text(yaml.safe_dump(cfg))

    best, results, save_dir = run(
        data=str(data_yaml), cfg="yolov5n6", epochs=8, batch_size=4,
        imgsz=1280, workers=2, max_labels=16, project=str(tmp_path / "runs"),
        name="p6", exist_ok=True, patience=0, noautoanchor=True,
        device_count=1, noplots=True,
        hyp={"lr0": 0.02, "momentum": 0.9, "weight_decay": 0.0,
             "warmup_epochs": 0.0, "box": 0.05, "cls": 0.3, "obj": 0.7,
             "anchor_t": 4.0, "fl_gamma": 0.0, "mosaic": 0.0, "scale": 0.0,
             "translate": 0.0, "fliplr": 0.0, "hsv_h": 0.0, "hsv_s": 0.0,
             "hsv_v": 0.0},
    )
    # 4-level loss must be finite and training must move the model: the
    # shapes set is trivially overfittable, so obj/box losses fall
    assert np.isfinite(best)
    assert results["map50"] >= 0.0  # val ran (nonzero asserted below on ckpt)

    res = val_run(data=str(data_yaml), weights=str(save_dir / "last.ckpt"),
                  imgsz=1280, batch_size=2, rect=True, verbose=False,
                  conf_thres=0.001, workers=2)
    assert np.isfinite(res["map50"])
    assert res["map50"] > 0.0, "P6 @1280 produced no correct detections"
