"""Hub-style model loading (the reference hubconf.py equivalent).

    import yolov5_tpu.hub as hub
    det = hub.load("yolov5s")                      # random-init architecture
    det = hub.load("path/to/best.ckpt")            # trained checkpoint
    det = hub.load("yolov5s.pt", cfg="yolov5s")    # torch reference weights

No weight downloads happen here (zero-egress build); point `load` at local
files. `list_models()` enumerates the bundled config zoo.
"""

from __future__ import annotations

from pathlib import Path

from yolov5_tpu.models.yolo import CONFIG_DIR


def list_models():
    return sorted(p.stem for p in CONFIG_DIR.glob("*.yaml"))


def load(name_or_path="yolov5s", cfg=None, imgsz=640, half=False, fuse=True,
         task="detect"):
    """Returns a ready Detector (or segmentation/classification model)."""
    s = str(name_or_path)
    if task == "detect" or s.endswith((".ckpt", ".pt")):
        from yolov5_tpu.infer import Detector

        if s.endswith((".ckpt", ".pt")):
            return Detector(s, cfg=cfg or "yolov5s", imgsz=imgsz, half=half, fuse=fuse)
        return Detector("", cfg=s, imgsz=imgsz, half=half, fuse=fuse)
    if task == "segment":
        from yolov5_tpu.models import SegmentationModel

        return SegmentationModel(cfg or s)
    if task == "classify":
        from yolov5_tpu.models import ClassificationModel

        return ClassificationModel(cfg or s)
    raise ValueError(f"unknown task {task}")


# torch.hub-style named factories
def _factory(name):
    def f(weights="", imgsz=640, **kw):
        return load(weights or name, cfg=name, imgsz=imgsz, **kw)

    f.__name__ = name.replace("-", "_")
    return f


for _n in ("yolov5n", "yolov5s", "yolov5m", "yolov5l", "yolov5x",
           "yolov5n6", "yolov5s6", "yolov5m6", "yolov5l6", "yolov5x6"):
    globals()[_n] = _factory(_n)
