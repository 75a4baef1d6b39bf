from yolov5_tpu.train.loss import ComputeLoss
from yolov5_tpu.train.assigner import build_targets_level

__all__ = ["ComputeLoss", "build_targets_level"]
