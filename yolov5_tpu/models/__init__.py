from yolov5_tpu.models.yolo import (
    ClassificationModel,
    DetectionModel,
    SegmentationModel,
    build_model,
    load_config,
)

__all__ = [
    "ClassificationModel",
    "DetectionModel",
    "SegmentationModel",
    "build_model",
    "load_config",
]
