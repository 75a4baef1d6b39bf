from yolov5_tpu.ops.boxes import (
    bbox_iou,
    bbox_ioa,
    box_iou,
    clip_boxes,
    scale_boxes,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywh,
    xyxy2xywhn,
)
from yolov5_tpu.ops.nms import non_max_suppression

__all__ = [
    "bbox_iou",
    "bbox_ioa",
    "box_iou",
    "clip_boxes",
    "scale_boxes",
    "xywh2xyxy",
    "xywhn2xyxy",
    "xyxy2xywh",
    "xyxy2xywhn",
    "non_max_suppression",
]
