from yolov5_tpu.data.letterbox import letterbox
from yolov5_tpu.data.dataset import YOLODataset, create_loader

__all__ = ["letterbox", "YOLODataset", "create_loader"]
