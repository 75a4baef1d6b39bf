from yolov5_tpu.eval.metrics import ap_per_class, compute_ap, fitness, process_batch

__all__ = ["ap_per_class", "compute_ap", "fitness", "process_batch"]
