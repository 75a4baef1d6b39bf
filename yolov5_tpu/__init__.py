"""yolov5_tpu — a TPU-native (JAX/XLA/Pallas) object detection framework.

A from-scratch re-design of the capabilities of ultralytics/yolov5 for TPU:
functional flax models in NHWC, a single jitted train step, on-device NMS and
target assignment with static shapes, and data parallelism expressed as
`jax.sharding` over a device mesh instead of NCCL/DDP.

Subpackages
-----------
- ``ops``      — box math, IoU family, NMS, mask ops (device, jit-safe)
- ``models``   — module zoo, YAML graph builder, Detect/Segment/Classify heads,
                 torch checkpoint import
- ``data``     — host-side image pipeline (letterbox, mosaic, HSV, perspective)
- ``train``    — loss, target assignment, optimizer/EMA/schedules, train loop
- ``eval``     — mAP metrics, confusion matrix, val loop
- ``parallel`` — mesh construction + sharding rules (DP today, room for more)
- ``utils``    — config, logging, checkpoints, misc
"""

__version__ = "0.1.0"
