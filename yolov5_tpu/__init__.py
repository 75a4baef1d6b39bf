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

import os as _os

import jax as _jax

# Persistent XLA compilation cache: first compiles of the train step /
# inference graph take minutes (remote TPU compiler); cached reloads are
# near-instant across processes. Opt out with YOLOV5_TPU_NO_COMP_CACHE=1.
if not _os.environ.get("YOLOV5_TPU_NO_COMP_CACHE"):
    if not _jax.config.jax_compilation_cache_dir:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "YOLOV5_TPU_COMP_CACHE",
                _os.path.expanduser("~/.cache/yolov5_tpu/xla_cache"),
            ),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
