"""Benchmark: yolov5s 640px inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's headline yolov5s V100 b32 speed of 0.9 ms/img
(reference README.md:228) = 1111 img/s; NMS excluded there, so the primary
metric here is forward+decode as well. NMS timing is reported alongside in
extras (the p50 NMS north-star).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMG_S = 1000.0 / 0.9  # V100 b32, reference README.md:228


def main(batch=32, imgsz=640, iters=30, warmup=5):
    from yolov5_tpu.models import DetectionModel
    from yolov5_tpu.models.weights import fuse_conv_bn
    from yolov5_tpu.ops.nms import non_max_suppression

    model = DetectionModel("yolov5s", dtype=jnp.bfloat16)
    fused_vars = fuse_conv_bn(model.variables)
    fused = DetectionModel("yolov5s", dtype=jnp.bfloat16, fused=True)

    @jax.jit
    def forward(variables, images):
        maps = fused.module.apply(variables, images, train=False)
        return fused.decode(maps, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (batch, imgsz, imgsz, 3)), jnp.bfloat16)

    pred = forward(fused_vars, images)
    pred.block_until_ready()  # compile
    times = []
    for _ in range(warmup):
        forward(fused_vars, images).block_until_ready()
    for _ in range(iters):
        t0 = time.perf_counter()
        forward(fused_vars, images).block_until_ready()
        times.append(time.perf_counter() - t0)
    t_fwd = float(np.median(times))
    img_s = batch / t_fwd

    # NMS timing (on-device, conf 0.25 detect settings)
    nms = lambda p: non_max_suppression(p, conf_thres=0.25, iou_thres=0.45,
                                        max_nms=2048, max_det=300)
    d = nms(pred)
    jax.block_until_ready(d)
    nms_times = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(nms(pred))
        nms_times.append(time.perf_counter() - t0)
    nms_ms = float(np.median(nms_times)) * 1000 / batch

    result = {
        "metric": "yolov5s_640_bf16_images_per_sec_per_chip_b32",
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
        "extras": {
            "forward_ms_per_img": round(t_fwd * 1000 / batch, 3),
            "nms_ms_per_img_p50": round(nms_ms, 3),
            "batch": batch,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
