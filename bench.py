"""Benchmark: yolov5s 640px inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's headline yolov5s V100 b32 speed of 0.9 ms/img
(reference README.md:228) = 1111 img/s; NMS (~1 ms) excluded there, so the
primary metric is forward+decode.

Methodology: K calls are chained and a scalar fetch forces completion —
on the tunneled single-chip setup `block_until_ready` returns early and
per-call host timing measures dispatch latency, not device time. Chaining
reflects pipelined steady-state serving throughput. `with_dispatch`
measures the actual serving program (infer.Detector fast path: flat param
buffer in, raw bf16 head maps out); `serve_e2e_nms` adds the fused
decode+NMS program on top — the deployment-realistic rate.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMG_S = 1000.0 / 0.9  # V100 b32, reference README.md:228


def chain_time(fn, args, k=20):
    """Median-of-3 of (k chained executions + one forced scalar sync) / k."""
    out = fn(*args)
    _ = float(jnp.sum(out[0][..., 0]) if isinstance(out, tuple) else jnp.sum(out[..., 0]))
    times = []
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        _ = float(jnp.sum(out[0][..., 0]) if isinstance(out, tuple) else jnp.sum(out[..., 0]))
        times.append((time.perf_counter() - t0) / k)
    return float(np.median(times))


def _train_step_time(batch, imgsz, k_lo=5, k_hi=15):
    """Median marginal time of the full jitted train step (forward, loss,
    backward, optimizer, EMA) on yolov5s at the headline shape point."""
    from yolov5_tpu.models import DetectionModel
    from yolov5_tpu.train.loss import ComputeLoss
    from yolov5_tpu.train.optim import build_optimizer
    from yolov5_tpu.train.trainer import init_train_state, make_train_step, scale_hyp
    from yolov5_tpu.utils.hyp import load_hyp

    model = DetectionModel("yolov5s", dtype=jnp.bfloat16)
    hyp = scale_hyp(load_hyp("scratch-low"), nl=len(model.stride),
                    nc=model.nc, imgsz=imgsz)
    loss_fn = ComputeLoss(model.anchors_per_stride, model.nc, hyp)
    tx = build_optimizer(model.params, hyp, epochs=300, steps_per_epoch=128,
                         batch_size=batch)
    step = make_train_step(model, loss_fn, tx)

    rng = np.random.default_rng(0)
    m = 32  # labels per image
    imgs_np = rng.uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)
    if model.wants_packed_input(imgsz, imgsz):
        # steady-state input pipeline: the prefetch worker pre-packs batches
        # to the folded s2d form (train/run.py host_prep), deleting the ~4 ms
        # in-graph fold transpose the packed stem otherwise pays
        from yolov5_tpu.models.layers import fold_s2d

        imgs_np = np.ascontiguousarray(fold_s2d(imgs_np))
    images = jnp.asarray(imgs_np, jnp.bfloat16)
    cls = rng.integers(0, model.nc, (batch, m, 1))
    cxy = rng.uniform(0.2, 0.8, (batch, m, 2))
    wh = rng.uniform(0.05, 0.3, (batch, m, 2))
    targets = jnp.asarray(np.concatenate([cls, cxy, wh], -1), jnp.float32)
    batch_d = {"images": images, "targets": targets,
               "valid": jnp.ones((batch, m), bool)}

    def run(state, k):
        for _ in range(k):
            state, metrics = step(state, batch_d)
        _ = float(metrics["total"])
        return state

    state = init_train_state(model, tx)
    state = run(state, 1)  # compile + warm
    if hasattr(step, "put"):
        # steady-state input pipeline: prefetch uploads straight into the
        # step's preferred image layout (trainer.AutoLayoutStep)
        batch_d = step.put(batch_d)
    ts = []
    for _rep in range(3):
        t0 = time.perf_counter()
        state = run(state, k_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        state = run(state, k_hi)
        t_hi = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (k_hi - k_lo))
    return float(np.median(ts))


def main(batch=32, imgsz=640, k=20):
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
    imgs_np = rng.uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)
    if fused.wants_packed_input(imgsz, imgsz):
        # deployment input pipeline: the feeder phase-packs batches on the
        # host (layers.fold_s2d) so the packed stem consumes them in place —
        # the in-graph s2d fold of the input was the #1 item in the serving
        # forward HLO (~31% of estimated cycles, pure layout copies). Same
        # pre-pack infer.Detector / eval / train all do.
        from yolov5_tpu.models.layers import fold_s2d

        imgs_np = np.ascontiguousarray(fold_s2d(imgs_np))
    images = jnp.asarray(imgs_np, jnp.bfloat16)

    # Serving program (what infer.Detector.__call__ actually dispatches):
    # params cross as ONE flat buffer (per-leaf pytree dispatch marshals
    # ~300 handles, +2.5 ms/call on the tunnel) and the jit boundary carries
    # the RAW bf16 head maps (~137 MB at b32) instead of the decoded fp32
    # (bs, N, 85) (~274 MB) — boundary bytes, not dispatch RPC (floor
    # measured 0.4 ms/call), are the per-call tax. Decode happens inside the
    # NMS program on the gathered survivors (ops/nms.py from_maps).
    leaves, treedef = jax.tree.flatten(fused_vars)
    shapes = [l.shape for l in leaves]
    dtypes = [l.dtype for l in leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    offs = np.cumsum([0] + sizes)
    flat_params = jax.jit(lambda ls: jnp.concatenate(
        [jnp.ravel(l).astype(jnp.float32) for l in ls]))(leaves)

    def unflatten(fl):
        ls = [jax.lax.dynamic_slice(fl, (int(offs[i]),), (sizes[i],))
              .reshape(shapes[i]).astype(dtypes[i]) for i in range(len(sizes))]
        return jax.tree.unflatten(treedef, ls)

    @jax.jit
    def serve_fwd(fl, x):
        return tuple(fused.module.apply(unflatten(fl), x, train=False))

    t_fwd = chain_time(lambda fl, x: serve_fwd(fl, x), (flat_params, images), k)
    img_s = batch / t_fwd

    from yolov5_tpu.ops.nms import non_max_suppression_from_maps

    anchors = tuple(np.asarray(a, np.float32) for a in fused.anchors)
    strides = tuple(float(s) for s in fused.stride)

    def serve_e2e(fl, x):
        # two programs, matching infer.Detector's serving path (a fully
        # fused single program was tried and reverted: two in-flight
        # dispatches deadlock result fetches on the tunneled runtime)
        maps = serve_fwd(fl, x)
        return non_max_suppression_from_maps(
            maps, anchors, strides, conf_thres=0.25, iou_thres=0.45,
            max_det=300, max_nms=2048).boxes

    t_e2e = chain_time(lambda fl, x: serve_e2e(fl, x), (flat_params, images),
                       k=10)

    pred = forward(fused_vars, images)

    @jax.jit
    def nms(p):
        # detect-path defaults (infer.py:272): conf 0.25, 2048-candidate cap.
        # The 30720 cap is the eval path's (conf 0.001 multi-label), measured
        # separately in extras.
        d = non_max_suppression(p, conf_thres=0.25, iou_thres=0.45,
                                max_det=300, max_nms=2048)
        return d.boxes

    @jax.jit
    def nms_eval(p):
        d = non_max_suppression(p, conf_thres=0.001, iou_thres=0.6,
                                max_det=300, max_nms=30720, multi_label=True)
        return d.boxes

    t_nms = chain_time(lambda p: nms(p), (pred,), k=10)
    nms_ms = t_nms * 1000 / batch
    t_nms_eval = chain_time(lambda p: nms_eval(p), (pred,), k=10)
    nms_eval_ms = t_nms_eval * 1000 / batch

    # device-bound rate: K forwards inside one jit (no per-call dispatch).
    # Reduce over the FULL output so XLA cannot dead-code-eliminate any
    # branch of the graph (a single-element reduction would let it drop the
    # P4/P5 heads); the input perturbation defeats loop-invariant hoisting.
    def make_rep(K):
        @jax.jit
        def rep(v, x):
            def body(i, acc):
                out = forward(v, x + i * jnp.bfloat16(1e-6))
                return acc + jnp.sum(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return rep

    # two-point difference: wall(K) = overhead + K * t_step, so the marginal
    # (T_hi - T_lo)/(K_hi - K_lo) isolates the true per-forward device time
    # from the fixed dispatch + tunnel-readback cost of a single call
    K_LO, K_HI = 20, 60
    rep_lo, rep_hi = make_rep(K_LO), make_rep(K_HI)
    _ = float(rep_lo(fused_vars, images))  # compile
    _ = float(rep_hi(fused_vars, images))
    ts = []
    for _rep in range(3):
        t0 = time.perf_counter()
        _ = float(rep_lo(fused_vars, images))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(rep_hi(fused_vars, images))
        t_hi = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (K_HI - K_LO))
    t_dev = float(np.median(ts))
    dev_img_s = batch / t_dev

    # Headline = sustained on-chip throughput (K forwards in one program).
    # The reference's 0.9 ms/img V100 b32 number is likewise pure device
    # time (profiler-based, NMS excluded). Host-dispatch-included numbers
    # go to extras — in this sandbox dispatch crosses a network tunnel and
    # fluctuates 15-20 ms/call, which no local deployment would pay.
    # MFU: achieved FLOP rate / peak. yolov5s@640 forward = 16.5 GFLOPs/img
    # (reference models/yolov5s.yaml header); v5e peak ~197 TFLOP/s bf16.
    FLOPS_PER_IMG = 16.5e9
    PEAK_BF16 = 197e12
    mfu = dev_img_s * FLOPS_PER_IMG / PEAK_BF16

    # Training throughput: full step (forward, loss, backward, SGD+EMA) at
    # the same shape point. Reference anchor: "300 epochs ≈ 2 days" for
    # yolov5s on one V100 (reference README.md:148) over COCO train2017
    # (118,287 images) ≈ 205 img/s.
    t_train = _train_step_time(batch, imgsz)
    train_img_s = batch / t_train

    result = {
        "metric": "yolov5s_640_bf16_images_per_sec_per_chip_b32",
        "value": round(dev_img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(dev_img_s / BASELINE_IMG_S, 3),
        "extras": {
            "mfu_pct": round(100 * mfu, 2),
            "device_ms_per_img": round(t_dev * 1000 / batch, 3),
            "with_dispatch_img_s": round(img_s, 1),
            "with_dispatch_ms_per_img": round(t_fwd * 1000 / batch, 3),
            "with_dispatch_over_device": round(img_s / dev_img_s, 3),
            "serve_e2e_nms_img_s": round(batch / t_e2e, 1),
            "serve_e2e_nms_ms_per_img": round(t_e2e * 1000 / batch, 3),
            "nms_ms_per_img_p50": round(nms_ms, 3),
            "nms_eval30k_ms_per_img_p50": round(nms_eval_ms, 3),
            "train_img_s": round(train_img_s, 1),
            "train_ms_per_img": round(t_train * 1000 / batch, 3),
            "train_vs_v100_300ep_2d": round(train_img_s / 205.0, 2),
            "batch": batch,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
