"""End-to-end train-step tests on a micro model: loss goes down, EMA tracks,
and the same step compiles + runs over an 8-device data-parallel mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov5_tpu.models import DetectionModel
from yolov5_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from yolov5_tpu.train.loss import ComputeLoss
from yolov5_tpu.train.optim import build_optimizer, ema_update, ema_init
from yolov5_tpu.train.trainer import init_train_state, make_train_step, scale_hyp

TINY_CFG = {
    "nc": 3,
    "depth_multiple": 0.33,
    "width_multiple": 0.125,
    "anchors": [
        [10, 13, 16, 30, 33, 23],
        [30, 61, 62, 45, 59, 119],
    ],
    "backbone": [
        [-1, 1, "Conv", [64, 6, 2, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 1, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 1, "C3", [512]],
        [-1, 1, "SPPF", [512, 5]],
    ],
    "head": [
        [-1, 1, "Conv", [256, 1, 1]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 4], 1, "Concat", [1]],
        [-1, 1, "C3", [256, False]],
        [[11, 8], 1, "Detect", ["nc", "anchors"]],
    ],
}

HYP = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005,
       "warmup_epochs": 0.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
       "box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
       "anchor_t": 4.0, "fl_gamma": 0.0}


def make_batch(rng, bs=2, px=64, m=8):
    images = rng.uniform(0, 1, (bs, px, px, 3)).astype(np.float32)
    targets = np.zeros((bs, m, 5), np.float32)
    valid = np.zeros((bs, m), bool)
    for b in range(bs):
        targets[b, 0] = [b % 3, 0.5, 0.5, 0.4, 0.3]
        targets[b, 1] = [(b + 1) % 3, 0.25, 0.3, 0.2, 0.2]
        valid[b, :2] = True
    return {"images": jnp.asarray(images), "targets": jnp.asarray(targets),
            "valid": jnp.asarray(valid)}


@pytest.fixture(scope="module")
def tiny_model():
    return DetectionModel(TINY_CFG)


def test_train_step_reduces_loss(tiny_model, rng):
    m = tiny_model
    hyp = scale_hyp(HYP, nl=len(m.stride), nc=m.nc, imgsz=64)
    loss_fn = ComputeLoss(m.anchors_per_stride, m.nc, hyp)
    tx = build_optimizer(m.params, {**hyp, "lr0": 0.1, "lrf": 1.0}, epochs=10,
                         steps_per_epoch=10, batch_size=64)  # accumulate=1
    state = init_train_state(m, tx)
    step = make_train_step(m, loss_fn, tx)
    batch = make_batch(rng)
    losses = []
    for i in range(50):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::10]
    assert int(state.step) == 50
    assert int(state.ema.updates) == 50


def test_ema_tracks_params():
    p = {"w": jnp.ones((4,))}
    s = {"m": jnp.zeros((2,))}
    ema = ema_init(p, s)
    # after 1 update with tiny decay ramp, ema ~ new params
    new_p = {"w": jnp.full((4,), 3.0)}
    ema = ema_update(ema, new_p, s)
    d = 0.9999 * (1 - np.exp(-1 / 2000))
    np.testing.assert_allclose(np.asarray(ema.params["w"]),
                               1.0 * d + 3.0 * (1 - d), rtol=1e-5)


def test_multichip_data_parallel_step(tiny_model, rng):
    """The real multi-chip path: 8-device mesh, batch sharded, params
    replicated; XLA inserts the gradient all-reduce."""
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    m = tiny_model
    mesh = make_mesh(8)
    hyp = scale_hyp(HYP, nl=len(m.stride), nc=m.nc, imgsz=64)
    loss_fn = ComputeLoss(m.anchors_per_stride, m.nc, hyp)
    tx = build_optimizer(m.params, hyp, epochs=3, steps_per_epoch=4, batch_size=64)
    state = init_train_state(m, tx)
    step = make_train_step(m, loss_fn, tx, mesh=mesh)
    batch = make_batch(rng, bs=8)
    with mesh:
        state = replicate(state, mesh)
        batch = shard_batch(batch, mesh)
        state, metrics = step(state, batch)
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total"]))
    # param update must be identical across devices (replicated invariants)
    w = state.params["layers_0"]["conv"]["kernel"]
    assert np.isfinite(np.asarray(w)).all()


def test_single_vs_multichip_same_result(tiny_model, rng):
    """One step on 1 device == one step on 8 devices (same global batch)."""
    m = tiny_model
    hyp = scale_hyp(HYP, nl=len(m.stride), nc=m.nc, imgsz=64)
    loss_fn = ComputeLoss(m.anchors_per_stride, m.nc, hyp)
    tx = build_optimizer(m.params, hyp, epochs=3, steps_per_epoch=4, batch_size=64)
    batch = make_batch(rng, bs=8)

    s1 = init_train_state(m, tx)
    step1 = make_train_step(m, loss_fn, tx)
    s1, m1 = step1(s1, batch)

    mesh = make_mesh(8)
    s8 = init_train_state(m, tx)
    step8 = make_train_step(m, loss_fn, tx, mesh=mesh)
    with mesh:
        s8 = replicate(s8, mesh)
        sb = shard_batch(batch, mesh)
        s8, m8 = step8(s8, sb)
    assert float(m1["total"]) == pytest.approx(float(m8["total"]), rel=1e-4)
    w1 = np.asarray(s1.params["layers_0"]["conv"]["kernel"])
    w8 = np.asarray(s8.params["layers_0"]["conv"]["kernel"])
    np.testing.assert_allclose(w1, w8, atol=1e-5)
    # BatchNorm statistics are GLOBAL-batch statistics under jit+sharding
    # (XLA inserts the cross-device mean) — i.e. SyncBatchNorm is the default
    # semantics here, with no convert_sync_batchnorm step (reference
    # train.py:269-271 has to opt in)
    b1 = np.asarray(s1.batch_stats["layers_0"]["bn"]["mean"])
    b8 = np.asarray(s8.batch_stats["layers_0"]["bn"]["mean"])
    np.testing.assert_allclose(b1, b8, atol=1e-5)


def test_device_cache_step_multichip(tiny_model, rng):
    """HBM-resident dataset: the step gathers its batch from a replicated
    device cache by sharded (bs,) indices — runs over the 8-device mesh."""
    m = tiny_model
    hyp = scale_hyp(HYP, nl=len(m.stride), nc=m.nc, imgsz=64)
    aug_hyp = {**HYP, "mosaic": 1.0, "scale": 0.5, "translate": 0.1,
               "fliplr": 0.5, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4}
    loss_fn = ComputeLoss(m.anchors_per_stride, m.nc, hyp)
    tx = build_optimizer(m.params, hyp, epochs=2, steps_per_epoch=4, batch_size=64)
    mesh = make_mesh(8)
    step = make_train_step(m, loss_fn, tx, mesh=mesh,
                           device_aug_hyp=aug_hyp, device_cache=True)

    n, s, M = 16, 64, 8
    cache = {
        "images": rng.integers(0, 255, (n, s, s, 3)).astype(np.uint8),
        "hw": np.tile(np.array([[48, 64]], np.int32), (n, 1)),
        "targets": np.zeros((n, M, 5), np.float32),
        "valid": np.zeros((n, M), bool),
    }
    cache["targets"][:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    cache["valid"][:, 0] = True

    state = init_train_state(m, tx)
    with mesh:
        state = replicate(state, mesh)
        cache_dev = replicate(cache, mesh)
        batch = shard_batch({"idx": np.arange(8, dtype=np.int32)}, mesh)
        state, metrics = step(state, batch, cache_dev)
        state, metrics = step(state, {"idx": jnp.asarray(
            np.arange(8, 16, dtype=np.int32))}, cache_dev)
    assert np.isfinite(float(metrics["total"]))
    assert int(state.step) == 2


def test_epoch_step_matches_per_batch_steps(tiny_model, rng):
    """make_epoch_step (lax.scan over index batches, one dispatch/epoch)
    must produce the same final state as the per-batch step sequence."""
    from yolov5_tpu.train.trainer import make_epoch_step

    m = tiny_model
    hyp = scale_hyp(HYP, nl=len(m.stride), nc=m.nc, imgsz=64)
    aug_hyp = {**HYP, "mosaic": 1.0, "scale": 0.5, "translate": 0.1,
               "fliplr": 0.5, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4}
    loss_fn = ComputeLoss(m.anchors_per_stride, m.nc, hyp)
    tx = build_optimizer(m.params, hyp, epochs=2, steps_per_epoch=4, batch_size=64)
    mesh = make_mesh(2)
    step = make_train_step(m, loss_fn, tx, mesh=mesh,
                           device_aug_hyp=aug_hyp, device_cache=True)
    epoch = make_epoch_step(m, loss_fn, tx, mesh, device_aug_hyp=aug_hyp)

    n, s, M = 8, 64, 8
    cache = {
        "images": rng.integers(0, 255, (n, s, s, 3)).astype(np.uint8),
        "hw": np.tile(np.array([[48, 64]], np.int32), (n, 1)),
        "targets": np.zeros((n, M, 5), np.float32),
        "valid": np.zeros((n, M), bool),
    }
    cache["targets"][:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    cache["valid"][:, 0] = True
    idx = np.arange(8, dtype=np.int32).reshape(2, 4)  # 2 batches of 4

    with mesh:
        cache_dev = replicate(cache, mesh)
        s_a = replicate(init_train_state(m, tx), mesh)
        for b in range(2):
            s_a, m_a = step(s_a, {"idx": jnp.asarray(idx[b])}, cache_dev)
        s_b = replicate(init_train_state(m, tx), mesh)
        s_b, agg = epoch(s_b, jnp.asarray(idx), cache_dev)
    assert int(s_b.step) == 2
    # identical randomness (keyed by state.step) -> identical trajectories
    pa, pb = jax.device_get((s_a.params, s_b.params))
    for la, lb in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(la, lb, atol=1e-6)
    assert np.isfinite(float(agg["total"]))
