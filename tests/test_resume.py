"""Checkpoint/resume parity: opt_state round-trips through msgpack, EMA ticks
once per real optimizer update under gradient accumulation, and a killed run
resumed from last.ckpt continues with identical optimizer/schedule state
(reference smart_resume contract, utils/torch_utils.py:293-312)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_train_step import HYP, TINY_CFG, make_batch
from yolov5_tpu.models import DetectionModel
from yolov5_tpu.train.loss import ComputeLoss
from yolov5_tpu.train.optim import build_optimizer
from yolov5_tpu.train.trainer import init_train_state, make_train_step, scale_hyp
from yolov5_tpu.utils.checkpoint import (
    anchors_from_yaml,
    anchors_to_yaml,
    load_checkpoint,
    restore_train_state,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def setup():
    m = DetectionModel(TINY_CFG)
    hyp = scale_hyp(HYP, nl=len(m.stride), nc=m.nc, imgsz=64)
    loss_fn = ComputeLoss(m.anchors_per_stride, m.nc, hyp)
    # batch_size 16 vs nbs 64 -> accumulate = 4 (MultiSteps engaged)
    tx = build_optimizer(m.params, {**hyp, "warmup_epochs": 0.0}, epochs=4,
                         steps_per_epoch=8, batch_size=16)
    return m, loss_fn, tx


def test_ema_ticks_once_per_real_update(setup, rng):
    import optax

    m, loss_fn, _ = setup
    tx = optax.MultiSteps(optax.sgd(0.01, momentum=0.9), every_k_schedule=4)
    state = init_train_state(m, tx)
    step = make_train_step(m, loss_fn, tx)
    batch = make_batch(rng)
    for _ in range(8):  # 8 micro-batches / accumulate 4 = 2 real updates
        state, _ = step(state, batch)
    assert int(state.step) == 8
    assert int(state.opt_state.gradient_step) == 2
    # EMA must blend exactly once per real optimizer update, not per batch
    assert int(state.ema.updates) == 2


def test_accumulate_ramp_and_ema_invariant(setup, rng):
    """build_optimizer ramps accumulate 1 -> nbs/bs over warmup (reference
    train.py:338); whatever the ramp does, EMA ticks == real updates."""
    m, loss_fn, tx = setup
    state = init_train_state(m, tx)
    step = make_train_step(m, loss_fn, tx)
    batch = make_batch(rng)
    for _ in range(10):
        state, _ = step(state, batch)
    gs = int(state.opt_state.gradient_step)
    assert 1 <= gs <= 10
    assert int(state.ema.updates) == gs


def test_opt_state_roundtrip(setup, rng, tmp_path):
    m, loss_fn, tx = setup
    state = init_train_state(m, tx)
    step = make_train_step(m, loss_fn, tx)
    batch = make_batch(rng)
    for _ in range(6):
        state, _ = step(state, batch)
    state = jax.device_get(state)

    save_checkpoint(tmp_path / "last.ckpt", state, m, epoch=2,
                    best_fitness=0.5, include_opt=True)
    payload, meta = load_checkpoint(tmp_path / "last.ckpt")
    assert meta["epoch"] == 2 and meta["best_fitness"] == 0.5
    assert meta["anchors"] == anchors_to_yaml(m.anchors)

    fresh = init_train_state(m, tx)
    restored = restore_train_state(fresh, payload)
    assert int(restored.step) == int(state.step)
    assert int(restored.ema.updates) == int(state.ema.updates)

    # every leaf of the optimizer state survives the msgpack round trip
    a = jax.tree.leaves(jax.device_get(state.opt_state))
    b = jax.tree.leaves(jax.device_get(restored.opt_state))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)

    # and the next step from the restored state matches bit-for-bit
    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=1e-6)
    w1 = np.asarray(s1.params["layers_0"]["conv"]["kernel"])
    w2 = np.asarray(s2.params["layers_0"]["conv"]["kernel"])
    np.testing.assert_allclose(w1, w2, atol=0)


def test_anchor_yaml_roundtrip():
    anchors = (((10.0, 13.0), (16.0, 30.0)), ((30.0, 61.0), (62.0, 45.0)))
    flat = anchors_to_yaml(anchors)
    assert flat == [[10.0, 13.0, 16.0, 30.0], [30.0, 61.0, 62.0, 45.0]]
    assert anchors_from_yaml(flat) == anchors


def test_run_resume_e2e(tmp_path, rng):
    """Kill after 2 epochs, resume to 4: config rehydrates from opt.yaml,
    step counter continues, loss keeps falling."""
    import yaml

    from yolov5_tpu.data.synthetic import generate_shapes_dataset
    from yolov5_tpu.train.run import run

    cfg = generate_shapes_dataset(tmp_path / "shapes", n_images=16, img_size=96,
                                  seed=0, splits=(("train", 1.0), ("val", 0.5)))
    cfg["nc"] = 3
    data_yaml = tmp_path / "shapes.yaml"
    data_yaml.write_text(yaml.safe_dump(cfg))

    kw = dict(data=str(data_yaml), cfg=TINY_CFG, epochs=2, batch_size=8,
              imgsz=96, workers=2, max_labels=16, project=str(tmp_path / "runs"),
              name="r", exist_ok=True, patience=0, noautoanchor=True,
              hyp={**HYP, "mosaic": 0.0, "warmup_epochs": 0.0})
    _, _, save_dir = run(**kw)
    assert (save_dir / "opt.yaml").exists() and (save_dir / "hyp.yaml").exists()
    payload1, meta1 = load_checkpoint(save_dir / "last.ckpt")
    assert meta1["epoch"] == 1
    assert payload1.get("opt_state") is not None

    # bump the horizon in the persisted opt.yaml, then resume with NO args —
    # everything must rehydrate from the run dir
    opt = yaml.safe_load((save_dir / "opt.yaml").read_text())
    opt["epochs"] = 4
    (save_dir / "opt.yaml").write_text(yaml.safe_dump(opt))
    _, _, save_dir2 = run(data=str(data_yaml), resume=str(save_dir / "last.ckpt"),
                          project=str(tmp_path / "runs"))
    assert str(save_dir2) == str(save_dir)
    payload2, meta2 = load_checkpoint(save_dir / "last.ckpt")
    assert meta2["epoch"] == 3
    assert int(payload2["step"]) == 2 * int(payload1["step"])
