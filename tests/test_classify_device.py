"""Classify device path: on-device crop/flip augment + HBM cache epoch scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov5_tpu.data.device_aug import classify_device_augment


def test_classify_device_augment_shapes_and_bounds(rng):
    ims = jnp.asarray(rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8))
    out = jax.jit(classify_device_augment)(ims, jax.random.PRNGKey(0))
    assert out.shape == ims.shape and out.dtype == jnp.uint8
    # crop samples inside the source image: output range bounded by input
    assert int(out.max()) <= int(np.asarray(ims).max()) + 1
    # determinism under the same key
    out2 = jax.jit(classify_device_augment)(ims, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different key -> different augmentation
    out3 = jax.jit(classify_device_augment)(ims, jax.random.PRNGKey(1))
    assert (np.asarray(out) != np.asarray(out3)).any()


def test_classify_device_augment_identity_crop():
    """scale=1, no flip reproduces the input bit-exactly (bilinear at
    integer taps)."""
    rng = np.random.default_rng(0)
    ims = jnp.asarray(rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8))
    out = classify_device_augment(ims, jax.random.PRNGKey(0),
                                  scale=(1.0, 1.0), ratio=(1.0, 1.0),
                                  hflip=0.0, jitter=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ims))


def test_classify_device_cache_epoch_scan(tmp_path, rng):
    """Two-epoch device-cached run completes with one dispatch per epoch and
    finite, falling loss on a linearly separable toy set."""
    import cv2

    from yolov5_tpu.train.run_classify import run

    root = tmp_path / "cls"
    for ci, color in enumerate([(255, 40, 40), (40, 40, 255)]):
        d = root / "train" / f"c{ci}"
        d.mkdir(parents=True)
        for i in range(8):
            im = np.full((48, 48, 3), color, np.uint8)
            im += rng.integers(0, 30, im.shape).astype(np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), im)
    # 10 epochs: classify matches the reference's no-warmup recipe, so the
    # full Adam lr applies from step 0 and the toy needs a few epochs to
    # settle (the old 3-epoch version passed only because a 100-step warmup
    # floor kept the lr near zero for the whole run)
    best, sd = run(data=str(root), cfg="yolov5n", epochs=10, batch_size=8,
                   imgsz=48, project=str(tmp_path / "runs"), name="x",
                   exist_ok=True, verbose=False, nosave=True)
    import csv
    rows = list(csv.DictReader(open(sd / "results.csv")))
    losses = [float(r["train/loss"]) for r in rows]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_validate_classify_standalone(tmp_path):
    """classify.py val analog (reference classify/val.py): standalone top-1/
    top-5 over an ImageFolder from an arbitrary checkpoint, cross-checked
    against a direct forward with the same weights."""
    import cv2
    import optax  # noqa: F401

    from yolov5_tpu.models import ClassificationModel
    from yolov5_tpu.train.optim import EMAState
    from yolov5_tpu.train.run_classify import (ImageFolder, normalize,
                                               validate_classify)
    from yolov5_tpu.train.trainer import TrainState
    from yolov5_tpu.utils.checkpoint import (save_checkpoint,
                                             variables_from_checkpoint,
                                             load_checkpoint)

    rng = np.random.default_rng(0)
    root = tmp_path / "data" / "val"
    for ci, cname in enumerate(("cats", "dogs")):
        d = root / cname
        d.mkdir(parents=True)
        for i in range(4):
            im = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            im[..., ci] = 255  # class-colored so images differ per class
            cv2.imwrite(str(d / f"{i}.jpg"), im)

    cfg = {
        "nc": 80, "depth_multiple": 0.33, "width_multiple": 0.125,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [[-1, 1, "Conv", [64, 6, 2, 2]],
                     [-1, 1, "Conv", [128, 3, 2]],
                     [-1, 1, "C3", [128]]],
        "head": [[[2], 1, "Detect", ["nc", "anchors"]]],
    }
    model = ClassificationModel(cfg, nc=2, cutoff=3)
    model.cfg = cfg
    model.names = {0: "cats", 1: "dogs"}  # training saves train_ds.classes
    state = TrainState(
        jnp.zeros((), jnp.int32), model.variables["params"],
        model.variables.get("batch_stats", {}), None,
        EMAState(model.variables["params"],
                 model.variables.get("batch_stats", {}),
                 jnp.zeros((), jnp.int32)))
    ckpt = tmp_path / "cls.ckpt"
    save_checkpoint(ckpt, jax.device_get(state), model,
                    extra={"imgsz": 32, "cutoff": 3})

    out = validate_classify(str(ckpt), str(tmp_path / "data"), imgsz=32,
                            batch_size=3, verbose=False)
    assert out["images"] == 8
    assert set(out["per_class"]) == {"cats", "dogs"}
    assert 0.0 <= out["top1"] <= out["top5"] <= 1.0
    assert np.isfinite(out["loss"])

    # cross-check top1 against a direct forward with the same weights
    payload, meta = load_checkpoint(ckpt)
    variables = variables_from_checkpoint(payload)
    ds = ImageFolder(root, img_size=32)
    ims, labels = zip(*(ds.load(i) for i in range(len(ds))))
    logits = model.module.apply(variables, normalize(jnp.asarray(np.stack(ims))),
                                train=False)
    expect_top1 = float((np.argmax(np.asarray(logits), 1)
                         == np.array(labels)).mean())
    assert abs(out["top1"] - expect_top1) < 1e-6
