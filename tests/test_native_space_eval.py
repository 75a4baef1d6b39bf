"""Letterbox-space vs native-space matching: the two evaluator modes must
agree (the letterbox transform is a similarity; only boundary clipping can
differ). Uses NON-square images so the letterbox pad is real, and a stub
forward that emits jittered ground truth as detections."""

from collections import deque

import numpy as np
import pytest

import jax.numpy as jnp

from yolov5_tpu.data.dataset import create_loader
from yolov5_tpu.eval.evaluator import evaluate

cv2 = pytest.importorskip("cv2")


def _make_rect_dataset(root, n=10, w=320, h=208, seed=0):
    rng = np.random.default_rng(seed)
    (root / "images" / "val").mkdir(parents=True)
    (root / "labels" / "val").mkdir(parents=True)
    for i in range(n):
        im = np.full((h, w, 3), 40, np.uint8)
        rows = []
        for _ in range(rng.integers(1, 4)):
            bw, bh = rng.integers(30, 90), rng.integers(25, 70)
            x0 = rng.integers(0, w - bw)
            y0 = rng.integers(0, h - bh)
            c = int(rng.integers(0, 3))
            cv2.rectangle(im, (int(x0), int(y0)), (int(x0 + bw), int(y0 + bh)),
                          (60 * c + 60,) * 3, -1)
            rows.append(f"{c} {(x0 + bw / 2) / w:.6f} {(y0 + bh / 2) / h:.6f} "
                        f"{bw / w:.6f} {bh / h:.6f}")
        cv2.imwrite(str(root / "images" / "val" / f"{i:04d}.jpg"), im)
        (root / "labels" / "val" / f"{i:04d}.txt").write_text("\n".join(rows))


class _StubModel:
    dtype = jnp.float32
    nc = 3


def test_native_vs_letterbox_matching(tmp_path, rng):
    root = tmp_path / "rectds"
    _make_rect_dataset(root, n=10)
    _, loader = create_loader(root / "images" / "val", img_size=160,
                              batch_size=4, augment=False, shuffle=False,
                              workers=2, max_labels=8)

    # precompute fake detections per batch: each GT (already re-normalized to
    # the letterbox frame by the loader) becomes one high-conf candidate with
    # a little geometric noise, padded with zero-conf rows
    preds = deque()
    nc, cap = 3, 32
    for batch in loader:
        bs, s = batch["images"].shape[0], batch["images"].shape[1]
        p = np.zeros((bs, cap, 5 + nc), np.float32)
        for b in range(bs):
            lab = batch["targets"][b][batch["valid"][b]]
            for j, row in enumerate(lab):
                noise = rng.uniform(-1.5, 1.5, 4)
                p[b, j, 0] = row[1] * s + noise[0]
                p[b, j, 1] = row[2] * s + noise[1]
                p[b, j, 2] = row[3] * s * (1 + noise[2] / 100)
                p[b, j, 3] = row[4] * s * (1 + noise[3] / 100)
                p[b, j, 4] = 0.9
                p[b, j, 5 + int(row[0])] = 0.99
        preds.append(jnp.asarray(p))

    model = _StubModel()
    results = {}
    for mode in (False, True):
        q = deque(preds)
        model._eval_forward = lambda v, images: q.popleft()
        r = evaluate(model, {}, loader, conf_thres=0.25, native_space=mode)
        results[mode] = r
    lb, nat = results[False], results[True]
    assert nat["map50"] > 0.95 and lb["map50"] > 0.95
    assert abs(nat["map50"] - lb["map50"]) < 0.02, (nat["map50"], lb["map50"])
    assert abs(nat["map"] - lb["map"]) < 0.05, (nat["map"], lb["map"])


def test_val_save_txt_and_hybrid(tmp_path, rng):
    """--save-txt writes native-space normalized label files; --save-hybrid
    injects unit-confidence GT candidates pre-NMS (reference val.py lb= path)
    so even an empty-prediction model recalls every GT box."""
    root = tmp_path / "rectds2"
    _make_rect_dataset(root, n=6, seed=3)
    _, loader = create_loader(root / "images" / "val", img_size=160,
                              batch_size=3, augment=False, shuffle=False,
                              workers=2, max_labels=8)
    model = _StubModel()
    nc, cap = 3, 16

    def empty_forward(v, images):
        return jnp.zeros((images.shape[0], cap, 5 + nc), jnp.float32)

    model._eval_forward = empty_forward
    base = evaluate(model, {}, loader, conf_thres=0.25, native_space=True)
    assert base["map50"] == 0.0

    txt_dir = tmp_path / "labels_out"
    hyb = evaluate(model, {}, loader, conf_thres=0.25, native_space=True,
                   save_hybrid=True, save_txt_dir=txt_dir, save_conf=True)
    # injected GT candidates match themselves perfectly
    assert hyb["map50"] > 0.95
    txts = sorted(txt_dir.glob("*.txt"))
    assert len(txts) == 6
    # rows are "cls cx cy w h conf" normalized to the ORIGINAL image frame
    row = txts[0].read_text().split("\n")[0].split()
    assert len(row) == 6
    assert all(0.0 <= float(v) <= 1.0 for v in row[1:])
