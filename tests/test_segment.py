"""Segmentation path: mask ops, seg loss, one train step, seg eval."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov5_tpu.models import SegmentationModel
from yolov5_tpu.ops.masks import masks2segments, process_mask
from yolov5_tpu.train.loss import ComputeSegmentLoss
from yolov5_tpu.train.optim import build_optimizer
from yolov5_tpu.train.trainer import init_train_state, make_train_step, scale_hyp

cv2 = pytest.importorskip("cv2")

SEG_CFG = {
    "nc": 3,
    "depth_multiple": 0.33,
    "width_multiple": 0.125,
    "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]],
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
        [[11, 8], 1, "Segment", ["nc", "anchors", 8, 64]],
    ],
}

HYP = {"box": 0.05, "obj": 1.0, "cls": 0.5, "anchor_t": 4.0, "fl_gamma": 0.0,
       "lr0": 0.01, "lrf": 0.01, "momentum": 0.9, "weight_decay": 0.0,
       "warmup_epochs": 0.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1}


@pytest.fixture(scope="module")
def seg_model():
    return SegmentationModel(SEG_CFG)


def test_segment_model_outputs(seg_model):
    m = seg_model
    x = jnp.zeros((2, 64, 64, 3))
    maps, proto = m.apply(m.variables, x, train=False)
    nm = 8
    assert maps[0].shape == (2, 8, 8, 3, 5 + 3 + nm)
    assert proto.shape == (2, 16, 16, nm)


def test_process_mask_crops():
    protos = jnp.ones((8, 8, 4))
    coeffs = jnp.asarray([[5.0, 0, 0, 0]])  # strongly positive -> sigmoid ~1
    boxes = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])  # in 32x32 img space
    out = np.asarray(process_mask(protos, coeffs, boxes, (32, 32)))
    assert out.shape == (1, 8, 8)
    assert out[0, 3, 3] > 0.9  # inside box (mask px 2..6)
    assert out[0, 0, 0] == 0.0  # cropped outside


def test_masks2segments():
    m = np.zeros((1, 16, 16), np.uint8)
    m[0, 4:12, 4:12] = 1
    segs = masks2segments(m)
    assert len(segs) == 1 and len(segs[0]) >= 4
    assert segs[0].min() >= 3 and segs[0].max() <= 12


def test_segment_loss_and_step(seg_model, rng):
    m = seg_model
    hyp = scale_hyp(HYP, nl=len(m.stride), nc=3, imgsz=64)
    nm = 8
    loss_fn = ComputeSegmentLoss(m.anchors_per_stride, 3, hyp, nm=nm,
                                 overlap=True, seg_k=64)
    tx = build_optimizer(m.params, hyp, epochs=2, steps_per_epoch=2, batch_size=64)
    state = init_train_state(m, tx)
    step = make_train_step(m, loss_fn, tx, has_masks=True)

    bs, M = 2, 8
    targets = np.zeros((bs, M, 5), np.float32)
    valid = np.zeros((bs, M), bool)
    masks = np.zeros((bs, 16, 16), np.int32)
    for b in range(bs):
        targets[b, 0] = [0, 0.5, 0.5, 0.5, 0.5]
        valid[b, 0] = True
        masks[b, 4:12, 4:12] = 1  # instance 1 = label row 0
    batch = {"images": jnp.asarray(rng.uniform(0, 1, (bs, 64, 64, 3)), jnp.float32),
             "targets": jnp.asarray(targets), "valid": jnp.asarray(valid),
             "masks": jnp.asarray(masks)}
    l0 = None
    for i in range(8):
        state, metrics = step(state, batch)
        if l0 is None:
            l0 = float(metrics["total"])
    assert np.isfinite(float(metrics["total"]))
    assert "seg" in metrics and float(metrics["seg"]) >= 0
    assert float(metrics["total"]) < l0  # learning


def test_segment_loss_no_masks_matches_detect(seg_model, rng):
    """Without gt_masks the segment loss degrades to the detection loss."""
    m = seg_model
    hyp = scale_hyp(HYP, nl=len(m.stride), nc=3, imgsz=64)
    loss_fn = ComputeSegmentLoss(m.anchors_per_stride, 3, hyp, nm=8)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    out = m.apply(m.variables, x, train=False)
    targets = jnp.asarray([[[0, 0.5, 0.5, 0.4, 0.4]]], jnp.float32)
    valid = jnp.ones((1, 1), bool)
    total, comps = loss_fn(out, targets, valid, None)
    assert "seg" not in comps
    assert np.isfinite(float(total))


def test_device_mask_iou_matches_host(rng):
    """The evaluator's on-device mask-IoU (one MXU matmul, only the (G, P)
    matrix fetched) must agree with the host-side reference computation
    (process_mask -> threshold -> flat mask_iou) up to bilinear-resampler
    boundary differences."""
    from yolov5_tpu.eval.metrics import mask_iou

    s, hm, wm, nm = 64, 16, 16, 8
    P, G = 6, 4
    proto = jnp.asarray(rng.normal(0, 1, (hm, wm, nm)), jnp.float32)
    coeffs = jnp.asarray(rng.normal(0, 2, (P, nm)), jnp.float32)
    boxes = jnp.asarray(
        np.stack([rng.uniform(0, s // 2, P), rng.uniform(0, s // 2, P),
                  rng.uniform(s // 2, s, P), rng.uniform(s // 2, s, P)], 1),
        jnp.float32)
    gm = np.zeros((G, hm, wm), np.uint8)
    for g in range(G):
        y0, x0 = rng.integers(0, hm - 6, 2)
        gm[g, y0:y0 + 6, x0:x0 + 6] = 1

    # device path (mirrors run_segment.mask_iou_dev, non-overlap mode)
    pm = process_mask(proto, coeffs, boxes, (s, s), upsample=True)
    pmf = (np.asarray(pm) > 0.5).reshape(P, -1)
    gt = jax.image.resize(jnp.asarray(gm, jnp.float32), (G, s, s), "bilinear")
    gtf = (np.asarray(gt) > 0.5).reshape(G, -1)
    inter = jax.lax.dot_general(
        jnp.asarray(gtf, jnp.bfloat16), jnp.asarray(pmf, jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    area_g = gtf.sum(1).astype(np.float32)
    area_p = pmf.sum(1).astype(np.float32)
    union = area_g[:, None] + area_p[None, :] - np.asarray(inter)
    iou_dev = np.asarray(inter) / np.maximum(union, 1e-9)

    # host reference on the SAME binary masks: must be exact (integer sums)
    iou_host = mask_iou(gtf, pmf)
    np.testing.assert_allclose(iou_dev, iou_host, atol=1e-6)


def test_seg_run_resume_e2e(tmp_path):
    """Seg trainer has the full train.py feature surface (reference
    segment/train.py forks train.py wholesale): kill after 2 epochs, resume
    to 4 — config rehydrates from opt.yaml and the step counter continues."""
    import yaml

    from yolov5_tpu.data.synthetic import generate_shapes_dataset
    from yolov5_tpu.train.run_segment import run
    from yolov5_tpu.utils.checkpoint import load_checkpoint

    cfg = generate_shapes_dataset(tmp_path / "shapes", n_images=16, img_size=96,
                                  seed=0, segments=True,
                                  splits=(("train", 1.0), ("val", 0.5)))
    data_yaml = tmp_path / "shapes.yaml"
    data_yaml.write_text(yaml.safe_dump(cfg))

    kw = dict(data=str(data_yaml), cfg=SEG_CFG, epochs=2, batch_size=8,
              imgsz=96, workers=2, max_labels=16,
              project=str(tmp_path / "runs"), name="r", exist_ok=True,
              noautoanchor=True, noplots=True,
              hyp={**HYP, "mosaic": 0.0, "warmup_epochs": 0.0, "hsv_h": 0.0,
                   "hsv_s": 0.0, "hsv_v": 0.0, "degrees": 0.0, "translate": 0.0,
                   "scale": 0.0, "shear": 0.0, "perspective": 0.0, "flipud": 0.0,
                   "fliplr": 0.0, "mixup": 0.0, "copy_paste": 0.0})
    _, _, save_dir = run(**kw)
    assert (save_dir / "opt.yaml").exists() and (save_dir / "hyp.yaml").exists()
    payload1, meta1 = load_checkpoint(save_dir / "last.ckpt")
    assert meta1["epoch"] == 1
    assert payload1.get("opt_state") is not None

    opt = yaml.safe_load((save_dir / "opt.yaml").read_text())
    opt["epochs"] = 4
    (save_dir / "opt.yaml").write_text(yaml.safe_dump(opt))
    _, _, save_dir2 = run(data=str(data_yaml),
                          resume=str(save_dir / "last.ckpt"),
                          project=str(tmp_path / "runs"))
    assert str(save_dir2) == str(save_dir)
    payload2, meta2 = load_checkpoint(save_dir / "last.ckpt")
    assert meta2["epoch"] == 3
    assert int(payload2["step"]) == 2 * int(payload1["step"])
