"""Data pipeline tests: letterbox geometry, augment label math, dataset +
loader shapes, mosaic label sanity, synthetic dataset round-trip."""

import numpy as np
import pytest

from yolov5_tpu.data.augment import box_candidates, flip_lr, random_perspective
from yolov5_tpu.data.dataset import Loader, YOLODataset, create_loader, load_label_file
from yolov5_tpu.data.letterbox import letterbox
from yolov5_tpu.data.synthetic import generate_shapes_dataset

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def shapes_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapes")
    cfg = generate_shapes_dataset(root, n_images=12, img_size=160, seed=3,
                                  splits=(("train", 1.0),))
    return root, cfg


def test_letterbox_geometry():
    im = np.zeros((480, 640, 3), np.uint8)
    out, ratio, (dw, dh) = letterbox(im, 640)
    assert out.shape == (640, 640, 3)
    assert ratio == (1.0, 1.0)
    assert (dw, dh) == (0.0, 80.0)
    # non-square, scaledown only
    im2 = np.zeros((100, 50, 3), np.uint8)
    out2, r2, _ = letterbox(im2, 640, scaleup=False)
    assert out2.shape == (640, 640, 3)
    assert r2 == (1.0, 1.0)  # never upscaled


def test_letterbox_auto_stride():
    im = np.zeros((480, 640, 3), np.uint8)
    out, _, _ = letterbox(im, 640, auto=True, stride=32)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.shape[0] == 480  # 480 is already a multiple of 32


def test_flip_lr_labels():
    im = np.zeros((100, 200, 3), np.uint8)
    labels = np.array([[0, 20.0, 10, 60, 30]])  # cls, xyxy
    im2, l2 = flip_lr(im, labels.copy())
    np.testing.assert_allclose(l2[0, 1:], [140, 10, 180, 30])


def test_random_perspective_identity():
    """With zero magnitudes the warp is identity and labels survive."""
    im = np.full((64, 64, 3), 100, np.uint8)
    labels = np.array([[0, 10.0, 10, 50, 50]])
    out, l2, _ = random_perspective(im, labels.copy(), degrees=0, translate=0,
                                    scale=0, shear=0, perspective=0)
    assert out.shape == im.shape
    np.testing.assert_allclose(l2[0, 1:], labels[0, 1:], atol=1e-6)


def test_box_candidates_filters_degenerate():
    before = np.array([[0.0, 0, 20, 20]]).T
    after_ok = np.array([[0.0, 0, 18, 18]]).T
    after_tiny = np.array([[0.0, 0, 1, 1]]).T
    assert box_candidates(before, after_ok)[0]
    assert not box_candidates(before, after_tiny)[0]


def test_label_file_parsing(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("1 0.5 0.5 0.2 0.1\n2 0.25 0.25 0.1 0.1\n")
    labels, segs = load_label_file(str(p))
    assert labels.shape == (2, 5) and not segs
    # polygon row
    p2 = tmp_path / "y.txt"
    p2.write_text("0 0.1 0.1 0.9 0.1 0.9 0.9 0.1 0.9\n")
    labels2, segs2 = load_label_file(str(p2))
    assert labels2.shape == (1, 5) and len(segs2) == 1
    np.testing.assert_allclose(labels2[0], [0, 0.5, 0.5, 0.8, 0.8], atol=1e-6)


def test_dataset_val_mode(shapes_root):
    root, cfg = shapes_root
    ds = YOLODataset(cfg["train"], img_size=160, augment=False)
    im, labels, segs = ds.get_item(0)
    assert im.shape == (160, 160, 3) and im.dtype == np.uint8
    assert labels.ndim == 2 and labels.shape[1] == 5
    assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 1).all()


def test_dataset_augment_mosaic(shapes_root):
    root, cfg = shapes_root
    ds = YOLODataset(cfg["train"], img_size=160, augment=True,
                     hyp={"mosaic": 1.0, "fliplr": 0.5})
    rng = np.random.default_rng(0)
    im, labels, _ = ds.get_item(0, rng)
    assert im.shape == (160, 160, 3)
    assert len(labels) >= 1  # mosaic of 4 images keeps some objects
    assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 1).all()


def test_loader_batches_fixed_shape(shapes_root):
    root, cfg = shapes_root
    ds, loader = create_loader(cfg["train"], img_size=160, batch_size=4,
                               augment=True, max_labels=32, workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 3  # 12 images / bs 4
    for b in batches:
        assert b["images"].shape == (4, 160, 160, 3)
        assert b["targets"].shape == (4, 32, 5)
        assert b["valid"].shape == (4, 32)
        assert b["valid"].sum() > 0


def test_loader_determinism_and_sharding(shapes_root):
    root, cfg = shapes_root
    ds = YOLODataset(cfg["train"], img_size=160, augment=True)
    l1 = Loader(ds, batch_size=2, shuffle=True, seed=7, workers=1)
    l2 = Loader(ds, batch_size=2, shuffle=True, seed=7, workers=1)
    b1, b2 = next(iter(l1)), next(iter(l2))
    np.testing.assert_array_equal(b1["images"], b2["images"])
    np.testing.assert_array_equal(b1["targets"], b2["targets"])
    # epoch changes the stream
    l1.set_epoch(1)
    b3 = next(iter(l1))
    assert not np.array_equal(b1["images"], b3["images"])
    # host sharding partitions indices disjointly
    la = Loader(ds, batch_size=2, shuffle=False, shard=(0, 2))
    lb = Loader(ds, batch_size=2, shuffle=False, shard=(1, 2))
    ia, ib = la._indices(0), lb._indices(0)
    assert len(set(ia) & set(ib)) == 0
    assert len(ia) + len(ib) == len(ds)


def test_segment_masks_batch(tmp_path):
    cfg = generate_shapes_dataset(tmp_path / "seg", n_images=6, img_size=160,
                                  seed=1, segments=True)
    ds, loader = create_loader(cfg["train"], img_size=160, batch_size=2,
                               augment=False, masks=True, mask_ratio=4,
                               workers=1, max_labels=16)
    b = next(iter(loader))
    assert b["masks"].shape == (2, 40, 40)
    assert b["masks"].max() >= 1  # at least one instance rasterized


def test_rect_val_loader(tmp_path):
    """Rect loader: aspect-sorted bucketed shapes, labels in-frame, all
    images covered exactly once; evaluator consumes it."""
    import cv2 as _cv2
    from yolov5_tpu.data.dataset import Loader, YOLODataset, rect_batch_shapes

    # non-square images of assorted aspect ratios
    root = tmp_path / "rect"
    (root / "images" / "val").mkdir(parents=True)
    (root / "labels" / "val").mkdir(parents=True)
    rng = np.random.default_rng(0)
    sizes = [(200, 400), (400, 200), (300, 300), (160, 480), (480, 160)]
    for i, (h, w) in enumerate(sizes):
        im = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        _cv2.imwrite(str(root / "images" / "val" / f"{i}.jpg"), im)
        (root / "labels" / "val" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")

    ds = YOLODataset(str(root / "images" / "val"), img_size=320, augment=False)
    loader = Loader(ds, batch_size=2, rect=True, max_labels=8, workers=1)
    seen = []
    for batch in loader:
        h, w = batch["images"].shape[1:3]
        assert h % 32 == 0 and w % 32 == 0
        assert h <= 320 and w <= 320
        real = batch["real"]
        seen.extend(batch["indices"][:real].tolist())
        # labels stay inside [0, 1] of the batch frame
        t = batch["targets"][batch["valid"]]
        assert (t[:, 1:] >= 0).all() and (t[:, 1:] <= 1).all()
    assert sorted(seen) == list(range(5))

    # a wide image's batch should be wider than tall
    order, shapes = rect_batch_shapes(ds.shapes, 2, 320, 32, 0.5)
    ars = ds.shapes[:, 0] / ds.shapes[:, 1]
    first_batch = order[:2]
    assert (ars[first_batch] <= 1).all()  # sorted: widest first
    assert shapes[0][0] <= shapes[0][1]  # h <= w for wide images


def test_rect_val_evaluate(tmp_path):
    from yolov5_tpu.data.dataset import create_loader
    from yolov5_tpu.data.synthetic import generate_shapes_dataset
    from yolov5_tpu.eval.evaluator import evaluate
    from yolov5_tpu.models import DetectionModel

    cfg_d = generate_shapes_dataset(tmp_path / "r2", n_images=6, img_size=160, seed=0)
    TINY = {
        "nc": 3, "depth_multiple": 0.33, "width_multiple": 0.125,
        "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]],
        "backbone": [
            [-1, 1, "Conv", [64, 6, 2, 2]], [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "C3", [128]], [-1, 1, "Conv", [256, 3, 2]],
            [-1, 1, "C3", [256]], [-1, 1, "Conv", [512, 3, 2]],
            [-1, 1, "SPPF", [512, 5]],
        ],
        "head": [
            [-1, 1, "Conv", [256, 1, 1]],
            [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
            [[-1, 4], 1, "Concat", [1]], [-1, 1, "C3", [256, False]],
            [[10, 7], 1, "Detect", ["nc", "anchors"]],
        ],
    }
    m = DetectionModel(TINY, nc=3)
    _, loader = create_loader(cfg_d["train"], img_size=160, batch_size=4,
                              augment=False, workers=1, max_labels=8, rect=True)
    out = evaluate(m, m.variables, loader, conf_thres=0.001, max_nms=128, max_det=10)
    assert out["images"] == 6
    assert np.isfinite(out["map"])


def test_load_streams_from_video(tmp_path):
    """LoadStreams against a local video file (stands in for rtsp/webcam)."""
    import cv2 as _cv2
    from yolov5_tpu.data.sources import LoadStreams

    path = str(tmp_path / "v.mp4")
    w = _cv2.VideoWriter(path, _cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(30):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()

    streams = LoadStreams([path], img_size=64)
    got = 0
    for src, im, im0, meta in streams:
        assert im.shape == (64, 64, 3)
        assert im0.shape == (48, 64, 3)
        got += 1
        if got >= 3:
            break
    streams.close()
    assert got == 3


def test_label_cache_roundtrip(tmp_path):
    """Verification runs once and persists: a second dataset build loads the
    hash-keyed .cache.npy; a dataset change invalidates it."""
    root = tmp_path / "ds"
    generate_shapes_dataset(root, n_images=6, img_size=96, seed=1,
                            splits=(("train", 1.0),))
    path = root / "images" / "train"
    ds1 = YOLODataset(path, img_size=96)
    cache_file = root / "labels" / "train.cache.npy" if (
        root / "labels" / "train.cache.npy").exists() else (
        root / "labels" / "train").with_suffix(".cache.npy")
    assert cache_file.exists(), list((root / "labels").iterdir())

    ds2 = YOLODataset(path, img_size=96)
    assert len(ds2) == len(ds1)
    for a, b in zip(ds1.labels, ds2.labels):
        np.testing.assert_array_equal(a, b)
    # shapes come from the cache, no per-image decode needed
    assert ds2.shapes.shape == (len(ds2), 2)
    assert (ds2.shapes == 96).all()

    # touching a label invalidates the hash -> re-verify picks up the change
    lb = sorted((root / "labels" / "train").glob("*.txt"))[0]
    lb.write_text("0 0.5 0.5 0.2 0.2\n0 0.5 0.5 0.2 0.2\n")  # duplicate row
    ds3 = YOLODataset(path, img_size=96)
    i = ds3.im_files.index(str(sorted((path).glob("*.jpg"))[0]))
    assert len(ds3.labels[i]) == 1  # dedup applied


def test_corrupt_image_dropped_and_jpeg_restored(tmp_path):
    root = tmp_path / "ds"
    generate_shapes_dataset(root, n_images=6, img_size=96, seed=2,
                            splits=(("train", 1.0),))
    imgs = sorted((root / "images" / "train").glob("*.jpg"))
    imgs[0].write_bytes(b"not an image at all")
    # truncate another jpeg's EOI marker -> should be restored, not dropped
    data = imgs[1].read_bytes()
    imgs[1].write_bytes(data[:-2] + b"\x00\x00")
    ds = YOLODataset(root / "images" / "train", img_size=96)
    assert len(ds) == 5
    assert str(imgs[0]) not in ds.im_files
    assert str(imgs[1]) in ds.im_files
    assert imgs[1].read_bytes()[-2:] == b"\xff\xd9"  # restored EOI


def test_disk_cache_roundtrip(tmp_path):
    root = tmp_path / "ds"
    generate_shapes_dataset(root, n_images=4, img_size=96, seed=4,
                            splits=(("train", 1.0),))
    ds = YOLODataset(root / "images" / "train", img_size=96, cache="disk")
    im1, hw0, hw = ds.load_image(0)
    npy = sorted((root / "images" / "train").glob("*.npy"))
    assert npy, "disk cache .npy not written"
    im2, hw0b, _ = ds.load_image(0)
    np.testing.assert_array_equal(im1, im2)
    assert hw0 == hw0b


def test_copy_paste_wired_into_mosaic(tmp_path):
    """With segments present and copy_paste=1.0, mosaics gain pasted
    instances (reference dataloaders.py:836)."""
    root = tmp_path / "ds"
    generate_shapes_dataset(root, n_images=8, img_size=128, seed=5,
                            splits=(("train", 1.0),), segments=True)
    hyp = {"mosaic": 1.0, "copy_paste": 1.0, "degrees": 0, "translate": 0,
           "scale": 0, "shear": 0, "perspective": 0}
    ds = YOLODataset(root / "images" / "train", img_size=128, augment=True,
                     hyp=hyp, use_segments=True)
    rng = np.random.default_rng(0)
    base_hyp = dict(ds.hyp)
    grew = 0
    for i in range(len(ds)):
        ds.hyp = {**base_hyp, "copy_paste": 0.0}
        _, lab0, _ = ds.load_mosaic(i, np.random.default_rng(i))
        ds.hyp = {**base_hyp, "copy_paste": 1.0}
        _, lab1, _ = ds.load_mosaic(i, np.random.default_rng(i))
        grew += len(lab1) > len(lab0)
    assert grew > 0, "copy_paste never added instances"


def test_quad_loader(shapes_root):
    """--quad (reference collate_fn4): groups of 4 -> one 2s x 2s image with
    static shapes, quadrant-transformed labels, and 4x label capacity."""
    root, cfg = shapes_root
    ds, loader = create_loader(cfg["train"], img_size=160, batch_size=8,
                               augment=True, max_labels=16, workers=1, seed=0,
                               quad=True)
    # disable stochastic augs so labels stay checkable against the originals
    ds.hyp = dict(ds.hyp, mosaic=0.0, mixup=0.0, flipud=0.0, fliplr=0.0,
                  degrees=0.0, translate=0.0, scale=0.0, shear=0.0,
                  perspective=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0)
    seen_tiled = seen_upsampled = False
    for b in loader:
        assert b["images"].shape == (2, 320, 320, 3)
        assert b["targets"].shape == (2, 64, 5)
        assert b["valid"].shape == (2, 64)
        for o in range(2):
            t = b["targets"][o][b["valid"][o]]
            assert len(t), "every quad image should carry labels"
            assert (t[:, 1:] >= 0).all() and (t[:, 1:] <= 1).all()
            # tiled quads shrink boxes 2x -> max normalized wh tells branch
            if t[:, 3:5].max() < 0.5:
                seen_tiled = True
            else:
                seen_upsampled = True
    assert seen_tiled or seen_upsampled

    # determinism: same seed -> identical quad stream
    _, l2 = create_loader(cfg["train"], img_size=160, batch_size=8,
                          augment=True, max_labels=16, workers=1, seed=0,
                          quad=True)
    l2.ds.hyp = dict(ds.hyp)
    b1, b2 = next(iter(loader)), next(iter(l2))
    np.testing.assert_array_equal(b1["images"], b2["images"])
    np.testing.assert_array_equal(b1["targets"], b2["targets"])

    with pytest.raises(ValueError):
        Loader(YOLODataset(cfg["train"], img_size=160, augment=True),
               batch_size=6, quad=True)  # not divisible by 4


def test_mixed_box_polygon_rows_stay_aligned(tmp_path):
    """A label file mixing 5-number box rows with polygon rows must keep
    segments row-aligned with labels (box rows synthesize rectangle
    polygons — reference all-or-none rule; advisor round-2 finding)."""
    from yolov5_tpu.data.dataset import load_label_file

    lb = tmp_path / "mixed.txt"
    lb.write_text(
        "0 0.5 0.5 0.2 0.2\n"                       # box row
        "1 0.1 0.1 0.3 0.1 0.3 0.3 0.1 0.3\n"       # polygon row
        "2 0.8 0.8 0.1 0.1\n")                      # box row
    labels, segments = load_label_file(lb)
    assert labels.shape == (3, 5)
    assert len(segments) == 3, "every row needs a segment when any is polygon"
    # box rows became rectangle polygons matching their boxes
    for j in (0, 2):
        c, x, y, w, h = labels[j]
        seg = segments[j]
        assert seg.shape == (4, 2)
        np.testing.assert_allclose(seg.min(0), [x - w / 2, y - h / 2], atol=1e-6)
        np.testing.assert_allclose(seg.max(0), [x + w / 2, y + h / 2], atol=1e-6)
    # polygon row kept verbatim
    assert segments[1].shape == (4, 2)
    np.testing.assert_allclose(segments[1][0], [0.1, 0.1], atol=1e-6)

    # pure-box files still report no segments (detect path unchanged)
    lb2 = tmp_path / "boxes.txt"
    lb2.write_text("0 0.5 0.5 0.2 0.2\n1 0.3 0.3 0.1 0.1\n")
    labels2, segments2 = load_label_file(lb2)
    assert labels2.shape == (2, 5) and segments2 == []
