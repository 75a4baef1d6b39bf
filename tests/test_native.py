"""Native C++ feeder: builds, decodes correctly vs cv2, handles failures."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

native = pytest.importorskip("yolov5_tpu.native")

if not native.available():  # toolchain missing -> skip the module
    pytest.skip("native library unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jp")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(480, 640), (100, 300), (640, 640)]):
        im = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        im = cv2.GaussianBlur(im, (0, 0), 2)  # smooth: jpeg+resample tolerant
        p = d / f"{i}.jpg"
        cv2.imwrite(str(p), im, [cv2.IMWRITE_JPEG_QUALITY, 98])
        paths.append(str(p))
    return paths


def test_native_matches_cv2_letterbox(jpegs):
    from yolov5_tpu.data.letterbox import letterbox

    out, hws, ok = native.decode_letterbox_batch(jpegs, 320, scaleup=True)
    assert ok.all()
    for i, p in enumerate(jpegs):
        ref_bgr = cv2.imread(p)
        assert tuple(hws[i]) == ref_bgr.shape[:2]
        ref_lb, _, _ = letterbox(ref_bgr, 320, scaleup=True)
        ref_rgb = ref_lb[..., ::-1]
        diff = np.abs(out[i].astype(int) - ref_rgb.astype(int))
        # interpolation differs slightly from cv2's; content must agree
        assert np.median(diff) <= 2.0, np.median(diff)
        assert (diff <= 4).mean() > 0.8


def test_native_reports_failures(tmp_path, jpegs):
    bad = str(tmp_path / "missing.jpg")
    out, hws, ok = native.decode_letterbox_batch([jpegs[0], bad], 160)
    assert ok[0] and not ok[1]


def test_native_no_upscale(jpegs):
    out, hws, ok = native.decode_letterbox_batch([jpegs[1]], 640, scaleup=False)
    assert ok[0]
    # 100x300 image must stay 100x300 centered in gray
    im = out[0]
    assert (im[0, 0] == 114).all()  # padding corner
    center = im[320 - 50 : 320 + 50, 320 - 150 : 320 + 150]
    assert center.std() > 10  # image content present, unscaled


def test_native_loader_matches_python_loader(tmp_path):
    """Val loader with the native path yields equivalent batches (images
    nearly identical, labels equal) to the pure-python path."""
    import time

    from yolov5_tpu.data.dataset import create_loader
    from yolov5_tpu.data.synthetic import generate_shapes_dataset

    cfg = generate_shapes_dataset(tmp_path / "ds", n_images=12, img_size=200, seed=0)
    _, l_py = create_loader(cfg["train"], img_size=160, batch_size=4,
                            augment=False, shuffle=False, workers=2, native=False)
    _, l_nat = create_loader(cfg["train"], img_size=160, batch_size=4,
                             augment=False, shuffle=False, workers=2, native=True)
    assert l_nat.native, "native path should be active for jpeg val data"
    for bp, bn in zip(l_py, l_nat):
        assert bn["images"].shape == bp["images"].shape
        diff = np.abs(bn["images"].astype(int) - bp["images"].astype(int))
        assert np.median(diff) <= 2.0
        np.testing.assert_array_equal(bn["valid"], bp["valid"])
        np.testing.assert_allclose(bn["targets"], bp["targets"], atol=0.02)
