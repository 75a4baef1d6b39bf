"""Target assignment + loss tests, including a sequential numpy oracle that
mirrors the reference build_targets semantics (utils/loss.py:185-247)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov5_tpu.train.assigner import build_targets_level
from yolov5_tpu.train.loss import ComputeLoss, bce_with_logits, crop_mask, masked_mean


def oracle_assign(targets_b, anchors, ny, nx, anchor_t=4.0, g=0.5):
    """Sequential reference-semantics assignment. targets_b: list over batch
    of (n, 5) [cls,x,y,w,h] normalized. Returns a multiset of rounded tuples
    (b, a, gj, gi, dx, dy, w, h, cls)."""
    out = []
    off = [(0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (-0.5, 0.0), (0.0, -0.5)]
    for b, rows in enumerate(targets_b):
        for cls, x, y, w, h in rows:
            gx, gy, gw, gh = x * nx, y * ny, w * nx, h * ny
            if gw <= 0 or gh <= 0:
                continue
            for a, (aw, ah) in enumerate(anchors):
                r = max(gw / aw, aw / gw, gh / ah, ah / gh)
                if not r < anchor_t:
                    continue
                gxi, gyi = nx - gx, ny - gy
                conds = [
                    True,
                    gx % 1 < g and gx > 1,
                    gy % 1 < g and gy > 1,
                    gxi % 1 < g and gxi > 1,
                    gyi % 1 < g and gyi > 1,
                ]
                for cond, (ox, oy) in zip(conds, off):
                    if not cond:
                        continue
                    gi = int(np.clip(np.floor(gx - ox), 0, nx - 1))
                    gj = int(np.clip(np.floor(gy - oy), 0, ny - 1))
                    out.append(
                        (b, a, gj, gi, round(gx - gi, 4), round(gy - gj, 4),
                         round(gw, 4), round(gh, 4), int(cls))
                    )
    return sorted(out)


def pad_targets(targets_b, m=32):
    bs = len(targets_b)
    t = np.zeros((bs, m, 5), np.float32)
    v = np.zeros((bs, m), bool)
    for b, rows in enumerate(targets_b):
        n = len(rows)
        if n:
            t[b, :n] = rows
            v[b, :n] = True
    return t, v


def vectorized_assign(targets_b, anchors, ny, nx, anchor_t=4.0):
    t, v = pad_targets(targets_b)
    asn = build_targets_level(jnp.asarray(t), jnp.asarray(v), jnp.asarray(anchors), ny, nx, anchor_t)
    mask = np.asarray(asn["mask"])
    gj, gi, a = np.asarray(asn["gj"]), np.asarray(asn["gi"]), np.asarray(asn["a"])
    tbox, tcls = np.asarray(asn["tbox"]), np.asarray(asn["tcls"])
    out = []
    bs = mask.shape[0]
    for idx in zip(*np.nonzero(mask)):
        b = idx[0]
        out.append(
            (b, int(a[idx]), int(gj[idx]), int(gi[idx]),
             round(float(tbox[idx][0]), 4), round(float(tbox[idx][1]), 4),
             round(float(tbox[idx][2]), 4), round(float(tbox[idx][3]), 4),
             int(tcls[idx]))
        )
    return sorted(out)


ANCHORS = [(1.25, 1.625), (2.0, 3.75), (4.125, 2.875)]


def test_assign_matches_oracle_random(rng):
    for trial in range(5):
        targets_b = []
        for b in range(3):
            n = rng.integers(0, 8)
            rows = np.stack(
                [
                    rng.integers(0, 3, n).astype(np.float32),
                    rng.uniform(0.05, 0.95, n),
                    rng.uniform(0.05, 0.95, n),
                    rng.uniform(0.02, 0.5, n),
                    rng.uniform(0.02, 0.5, n),
                ],
                axis=-1,
            ) if n else np.zeros((0, 5), np.float32)
            targets_b.append(rows)
        got = vectorized_assign(targets_b, ANCHORS, 16, 16)
        want = oracle_assign(targets_b, ANCHORS, 16, 16)
        assert got == want, f"trial {trial}: {len(got)} vs {len(want)}"


def test_assign_edge_cells():
    """Targets near borders must not produce out-of-range cells."""
    targets_b = [[(0, 0.01, 0.01, 0.1, 0.1), (1, 0.99, 0.99, 0.1, 0.1), (2, 0.5, 0.03, 0.2, 0.08)]]
    got = vectorized_assign(targets_b, ANCHORS, 8, 8)
    want = oracle_assign(targets_b, ANCHORS, 8, 8)
    assert got == want
    for row in got:
        assert 0 <= row[2] < 8 and 0 <= row[3] < 8


def test_assign_anchor_gate():
    """A huge box matches only large anchors; a tiny one only small."""
    targets_b = [[(0, 0.5, 0.5, 0.9, 0.9)]]
    got = vectorized_assign(targets_b, ANCHORS, 8, 8)  # gw=7.2: anchor0 ratio 5.76 >= 4
    anchors_used = {r[1] for r in got}
    assert anchors_used == {1, 2}
    # and cross-check the oracle agrees
    assert got == oracle_assign(targets_b, ANCHORS, 8, 8)


def test_bce_with_logits_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.linspace(-4, 4, 21, dtype=np.float32)
    z = (np.sin(x) > 0).astype(np.float32)
    for pw in (1.0, 2.5):
        mine = np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(z), pw))
        theirs = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.tensor(x), torch.tensor(z), pos_weight=torch.tensor(pw), reduction="none"
        ).numpy()
        np.testing.assert_allclose(mine, theirs, atol=1e-6)


HYP = {"box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0, "obj_pw": 1.0,
       "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0}


def make_maps(rng, bs=2, nc=3, grids=((8, 8), (4, 4)), na=3, bias=-5.0):
    maps = []
    for ny, nx in grids:
        m = rng.normal(0, 0.5, (bs, ny, nx, na, 5 + nc)).astype(np.float32)
        m[..., 4] += bias  # realistic low-objness init
        maps.append(jnp.asarray(m))
    return maps


def test_loss_components_and_scale(rng):
    anchors = (ANCHORS, [(a * 2, b * 2) for a, b in ANCHORS])
    loss_fn = ComputeLoss(anchors, nc=3, hyp=HYP)
    targets_b = [[(0, 0.5, 0.5, 0.3, 0.3)], [(1, 0.25, 0.25, 0.1, 0.2), (2, 0.7, 0.7, 0.2, 0.1)]]
    t, v = pad_targets(targets_b)
    maps = make_maps(rng)
    total, comps = loss_fn(maps, jnp.asarray(t), jnp.asarray(v))
    assert np.isfinite(float(total))
    assert float(comps["box"]) > 0 and float(comps["obj"]) > 0 and float(comps["cls"]) > 0
    # total = (box+obj+cls) * bs
    assert float(total) == pytest.approx(
        (float(comps["box"]) + float(comps["obj"]) + float(comps["cls"])) * 2, rel=1e-5
    )


def test_loss_no_targets(rng):
    anchors = (ANCHORS,)
    loss_fn = ComputeLoss(anchors, nc=3, hyp=HYP)
    t = jnp.zeros((2, 8, 5))
    v = jnp.zeros((2, 8), bool)
    maps = make_maps(rng, grids=((8, 8),))
    total, comps = loss_fn(maps, t, v)
    assert float(comps["box"]) == 0 and float(comps["cls"]) == 0
    assert float(comps["obj"]) > 0  # background obj loss still applies


def test_loss_gradients_flow(rng):
    anchors = (ANCHORS,)
    loss_fn = ComputeLoss(anchors, nc=3, hyp=HYP)
    targets_b = [[(0, 0.5, 0.5, 0.3, 0.3)]]
    t, v = pad_targets(targets_b)
    maps = make_maps(rng, bs=1, grids=((8, 8),))

    def f(m):
        return loss_fn([m], jnp.asarray(t), jnp.asarray(v))[0]

    g = jax.grad(f)(maps[0])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_loss_rewards_correct_predictions(rng):
    """A head map whose decoded boxes sit exactly on the target must have a
    lower loss than a random map."""
    anchors = (ANCHORS,)
    nc = 3
    loss_fn = ComputeLoss(anchors, nc=nc, hyp=HYP)
    tgt = (1, 0.5 + 1 / 16, 0.5 + 1 / 16, 0.2, 0.25)  # center of cell (4,4) + offset .5
    t, v = pad_targets([[tgt]])
    rand_map = make_maps(rng, bs=1, grids=((8, 8),))[0]

    good = np.full((1, 8, 8, 3, 5 + nc), -8.0, np.float32)
    # cell (4,4): dx=dy=0.5 -> sigmoid(t)=0.5 -> t=0; wh: (2sig)^2*anchor = gwh
    gw, gh = 0.2 * 8, 0.25 * 8
    for a, (aw, ah) in enumerate(ANCHORS):
        sw = np.sqrt(gw / aw) / 2
        sh = np.sqrt(gh / ah) / 2
        if not (0 < sw < 1 and 0 < sh < 1):
            continue
        good[0, 4, 4, a, 0] = 0.0
        good[0, 4, 4, a, 1] = 0.0
        good[0, 4, 4, a, 2] = np.log(sw / (1 - sw))
        good[0, 4, 4, a, 3] = np.log(sh / (1 - sh))
        good[0, 4, 4, a, 4] = 8.0  # confident obj
        good[0, 4, 4, a, 5 + 1] = 8.0  # correct class
    l_good, _ = loss_fn([jnp.asarray(good)], jnp.asarray(t), jnp.asarray(v))
    l_rand, _ = loss_fn([rand_map], jnp.asarray(t), jnp.asarray(v))
    assert float(l_good) < float(l_rand) * 0.5


def test_crop_mask():
    masks = jnp.ones((2, 8, 8))
    boxes = jnp.asarray([[2.0, 2, 6, 6], [0, 0, 8, 4]])
    out = np.asarray(crop_mask(masks, boxes))
    assert out[0].sum() == 16 and out[1].sum() == 32
    assert out[0, 0, 0] == 0 and out[0, 3, 3] == 1


def test_masked_mean():
    x = jnp.asarray([1.0, 2.0, 3.0, 100.0])
    m = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    assert float(masked_mean(x, m)) == pytest.approx(2.0)
