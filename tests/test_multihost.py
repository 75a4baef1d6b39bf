"""Multi-host (2-process CPU cluster) integration test.

Launches two real OS processes that initialize jax.distributed via the
torchrun-style env contract (parallel/distributed.py), train one epoch over a
2-device global mesh with per-process data shards, and report back. Asserts:
shard disjointness + coverage, bitwise-identical final params across ranks
(no replica desync), and final params matching a single-process run fed the
same global batch stream (the reference's DDP-equivalence property,
train.py:656-667).
"""

import hashlib
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def shapes_dir(tmp_path_factory):
    from yolov5_tpu.data.synthetic import generate_shapes_dataset

    root = tmp_path_factory.mktemp("mh")
    cfg = generate_shapes_dataset(root / "shapes", n_images=16, img_size=96,
                                  seed=0, splits=(("train", 1.0),))
    return cfg["train"]


@pytest.fixture(scope="module")
def cluster(shapes_dir, tmp_path_factory):
    return _run_cluster(shapes_dir, tmp_path_factory.mktemp("cluster"))


def _run_cluster(shapes_dir, tmp_path, attempts=3):
    # gloo's 30s KV-store rendezvous can time out on a heavily loaded CI
    # box; retry on a fresh port before declaring failure
    last = ""
    for attempt in range(attempts):
        outs = [tmp_path / f"a{attempt}_rank{r}.json" for r in range(2)]
        procs = []
        for r in range(2):
            env = dict(os.environ)
            env.update(RANK=str(r), WORLD_SIZE="2", MASTER_ADDR="127.0.0.1",
                       MASTER_PORT=str(29583 + attempt))
            # workers see exactly one local CPU device each
            env.pop("XLA_FLAGS", None)
            procs.append(subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "mh_worker.py"),
                 str(shapes_dir), str(outs[r])],
                env=env, cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT))
        logs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            logs.append(out.decode(errors="replace"))
        if all(p.returncode == 0 for p in procs):
            return [json.loads(o.read_text()) for o in outs]
        last = "\n".join(log[-1500:] for log in logs)
    raise AssertionError(f"cluster failed after {attempts} attempts:\n{last}")


def test_two_process_cpu_cluster(cluster):
    r0, r1 = cluster

    # per-process shards are disjoint and cover the dataset
    i0, i1 = set(r0["indices"]), set(r1["indices"])
    assert not (i0 & i1), "rank shards must be disjoint"
    assert i0 | i1 == set(range(16)), "shards must cover every image"

    # replicated state stayed in sync: identical bytes on both ranks
    assert r0["params_sha"] == r1["params_sha"], "replica desync across hosts"
    assert np.allclose(r0["losses"], r1["losses"])


def test_two_process_matches_single_process(shapes_dir, cluster):
    rs = cluster

    sys.path.insert(0, str(REPO / "tests"))
    from test_train_step import HYP, TINY_CFG

    from yolov5_tpu.data.dataset import create_loader
    from yolov5_tpu.models import DetectionModel
    from yolov5_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from yolov5_tpu.train.loss import ComputeLoss
    from yolov5_tpu.train.optim import build_optimizer
    from yolov5_tpu.train.trainer import (
        init_train_state,
        make_train_step,
        scale_hyp,
    )
    from yolov5_tpu.utils.general import init_seeds

    init_seeds(0)
    loaders = [create_loader(str(shapes_dir), img_size=96, batch_size=4,
                             augment=False, shuffle=False, workers=0,
                             max_labels=16, shard=(r, 2))[1] for r in range(2)]
    for ld in loaders:
        ld.set_epoch(0)

    model = DetectionModel(TINY_CFG)
    hyp = scale_hyp({**HYP, "label_smoothing": 0.0}, nl=len(model.stride),
                    nc=model.nc, imgsz=96)
    loss_fn = ComputeLoss(model.anchors_per_stride, model.nc, hyp)
    tx = build_optimizer(model.params, {**hyp, "lr0": 0.05, "lrf": 1.0},
                         epochs=2, steps_per_epoch=len(loaders[0]),
                         batch_size=64)
    state = init_train_state(model, tx)
    mesh = make_mesh(n_devices=2)
    step = make_train_step(model, loss_fn, tx, mesh=mesh)

    losses = []
    with mesh:
        state = replicate(state, mesh)
        for b0, b1 in zip(*loaders):
            # global batch = [rank0 local | rank1 local], the same layout
            # make_array_from_process_local_data produces on the cluster
            gb = {k: np.concatenate([np.asarray(b0[k]), np.asarray(b1[k])])
                  for k in ("images", "targets", "valid")}
            state, metrics = step(state, shard_batch(gb, mesh))
            losses.append(float(jax.device_get(metrics["total"])))

    params = jax.device_get(jax.tree.map(np.asarray, state.params))
    leaves = jax.tree_util.tree_leaves_with_path(params)
    digest = hashlib.sha256()
    psum = 0.0
    for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
        digest.update(np.ascontiguousarray(leaf).tobytes())
        psum += float(np.abs(leaf).sum())

    # loss trajectories agree step for step, and final params agree to
    # float tolerance (collective reduction order may differ across the
    # gloo ring vs the in-process mesh)
    np.testing.assert_allclose(losses, rs[0]["losses"], rtol=1e-4, atol=1e-4)
    assert np.isclose(psum, rs[0]["params_l1"], rtol=1e-5), (
        psum, rs[0]["params_l1"])
    if digest.hexdigest() == rs[0]["params_sha"]:
        pass  # bitwise match: even better
