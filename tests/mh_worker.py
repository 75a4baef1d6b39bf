"""Worker process for tests/test_multihost.py: one rank of a 2-process CPU
cluster. Initializes the distributed runtime from torchrun-style env vars
(yolov5_tpu.parallel.distributed), trains one epoch of the TINY model over a
global 2-device mesh with per-process data shards, and dumps its shard
indices + final parameter digest for the parent to check.

Run as: python tests/mh_worker.py <data_dir> <out_json>
with RANK / WORLD_SIZE / MASTER_ADDR / MASTER_PORT set.
"""

import hashlib
import json
import sys
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    data_dir, out_json = sys.argv[1], sys.argv[2]

    from yolov5_tpu.parallel.distributed import init_distributed

    assert init_distributed(), "WORLD_SIZE env should activate multi-process"
    rank, world = jax.process_index(), jax.process_count()
    assert world == 2 and jax.device_count() == 2

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
    bs_local = 4
    _, loader = create_loader(data_dir, img_size=96, batch_size=bs_local,
                              augment=False, shuffle=False, workers=0,
                              max_labels=16, shard=(rank, world))
    loader.set_epoch(0)
    indices = [int(i) for i in loader._indices(0)]

    model = DetectionModel(TINY_CFG)
    hyp = scale_hyp({**HYP, "label_smoothing": 0.0}, nl=len(model.stride),
                    nc=model.nc, imgsz=96)
    loss_fn = ComputeLoss(model.anchors_per_stride, model.nc, hyp)
    tx = build_optimizer(model.params, {**hyp, "lr0": 0.05, "lrf": 1.0},
                         epochs=2, steps_per_epoch=len(loader),
                         batch_size=64)
    state = init_train_state(model, tx)
    mesh = make_mesh()
    step = make_train_step(model, loss_fn, tx, mesh=mesh)

    losses = []
    with mesh:
        state = replicate(state, mesh)
        for batch in loader:
            b = {k: batch[k] for k in ("images", "targets", "valid")}
            state, metrics = step(state, shard_batch(b, mesh))
            losses.append(float(jax.device_get(metrics["total"])))

    params = jax.device_get(jax.tree.map(np.asarray, state.params))
    leaves = jax.tree_util.tree_leaves_with_path(params)
    digest = hashlib.sha256()
    psum = 0.0
    for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
        digest.update(np.ascontiguousarray(leaf).tobytes())
        psum += float(np.abs(leaf).sum())
    Path(out_json).write_text(json.dumps({
        "rank": rank, "indices": indices, "losses": losses,
        "params_sha": digest.hexdigest(), "params_l1": psum,
    }))


if __name__ == "__main__":
    main()
