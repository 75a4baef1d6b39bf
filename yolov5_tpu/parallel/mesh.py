"""Device mesh + sharding rules.

The reference's distributed story is torchrun + DDP + NCCL all-reduce
(/root/reference/train.py:656-667, utils/torch_utils.py:61-70). The TPU-native
equivalent is declarative: build a `jax.sharding.Mesh`, shard the batch over
the 'data' axis, replicate params, and let XLA insert the gradient all-reduce
over ICI inside the single jitted train step. SyncBatchNorm is the DEFAULT
semantics here: BatchNorm reduces over the global (sharded) batch axis and
XLA inserts the cross-device mean, so per-chip batch size never degrades BN
statistics (the reference must opt in via convert_sync_batchnorm,
train.py:269-271; asserted in tests/test_train_step.py).

Axes:
  data  — data parallelism (batch dim). The only axis YOLOv5-class CNNs
          need; mesh creation still accepts extra axes so model-parallel
          experiments (spatial sharding of large feature maps) can reuse it.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axes=("data",), devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = (len(devs),) + (1,) * (len(axes) - 1)
    return Mesh(np.array(devs).reshape(shape), axes)


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    """Batch arrays: sharded on the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with batch-dim sharding (single
    pytree-level call: transfers are batched, critical over a TPU tunnel).

    Multi-process (multi-host) meshes: each process holds only its rank's
    slice of the global batch (the loader shards by jax.process_index()), so
    the global array is assembled from process-local data — the JAX analog
    of the reference's per-rank DistributedSampler batches (train.py:656-667
    wires torchrun; here the mesh spans all hosts' devices)."""
    if jax.process_count() > 1:
        spec = shard_batch_spec(mesh)

        def put(x):
            x = np.asarray(x)
            gshape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(spec, x, gshape)

        return jax.tree.map(put, batch)
    return jax.device_put(batch, shard_batch_spec(mesh))


def replicate(tree, mesh: Mesh):
    if jax.process_count() > 1:
        spec = replicated_spec(mesh)

        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(spec, x, x.shape)

        return jax.tree.map(put, tree)
    return jax.device_put(tree, replicated_spec(mesh))


_DONE = object()


def prefetch_to_mesh(iterator, mesh: Mesh, depth=2, transform=None, put=None):
    """Double-buffered input pipeline: a background thread pulls host batches,
    applies `transform` (host-side prep), and `jax.device_put`s them with
    batch sharding up to `depth` ahead — overlapping augmentation and the
    H2D transfer with the device step instead of serializing them (the
    reference gets this from DataLoader worker prefetch + pinned-memory
    copies, utils/dataloaders.py:106-164)."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)
    err = []

    def produce():
        try:
            for b in iterator:
                if transform is not None:
                    b = transform(b)
                if put is not None:
                    # the train step's preferred-layout uploader
                    # (trainer.AutoLayoutStep.put); falls back to a plain
                    # sharded put until the step has compiled
                    q.put(put(b))
                else:
                    q.put(shard_batch(b, mesh))
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(_DONE)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        b = q.get()
        if b is _DONE:
            break
        yield b
    t.join()
    if err:
        raise err[0]
