"""Multi-host (multi-process) initialization.

The reference wires multi-node training through torchrun env vars +
`dist.init_process_group` (/root/reference/train.py:99-101,656-667). The JAX
analog is one `jax.distributed.initialize` call per process, after which
`jax.devices()` spans every host's chips and the existing mesh/sharding code
(parallel/mesh.py) is already multi-host correct: params replicate, batches
assemble from per-process shards, and XLA runs gradient collectives over
ICI/DCN.

Env contract (torchrun-compatible names, reference train.py:99-101):
  RANK          — this process's index (0..WORLD_SIZE-1)
  WORLD_SIZE    — number of processes (hosts)
  MASTER_ADDR   — coordinator host (default 127.0.0.1)
  MASTER_PORT   — coordinator port (default 29500)
or the JAX-native COORDINATOR_ADDRESS ("host:port") override.

On TPU pods, prefer plain `jax.distributed.initialize()` (no args): the TPU
runtime supplies coordinates. This module's env-driven path is for explicit
launches and for CPU clusters (gloo collectives), which is how the 2-process
integration test exercises it without multi-host hardware.
"""

from __future__ import annotations

import os

import jax


def init_distributed(coordinator=None, num_processes=None, process_id=None,
                     local_device_ids=None):
    """Initialize JAX's distributed runtime from args or env. Returns True
    when multi-process mode was activated, False for single-process runs.

    Safe to call unconditionally at CLI entry: with WORLD_SIZE unset (or 1)
    it is a no-op, and a second call on an already-initialized runtime is
    skipped.
    """
    world = num_processes if num_processes is not None else int(
        os.environ.get("WORLD_SIZE", 1))
    if world <= 1:
        return False
    if jax.distributed.is_initialized():  # e.g. launcher already set it up
        return True
    rank = process_id if process_id is not None else int(os.environ["RANK"])
    addr = coordinator or os.environ.get("COORDINATOR_ADDRESS") or (
        f"{os.environ.get('MASTER_ADDR', '127.0.0.1')}:"
        f"{os.environ.get('MASTER_PORT', '29500')}")
    # CPU clusters need cross-process collectives; gloo ships in jaxlib
    plats = _requested_platforms()
    if "cpu" in plats:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=world, process_id=rank,
        local_device_ids=local_device_ids)
    return True


def _requested_platforms() -> str:
    try:
        v = jax.config.jax_platforms
    except AttributeError:  # config name drift across jax versions
        v = None
    return (v or os.environ.get("JAX_PLATFORMS", "")).lower()
