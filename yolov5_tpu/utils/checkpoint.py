"""Checkpoint save/load: msgpack pytrees + JSON metadata.

The reference pickles whole nn.Modules (train.py:469-479); here a checkpoint
is data, not code: {params, batch_stats, ema_params, ema_stats} as flax
msgpack plus a JSON sidecar with config/epoch/fitness. `strip_optimizer`
equivalence: training state (opt_state) is simply not saved in final
checkpoints; EMA weights are promoted to 'params' by load(..., prefer_ema=True).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, state, model, epoch=-1, best_fitness=0.0, extra=None):
    """state: TrainState. Writes <path> (msgpack) and <path>.json (meta)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": _to_numpy(state.params),
        "batch_stats": _to_numpy(state.batch_stats),
        "ema_params": _to_numpy(state.ema.params),
        "ema_stats": _to_numpy(state.ema.batch_stats),
        "ema_updates": int(state.ema.updates),
        "step": int(state.step),
    }
    path.write_bytes(serialization.msgpack_serialize(payload))
    meta = {
        "epoch": epoch,
        "best_fitness": float(best_fitness),
        "cfg": model.cfg if isinstance(model.cfg, dict) else str(model.cfg),
        "nc": model.nc,
        "names": {int(k): v for k, v in model.names.items()},
        "stride": list(model.stride),
        "format": "yolov5_tpu-ckpt-v1",
    }
    if extra:
        meta.update(extra)
    Path(str(path) + ".json").write_text(json.dumps(meta, indent=1, default=str))


def load_checkpoint(path):
    """Returns (payload dict of numpy trees, meta dict)."""
    path = Path(path)
    payload = serialization.msgpack_restore(path.read_bytes())
    meta_path = Path(str(path) + ".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return payload, meta


def variables_from_checkpoint(payload, prefer_ema=True):
    """Build model variables from a checkpoint (EMA preferred for inference,
    mirroring reference attempt_load's ema-or-model selection)."""
    if prefer_ema and payload.get("ema_params") is not None:
        return {"params": payload["ema_params"], "batch_stats": payload["ema_stats"]}
    return {"params": payload["params"], "batch_stats": payload["batch_stats"]}
