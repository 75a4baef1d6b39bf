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


def anchors_to_yaml(anchors):
    """Nested ((w,h),...) per level -> YAML-style flat [w,h,w,h,...] lists."""
    return [[round(float(v), 5) for pair in lvl for v in pair] for lvl in anchors]


def anchors_from_yaml(flat):
    """YAML-style flat lists -> nested ((w,h),...) tuples per level."""
    return tuple(tuple(zip(a[0::2], a[1::2])) for a in flat)


def save_checkpoint(path, state, model, epoch=-1, best_fitness=0.0, extra=None,
                    include_opt=False):
    """state: TrainState. Writes <path> (msgpack) and <path>.json (meta).

    include_opt=True additionally stores the optax opt_state so training can
    resume with momentum/accumulation/schedule position intact (the
    reference's smart_resume contract, utils/torch_utils.py:293-312).
    Final checkpoints omit it — that IS strip_optimizer.
    """
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
    if include_opt:
        payload["opt_state"] = serialization.to_state_dict(
            jax.tree.map(np.asarray, state.opt_state))
    path.write_bytes(serialization.msgpack_serialize(payload))
    meta = {
        "epoch": epoch,
        "best_fitness": float(best_fitness),
        "cfg": model.cfg if isinstance(model.cfg, dict) else str(model.cfg),
        "nc": model.nc,
        "names": {int(k): v for k, v in model.names.items()},
        "stride": list(model.stride),
        # live anchors, NOT cfg's: autoanchor may have evolved them after
        # build (reference persists them inside the pickled module)
        "anchors": anchors_to_yaml(getattr(model, "anchors", ())),
        "format": "yolov5_tpu-ckpt-v1",
    }
    if extra:
        meta.update(extra)
    Path(str(path) + ".json").write_text(json.dumps(meta, indent=1, default=str))


def strip_optimizer(path, out=None):
    """Drop the optimizer state (and training counters) from a checkpoint —
    the reference's strip_optimizer (utils/general.py:770-787) role for
    --update / end-of-evolve. Rewrites in place unless ``out`` is given;
    returns the output path and prints the size delta."""
    path = Path(path)
    payload = serialization.msgpack_restore(path.read_bytes())
    before = path.stat().st_size
    payload.pop("opt_state", None)
    out = Path(out) if out else path
    out.write_bytes(serialization.msgpack_serialize(payload))
    meta_path = Path(str(path) + ".json")
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        meta["epoch"] = -1
        Path(str(out) + ".json").write_text(json.dumps(meta, indent=1, default=str))
    print(f"strip_optimizer: {path} {before/1e6:.1f}MB -> "
          f"{out.stat().st_size/1e6:.1f}MB")
    return out


def load_checkpoint(path):
    """Returns (payload dict of numpy trees, meta dict)."""
    path = Path(path)
    payload = serialization.msgpack_restore(path.read_bytes())
    meta_path = Path(str(path) + ".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return payload, meta


def restore_train_state(state, payload):
    """Rebuild a full TrainState from a checkpoint payload: params, batch
    stats, EMA (params/stats/updates), step, and — when the checkpoint was
    saved with include_opt — the optax opt_state (momentum buffers,
    accumulation counters, schedule position)."""
    import jax.numpy as jnp

    from yolov5_tpu.train.optim import EMAState
    from yolov5_tpu.train.trainer import TrainState

    opt_state = state.opt_state
    if payload.get("opt_state") is not None:
        opt_state = serialization.from_state_dict(opt_state, payload["opt_state"])
    ema = EMAState(
        payload.get("ema_params") or payload["params"],
        payload.get("ema_stats") or payload["batch_stats"],
        jnp.asarray(int(payload.get("ema_updates", 0)), jnp.int32),
    )
    return TrainState(
        step=jnp.asarray(int(payload.get("step", 0)), jnp.int32),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=opt_state,
        ema=ema,
    )


def variables_from_checkpoint(payload, prefer_ema=True):
    """Build model variables from a checkpoint (EMA preferred for inference,
    mirroring reference attempt_load's ema-or-model selection)."""
    if prefer_ema and payload.get("ema_params") is not None:
        return {"params": payload["ema_params"], "batch_stats": payload["ema_stats"]}
    return {"params": payload["params"], "batch_stats": payload["batch_stats"]}
