"""Optimizer, LR/momentum schedules, and EMA — optax re-design of the
reference training infrastructure (utils/torch_utils.py:257-375, train.py:234-251).

Reference semantics kept:
- 3 param groups (torch_utils.py:257-290): BN scales + all biases get no
  weight decay; conv/dense kernels get decay. Decay is scaled by
  batch_size * accumulate / nbs (train.py:234-236).
- SGD nesterov momentum 0.937 (or adam/adamw), lr0 with linear
  `(1-x/epochs)(1-lrf)+lrf` or one_cycle cosine schedule.
- Warmup over max(3 epochs, 100 iters): lr 0 -> lr0 (bias group from
  warmup_bias_lr), momentum 0.8 -> momentum.
- ModelEMA decay `0.9999 * (1 - exp(-updates/2000))` over params AND
  batch_stats (torch_utils.py:343-375).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


def one_cycle(y1=0.0, y2=1.0, steps=100):
    """Cosine ramp y1->y2 (reference delegates to ultralytics one_cycle).
    Traceable: x may be a jax scalar."""
    return lambda x: ((1 - jnp.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def lr_lambda(epochs, lrf, cos_lr=False):
    if cos_lr:
        return one_cycle(1.0, lrf, epochs)
    return lambda e: jnp.maximum(1 - e / epochs, 0.0) * (1.0 - lrf) + lrf


def make_schedules(hyp, epochs, steps_per_epoch, batch_size, nbs=64, cos_lr=False,
                   accumulate=1):
    """Per-update lr (weights/bias) and momentum schedules, warmup included.

    With gradient accumulation the inner optimizer's counter ticks once per
    *real* update (optax.MultiSteps), so all schedule units are converted
    from the reference's per-batch counts (nw = max(3 epochs, 100 batches),
    train.py:338) to per-update counts.
    """
    lr0 = hyp.get("lr0", 0.01)
    lrf = hyp.get("lrf", 0.01)
    warmup_epochs = hyp.get("warmup_epochs", 3.0)
    warmup_bias_lr = hyp.get("warmup_bias_lr", 0.1)
    warmup_momentum = hyp.get("warmup_momentum", 0.8)
    momentum = hyp.get("momentum", 0.937)
    steps_per_epoch = max(round(steps_per_epoch / accumulate), 1)  # real updates
    # the 100-iteration floor applies only when warmup is enabled at all:
    # the reference's nw = max(3 epochs, 100 iters) belongs to the detect
    # trainer (train.py:338); classify/train.py runs with NO warmup, and
    # warmup_epochs=0 must mean zero (a 100-step floor silently swallows
    # short runs whose total step count is below it)
    if warmup_epochs > 0:
        nw = max(round(warmup_epochs * steps_per_epoch), round(100 / accumulate))
    else:
        nw = 0
    lam = lr_lambda(epochs, lrf, cos_lr)

    def base_lr(step):
        epoch = step / steps_per_epoch
        return lr0 * lam(epoch)

    def lr_weights(step):
        lr = base_lr(step)
        w = jnp.clip(step / max(nw, 1), 0.0, 1.0)
        return jnp.where(step < nw, w * lr, lr)

    def lr_bias(step):
        lr = base_lr(step)
        w = jnp.clip(step / max(nw, 1), 0.0, 1.0)
        return jnp.where(step < nw, warmup_bias_lr + w * (lr - warmup_bias_lr), lr)

    def mom(step):
        w = jnp.clip(step / max(nw, 1), 0.0, 1.0)
        return jnp.where(step < nw, warmup_momentum + w * (momentum - warmup_momentum), momentum)

    return lr_weights, lr_bias, mom, nw


def _group_of(path) -> str:
    """'bias' | 'bn' | 'weight' from a flax param path."""
    keys = [getattr(p, "key", str(p)) for p in path]
    leaf = keys[-1]
    if leaf == "bias":
        return "bias"
    if leaf == "scale" or (len(keys) >= 2 and keys[-2] == "bn"):
        return "bn"
    return "weight"


def group_labels(params):
    return jax.tree_util.tree_map_with_path(lambda p, _: _group_of(p), params)


def freeze_mask(params, freeze):
    """True for params to freeze. `freeze` is N (first N graph layers) or an
    explicit list of layer-name prefixes (reference train.py:216-222)."""
    if isinstance(freeze, int):
        prefixes = tuple(f"layers_{i}" for i in range(freeze))
    else:
        prefixes = tuple(freeze)

    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return any(top == p or top.startswith(p + "_") for p in prefixes)

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(params, hyp, epochs, steps_per_epoch, batch_size,
                    name="sgd", nbs=64, cos_lr=False, clip_norm=10.0,
                    freeze=None):
    """3-group optimizer with warmup schedules; returns an optax tx."""
    accumulate = max(round(nbs / batch_size), 1)
    lr_w, lr_b, mom, nw = make_schedules(hyp, epochs, steps_per_epoch, batch_size,
                                         nbs, cos_lr, accumulate=accumulate)
    decay = hyp.get("weight_decay", 5e-4) * batch_size * accumulate / nbs

    def sgd_group(lr_sched, wd):
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(
            optax.inject_hyperparams(
                lambda learning_rate, momentum: optax.sgd(
                    learning_rate, momentum=momentum, nesterov=True
                )
            )(learning_rate=lr_sched, momentum=mom)
        )
        return optax.chain(*chain)

    def adam_group(lr_sched, wd, adamw=False):
        beta1 = hyp.get("momentum", 0.937)
        if adamw and wd:
            return optax.adamw(lr_sched, b1=beta1, b2=0.999, weight_decay=wd)
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.adam(lr_sched, b1=beta1, b2=0.999))
        return optax.chain(*chain)

    mk = {
        "sgd": lambda lr, wd: sgd_group(lr, wd),
        "adam": lambda lr, wd: adam_group(lr, wd),
        "adamw": lambda lr, wd: adam_group(lr, wd, adamw=True),
    }[name.lower()]

    tx = optax.multi_transform(
        {
            "weight": mk(lr_w, decay),
            "bn": mk(lr_w, 0.0),
            "bias": mk(lr_b, 0.0),
        },
        group_labels(params),
    )
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    if freeze:
        # zero the final update for frozen layers (after decay/momentum so
        # nothing leaks through weight decay)
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), freeze_mask(params, freeze)))
    if accumulate > 1:
        # accumulate ramps 1 -> nbs/bs over warmup (reference train.py:338,
        # 382-390), indexed here by real optimizer updates
        ramp = _accumulate_ramp(accumulate, nw)
        tx = optax.MultiSteps(tx, every_k_schedule=ramp)
    return tx


def _accumulate_ramp(accumulate, nw_updates):
    def k(gradient_step):
        frac = gradient_step / max(nw_updates, 1)
        return jnp.clip(jnp.round(1 + (accumulate - 1) * frac),
                        1, accumulate).astype(jnp.int32)
    return k


class EMAState(NamedTuple):
    params: Any
    batch_stats: Any
    updates: jnp.ndarray  # int32 counter


def ema_init(params, batch_stats):
    # host-side copies: EMA must not alias the live param buffers (aliasing
    # breaks buffer donation in the jitted step), and per-leaf device copies
    # would round-trip a tunneled TPU once per tensor
    import numpy as np

    copy = lambda x: np.array(x, copy=True)
    return EMAState(jax.tree.map(copy, params),
                    jax.tree.map(copy, batch_stats),
                    jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, params, batch_stats, decay=0.9999, tau=2000.0,
               tick=None):
    """d = decay * (1 - exp(-updates/tau)); ema = d*ema + (1-d)*new.

    `tick` (traced bool) gates the blend to real optimizer updates: under
    gradient accumulation the reference's ModelEMA ticks once per optimizer
    step (train.py:419-421), not once per micro-batch."""
    if tick is None:
        tick = jnp.asarray(True)
    updates = state.updates + tick.astype(jnp.int32)
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    d = jnp.where(tick, d, 1.0)  # d=1: EMA unchanged on micro-batches
    blend = lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d)
    return EMAState(
        jax.tree.map(blend, state.params, params),
        jax.tree.map(blend, state.batch_stats, batch_stats),
        updates,
    )
