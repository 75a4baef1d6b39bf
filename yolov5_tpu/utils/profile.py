"""Profiling + model summary utilities.

Replaces the reference's Profile context / model_info / torch_utils.profile
(SURVEY.md §5: tracing). FLOPs come from XLA's own cost analysis of the
compiled executable — more truthful than thop-style per-module estimates.
For deep traces use `trace()` which wraps jax.profiler (view with xprof/
tensorboard).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax
import jax.numpy as jnp


class Profile(contextlib.ContextDecorator):
    """Accumulating timer: `with Profile() as dt: ...; dt.t` seconds.
    Forces completion of pending device work on exit when sync=True."""

    def __init__(self, t=0.0, sync=False):
        self.t = t
        self.sync = sync

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            jax.effects_barrier()
        self.dt = time.perf_counter() - self.start
        self.t += self.dt
        return False


def chain_time(fn, args, k=10, reps=3):
    """Steady-state per-call seconds: k chained calls + one forced fetch
    (block_until_ready is unreliable over a tunneled backend)."""
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])
    times = []
    for _rep in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf.ravel()[0])
        times.append((time.perf_counter() - t0) / k)
    return float(np.median(times))


def model_flops(model, imgsz=640, batch=1):
    """FLOPs per image from XLA cost analysis of the compiled forward."""
    x = jnp.zeros((batch, imgsz, imgsz, 3), model.dtype)
    try:
        c = (jax.jit(lambda v, im: model.apply(v, im, train=False))
             .lower(model.variables, x).compile())
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) / batch if ca else 0.0
    except Exception:
        return 0.0


def model_info(model, imgsz=640, verbose=True):
    """Params / GFLOPs / layer summary (reference model_info via ultralytics,
    models/yolo.py:197-199)."""
    n_params = sum(x.size for x in jax.tree.leaves(model.variables["params"]))
    n_layers = len(model.specs)
    gflops = model_flops(model, imgsz) / 1e9
    info = {"layers": n_layers, "parameters": n_params,
            "gflops_per_img": round(gflops, 2), "imgsz": imgsz,
            "stride": list(getattr(model, "stride", ()))}
    if verbose:
        print(f"model summary: {n_layers} graph nodes, "
              f"{n_params / 1e6:.2f}M params, {gflops:.1f} GFLOPs @ {imgsz}px")
    return info


@contextlib.contextmanager
def trace(log_dir="runs/profile"):
    """jax.profiler trace context -> view in xprof / tensorboard."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
