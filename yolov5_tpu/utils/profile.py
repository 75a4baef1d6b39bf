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


def trace_op_table(log_dir="runs/profile", top=30, device_only=True):
    """Aggregate a jax.profiler trace into a per-op time table.

    The reference exposes per-layer timing via `torch_utils.profile`; under
    XLA the truthful unit is the compiled fusion, not the python module, so
    this parses the trace the `trace()` context wrote and returns
    [(name, calls, total_ms)] sorted by total time. Works for TPU and CPU
    traces (xprof's trace.json.gz export).
    """
    import collections
    import glob
    import gzip
    import json

    files = sorted(glob.glob(
        str(log_dir) + "/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace under {log_dir} - run trace() first")
    with gzip.open(files[-1]) as f:
        events = json.load(f).get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    if device_only:
        keep = {p for p, n in pids.items()
                if "TPU" in n or "GPU" in n or "/device" in n}
        if not keep:  # CPU traces label differently; fall back to everything
            keep = set(pids)
    else:
        keep = set(pids)
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in keep:
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    return [(n, cnt[n], d / 1e3) for n, d in dur.most_common(top)]


def profile_model(model, imgsz=640, batch=1, log_dir="runs/profile", top=25):
    """Trace one forward pass and print the per-fusion time table."""
    x = jnp.zeros((batch, imgsz, imgsz, 3), model.dtype)
    fn = jax.jit(lambda v, im: model.apply(v, im, train=False))
    out = fn(model.variables, x)  # compile outside the trace
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    with trace(log_dir):
        out = fn(model.variables, x)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    rows = trace_op_table(log_dir, top=top)
    print(f"{'op':60s} {'calls':>6s} {'ms':>9s}")
    for n, c, ms in rows:
        print(f"{n[:60]:60s} {c:6d} {ms:9.3f}")
    return rows
