"""AutoBatch: pick the largest batch that fits device memory.

The reference profiles CUDA memory over bs in {1,2,4,8,16} and linear-fits
(utils/autobatch.py:19-71). On TPU, XLA reports per-executable memory
analysis at compile time — so instead of running anything we *compile* the
train step at two batch sizes, read `memory_analysis()`, linear-fit
HBM-vs-batch, and solve for the target fraction of device memory.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def device_memory_bytes(device=None) -> int:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    # v5e default when the runtime doesn't report: 16 GB HBM
    return 16 * 1024**3


def compiled_memory_bytes(fn, *args) -> int:
    """Total temp+output+argument bytes from XLA's memory analysis."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return 0
    total = 0
    for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                 "output_size_in_bytes", "generated_code_size_in_bytes"):
        total += int(getattr(ma, attr, 0) or 0)
    return total


def autobatch(make_fn_and_args, fraction=0.8, probes=(2, 8), max_batch=1024,
              verbose=True):
    """make_fn_and_args(bs) -> (fn, args...). Compiles at two probe sizes,
    fits memory = a + b*bs, returns max bs with memory <= fraction * HBM."""
    limit = device_memory_bytes() * fraction
    xs, ys = [], []
    for bs in probes:
        fn, *args = make_fn_and_args(bs)
        ys.append(compiled_memory_bytes(fn, *args))
        xs.append(bs)
    if ys[-1] == 0:
        if verbose:
            print("autobatch: no memory analysis available, keeping default")
        return None
    b = (ys[1] - ys[0]) / (xs[1] - xs[0])
    a = ys[0] - b * xs[0]
    bs = int((limit - a) / max(b, 1))
    bs = int(2 ** np.floor(np.log2(max(bs, 1))))  # round down to pow2
    bs = max(1, min(bs, max_batch))
    if verbose:
        print(f"autobatch: fit {a / 1e9:.2f}GB + {b / 1e6:.1f}MB/img, "
              f"limit {limit / 1e9:.1f}GB -> batch {bs}")
    return bs
