"""Checkpoint interop: torch .pt import and conv+BN fusion.

Two jobs:

1. `fuse_conv_bn(variables)` — fold BatchNorm into the preceding conv at the
   parameter level, producing variables for a `fused=True` model build. Same
   math as the reference's `fuse_conv_and_bn` (torch_utils.py:224-254):
     w' = w * gamma / sqrt(var + eps),  b' = beta - gamma * mean / sqrt(var + eps)

2. `load_torch_state_dict(path)` / `import_torch_weights(model, sd)` — read a
   reference-format .pt checkpoint and map its names onto our flax tree:
     model.{i}.cv1.conv.weight  ->  layers_{i}/cv1/conv/kernel  (NCHW->HWIO)
     model.{i}.bn.{weight,bias,running_mean,running_var}
        -> params bn/{scale,bias} + batch_stats bn/{mean,var}
   The .pt unpickler is permissive: reference checkpoints pickle whole
   nn.Module objects whose classes we don't ship, so unknown classes
   deserialize into inert stubs and tensors are harvested from their
   _parameters/_buffers dicts.
"""

from __future__ import annotations

import io
import pickle
from typing import Any

import jax.numpy as jnp
import numpy as np

from yolov5_tpu.models.layers import BN_EPS


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------

def fuse_conv_bn(variables) -> dict:
    """Fold every {conv, bn} sibling pair in the variables pytree.

    Returns a new variables dict with params-only (no batch_stats), where each
    folded conv gains a bias. Feed these to a model built with fused=True.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p, s):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict) and "conv" in v and "bn" in v:
                out[k] = dict(v)
                bs = s.get(k, {}).get("bn", {}) if isinstance(s, dict) else {}
                out[k]["conv"] = _fold(v["conv"], v["bn"], bs)
                out[k] = {kk: vv for kk, vv in out[k].items() if kk != "bn"}
                # recurse into remaining siblings (e.g. nested blocks)
                for kk, vv in v.items():
                    if kk not in ("conv", "bn") and isinstance(vv, dict):
                        out[k][kk] = walk({kk: vv}, s.get(k, {}) if isinstance(s, dict) else {})[kk]
            elif isinstance(v, dict):
                out[k] = walk(v, s.get(k, {}) if isinstance(s, dict) else {})
            else:
                out[k] = v
        return out

    return {"params": walk(params, stats)}


def _fold(conv: dict, bn: dict, bn_stats: dict) -> dict:
    kernel = np.asarray(conv["kernel"], np.float32)  # (kh, kw, cin/g, cout)
    gamma = np.asarray(bn["scale"], np.float32)
    beta = np.asarray(bn["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    scale = gamma / np.sqrt(var + BN_EPS)
    fused_kernel = kernel * scale  # broadcast over cout (last axis)
    prior_bias = np.asarray(conv["bias"], np.float32) if "bias" in conv else 0.0
    fused_bias = beta + (prior_bias - mean) * scale
    return {"kernel": jnp.asarray(fused_kernel), "bias": jnp.asarray(fused_bias)}


# ---------------------------------------------------------------------------
# Permissive torch .pt loading
# ---------------------------------------------------------------------------

class _Stub:
    """Inert stand-in for any un-importable pickled class."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    def __call__(self, *a, **k):  # some pickles call factory objects
        return self


def _permissive_torch_load(path):
    """torch.load with unknown classes mapped to stubs (cpu only)."""
    import torch

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith(("torch", "collections", "builtins", "numpy", "argparse", "pathlib")):
                try:
                    return super().find_class(module, name)
                except (ImportError, AttributeError):
                    pass
            return type(name, (_Stub,), {"__module__": module})

    shim = type("shim", (), {"Unpickler": Unpickler, "load": None})
    return torch.load(path, map_location="cpu", pickle_module=shim, weights_only=False)


def _harvest_tensors(obj, prefix="", out=None, seen=None):
    """Recursively collect tensors from stubbed nn.Module object graphs."""
    import torch

    out = {} if out is None else out
    seen = set() if seen is None else seen
    if id(obj) in seen:
        return out
    seen.add(id(obj))
    if isinstance(obj, torch.Tensor):
        out[prefix.rstrip(".")] = obj.detach().float().numpy()
        return out
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return out
    for coll in ("_parameters", "_buffers"):
        for k, v in (d.get(coll) or {}).items():
            if v is not None and isinstance(v, torch.Tensor):
                out[prefix + k] = v.detach().float().numpy()
    for k, v in (d.get("_modules") or {}).items():
        _harvest_tensors(v, prefix + k + ".", out, seen)
    return out


def load_torch_state_dict(path, prefer_ema=True):
    """Load a reference-format checkpoint to {name: np.ndarray}.

    Handles: plain state_dicts, {'model': module} dicts, and EMA selection
    (reference attempt_load picks ckpt['ema'] or ckpt['model'],
    models/experimental.py:70).
    """
    import torch

    ckpt = _permissive_torch_load(path)
    if isinstance(ckpt, dict):
        cand = None
        if prefer_ema and ckpt.get("ema") is not None:
            cand = ckpt["ema"]
        elif "model" in ckpt:
            cand = ckpt["model"]
        if cand is None:
            cand = ckpt
        if isinstance(cand, dict):  # already a state_dict
            return {k: (v.detach().float().numpy() if isinstance(v, torch.Tensor) else v)
                    for k, v in cand.items() if isinstance(v, torch.Tensor)}
        return _harvest_tensors(cand)
    return _harvest_tensors(ckpt)


# ---------------------------------------------------------------------------
# Name mapping torch -> flax
# ---------------------------------------------------------------------------

def _set_in(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_key_to_flax(key: str):
    """Map one torch state_dict key to (collection, flax path list, transform).

    transform is one of: 'conv' (NCHW->HWIO), 'linear' (transpose), None.
    Returns None for keys with no flax counterpart (num_batches_tracked, ...).
    """
    if key.endswith("num_batches_tracked") or key.endswith("anchors") or key.endswith("anchor_grid"):
        return None
    parts = key.split(".")
    if parts[0] == "model":
        parts = parts[1:]
    # model.{i}.rest -> layers_{i}
    out: list[str] = []
    i = 0
    if parts and parts[0].isdigit():
        out.append(f"layers_{parts[0]}")
        i = 1
    leaf = parts[-1]
    mids = parts[i:-1]
    j = 0
    while j < len(mids):
        p = mids[j]
        # torch Sequential/list indices merge with their parent name: m.0 -> m_0
        if j + 1 < len(mids) and mids[j + 1].isdigit():
            out.append(f"{p}_{mids[j + 1]}")
            j += 2
        elif p.isdigit():
            out.append(f"seq_{p}")
            j += 1
        else:
            out.append(p)
            j += 1

    if leaf == "weight":
        # disambiguate conv vs bn vs linear by the enclosing module name
        tail = out[-1] if out else ""
        if tail == "bn" or tail.endswith("_bn"):
            return ("params", out + ["scale"], None)
        if tail == "linear" or tail in {"q", "k", "v", "fc1", "fc2"}:
            return ("params", out + ["kernel"], "linear")
        return ("params", out + ["kernel"], "conv")
    if leaf == "bias":
        return ("params", out + ["bias"], None)
    if leaf == "running_mean":
        return ("batch_stats", out + ["mean"], None)
    if leaf == "running_var":
        return ("batch_stats", out + ["var"], None)
    return None


def import_torch_weights(model, state_dict: dict, strict=False):
    """Convert a torch state_dict into this model's variables pytree.

    ``model`` is a task model (has .variables) or a raw variables dict.
    Detect head convs (model.{i}.m.{j}.weight, 1x1 with bias) are plain convs
    and flow through the standard mapping. Returns new variables; unmatched
    keys are reported (and raise if strict).
    """
    variables = model if isinstance(model, dict) else model.variables
    new_params: dict = {}
    new_stats: dict = {}
    missed = []
    for k, v in state_dict.items():
        m = torch_key_to_flax(k)
        if m is None:
            continue
        coll, path, tf = m
        if tf == "conv":
            if v.ndim == 4:
                v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
            elif v.ndim == 2:
                v = v.T
        elif tf == "linear":
            v = v.T
        _set_in(new_params if coll == "params" else new_stats, path, jnp.asarray(v))

    # verify against the model's own tree and keep model values for anything
    # the checkpoint doesn't provide (intersect_dicts semantics, general.py)
    def merge(ours, theirs, path=""):
        out = {}
        for k, v in ours.items():
            if isinstance(v, dict):
                out[k] = merge(v, theirs.get(k, {}), f"{path}/{k}")
            elif k in theirs:
                if theirs[k].shape != v.shape:
                    missed.append(f"shape mismatch {path}/{k}: {theirs[k].shape} vs {v.shape}")
                    out[k] = v
                else:
                    out[k] = theirs[k].astype(v.dtype)
            else:
                missed.append(f"missing {path}/{k}")
                out[k] = v
        return out

    vars_out = {"params": merge(variables["params"], new_params)}
    if "batch_stats" in variables:
        vars_out["batch_stats"] = merge(variables["batch_stats"], new_stats)
    if missed and strict:
        raise ValueError("weight import mismatches:\n" + "\n".join(missed[:50]))
    return vars_out, missed
