"""Torch checkpoint import: full-model key coverage round-trip.

Builds a reference-style state_dict for the whole yolov5n graph by inverse
name-mapping from our flax tree (model.{i}.cv1.conv.weight etc., NCHW), then
imports it and checks every parameter landed with the right value."""

import numpy as np
import pytest

import jax

from yolov5_tpu.models import DetectionModel
from yolov5_tpu.models.weights import import_torch_weights, torch_key_to_flax


def flax_path_to_torch_key(path, leaf_shape):
    """Inverse of torch_key_to_flax for the paths our models produce."""
    parts = []
    for p in path:
        k = p.key if hasattr(p, "key") else str(p)
        parts.append(k)
    out = ["model" if parts[0].startswith("layers_") else None]
    rest = []
    for k in parts[:-1]:
        if k.startswith("layers_"):
            rest.append(k.split("_", 1)[1])
        elif "_" in k and k.rsplit("_", 1)[1].isdigit():
            a, b = k.rsplit("_", 1)
            rest.extend([a, b])
        else:
            rest.append(k)
    leaf = parts[-1]
    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}
    return ".".join((["model"] if parts[0].startswith("layers_") else []) + rest
                    + [leaf_map[leaf]])


def make_fake_state_dict(model):
    """Random torch-layout tensors for every flax param/stat leaf."""
    sd = {}
    expect = {}
    rng = np.random.default_rng(0)
    for coll in ("params", "batch_stats"):
        tree = model.variables.get(coll, {})
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            key = flax_path_to_torch_key(path, leaf.shape)
            v = rng.normal(size=leaf.shape).astype(np.float32)
            expect[(coll,) + tuple(p.key for p in path)] = v
            if path[-1].key == "kernel" and v.ndim == 4:
                sd[key] = np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
            elif path[-1].key == "kernel" and v.ndim == 2:
                sd[key] = v.T
            else:
                sd[key] = v
    return sd, expect


def test_full_yolov5n_import_roundtrip():
    model = DetectionModel("yolov5n")
    sd, expect = make_fake_state_dict(model)
    variables, missed = import_torch_weights(model, sd, strict=False)
    assert not missed, f"{len(missed)} unmatched: {missed[:5]}"
    for coll in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for path, leaf in flat:
            key = (coll,) + tuple(p.key for p in path)
            np.testing.assert_array_equal(np.asarray(leaf), expect[key], err_msg=str(key))


def test_mapping_examples():
    assert torch_key_to_flax("model.4.cv1.conv.weight") == (
        "params", ["layers_4", "cv1", "conv", "kernel"], "conv")
    assert torch_key_to_flax("model.4.m.0.cv2.bn.running_var") == (
        "batch_stats", ["layers_4", "m_0", "cv2", "bn", "var"], None)
    assert torch_key_to_flax("model.24.m.1.bias") == (
        "params", ["layers_24", "m_1", "bias"], None)
    assert torch_key_to_flax("model.24.anchors") is None


def test_import_reports_shape_mismatch():
    model = DetectionModel("yolov5n")
    sd = {"model.0.conv.weight": np.zeros((9, 9, 9, 9), np.float32)}
    variables, missed = import_torch_weights(model, sd, strict=False)
    assert any("mismatch" in m for m in missed)
    with pytest.raises(ValueError):
        import_torch_weights(model, sd, strict=True)
