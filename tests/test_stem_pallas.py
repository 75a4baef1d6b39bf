"""Pallas stem kernel vs lax.conv oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov5_tpu.ops.stem_pallas import stem_conv, stem_conv_mxuT


def test_stem_kernel_matches_conv(rng):
    B = 2
    x = jnp.asarray(rng.uniform(-1, 1, (B, 640, 640, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(-0.2, 0.2, (6, 6, 3, 32)), jnp.float32)
    b = jnp.asarray(rng.uniform(-0.5, 0.5, (32,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    ref = ref * jax.nn.sigmoid(ref)
    # groups=1 keeps interpret-mode runtime sane; every program exercises
    # the xb (next-block) overlap path, same as larger blockings
    out = stem_conv(x, w, b, interpret=True, groups=1)
    assert out.shape == (B, 320, 320, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_stem_fast_path_param_tree(monkeypatch):
    """The Pallas stem fast path must declare the exact same param tree as
    nn.Conv so fused checkpoints work unchanged under YOLOV5_TPU_STEM_KERNEL."""
    import yolov5_tpu.models.layers as L

    x = jnp.zeros((1, 640, 640, 3), jnp.bfloat16)
    m = L.Conv(32, 6, 2, p=2, fused=True, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    ref = jax.eval_shape(m.init, key, x)
    monkeypatch.setenv("YOLOV5_TPU_STEM_KERNEL", "1")
    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")
    assert L._use_stem_kernel(m, x, train=False)  # gate actually open
    fast = jax.eval_shape(m.init, key, x)
    assert jax.tree_util.tree_structure(ref) == jax.tree_util.tree_structure(fast)
    assert jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), ref) == \
        jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), fast)


def test_stem_kernel_mxuT_matches_conv(rng):
    B = 1
    x = jnp.asarray(rng.uniform(-1, 1, (B, 640, 640, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(-0.2, 0.2, (6, 6, 3, 32)), jnp.float32)
    b = jnp.asarray(rng.uniform(-0.5, 0.5, (32,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    ref = ref * jax.nn.sigmoid(ref)
    out = stem_conv_mxuT(x, w, b, interpret=True, groups=2)
    assert out.shape == (B, 320, 320, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
