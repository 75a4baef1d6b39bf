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
