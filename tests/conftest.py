"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware (mirrors how the driver dry-runs
`__graft_entry__.dryrun_multichip`).

Note: the sandbox's sitecustomize force-prepends the 'axon' remote-TPU
platform to JAX_PLATFORMS, so env vars alone don't stick — we must also
update jax.config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
