"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no automated tests (SURVEY.md §4); we build the test
infrastructure it lacks.  Multi-device sharding is exercised with
``--xla_force_host_platform_device_count=8`` CPU fakes, which JAX supports
natively — this must be configured before jax initializes, hence here.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# something in this image pins the axon TPU platform regardless of
# JAX_PLATFORMS; the config update below reliably forces CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
