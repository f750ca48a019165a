"""Test configuration: force an 8-device virtual CPU mesh so every sharding /
collective path is exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must run before jax initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
# Hermetic CI: in-process CLI main() calls enable the persistent compilation
# cache; keep test runs from writing to the user's real ~/.cache unless the
# test itself overrides these (test_compile_cache uses tmp dirs).
os.environ.setdefault("DF_JAX_CACHE", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Some TPU-tunnel environments force jax_platforms via jax.config.update at
# interpreter startup (sitecustomize), which overrides the env var; force it
# back so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
