"""Test harness: run everything on CPU with an 8-device virtual mesh so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).
Must set the env before jax initializes."""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU tunnel
# and a sitecustomize re-registers that backend in every process, so both
# the env var and the jax config must be overridden for hermetic CPU tests.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
