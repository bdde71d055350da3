"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backend (jax reads XLA_FLAGS
at first backend use; conftest is imported before any test module).
"""

import os

_USE_TPU = os.environ.get("OPENSCENE_TPU_TESTS") == "1"

if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax

if not _USE_TPU:
    # The axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly.
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
