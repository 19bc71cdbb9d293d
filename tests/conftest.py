"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware (the TPU analog
of a fake distributed backend — SURVEY.md §4).

A sitecustomize in this environment may register a TPU PJRT plugin at
interpreter startup; backends initialize lazily, so overriding the platform
here (before any array op touches a backend) still lands every test on the
virtual CPU mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
