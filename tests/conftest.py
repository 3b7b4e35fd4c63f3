"""Test configuration: force a virtual 8-device CPU mesh.

Real multi-chip hardware is not available in CI; the sharding/pjit code paths
are exercised on XLA's host platform with 8 virtual devices instead
(SURVEY.md §4 item 4).

Note: the container's sitecustomize registers the axon TPU PJRT plugin at
interpreter startup (before conftest runs), so setting JAX_PLATFORMS in the
environment here is too late — we override via jax.config before any backend
is initialized instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1305)
