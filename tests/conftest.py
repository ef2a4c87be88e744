"""Test bootstrap: force CPU with 8 fake devices BEFORE jax initializes.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(`xla_force_host_platform_device_count`), the standard JAX mechanism —
SURVEY.md §4 (distributed tests). Real-TPU runs use bench.py, not pytest.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel) which is far too slow for the test matrix, and the axon
# sitecustomize overrides the env var via jax.config.update at interpreter
# start — so we must update the config back after importing jax.
os.environ["JAX_PLATFORMS"] = "cpu"
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
    return np.random.default_rng(0)
