"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU access is single-chip under the driver; multi-chip sharding tests
use XLA's host-platform device virtualization instead.
"""

import os

# The harness pre-sets JAX_PLATFORMS=axon (TPU tunnel) and its sitecustomize
# imports jax at interpreter startup, so env vars are too late here — use
# jax.config directly to force the virtual CPU platform.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
    import random

    random.seed(0)
