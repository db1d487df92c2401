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
# persistent compile cache: the jit-compile-heavy tests dominate suite
# wall time on this 1-core host; warm re-runs skip the XLA compiles.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fgt_tpu_xla_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# this host serves first-touch pages at ~9 MB/s; keep the test suite's
# numpy/XLA transients on a grow-once heap (see fgt_tpu/utils/hostmem)
from fgt_tpu.utils.hostmem import retain_heap  # noqa: E402

retain_heap()


def pytest_collection_modifyitems(items):
    """Tier markers: anything not heavy/slow/parity is a unit test, so
    ``pytest -m unit`` is the fast tier and ``-m "not heavy"`` skips the
    compile-heavy modules."""
    for item in items:
        if not any(item.get_closest_marker(m)
                   for m in ("heavy", "slow", "parity")):
            item.add_marker(pytest.mark.unit)


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
    import random

    random.seed(0)
