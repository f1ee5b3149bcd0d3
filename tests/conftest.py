"""Test config: run everything on an 8-device virtual CPU mesh.

Mirrors SURVEY.md §4's plan — multi-device paths are exercised in CI via
XLA's host-platform device emulation, no TPU needed.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# NOTE: this image's site config pins jax_platforms to "axon,cpu", which makes
# JAX_PLATFORMS=cpu a no-op; JAX_PLATFORM_NAME still wins the backend pick.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: this box has one CPU core and XLA compiles
# are the dominant test cost; cache makes re-runs near-instant.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
