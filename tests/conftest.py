"""Test config: run everything on an 8-device virtual CPU mesh.

Mirrors SURVEY.md §4's plan — multi-device paths are exercised in CI via
XLA's host-platform device emulation, no TPU needed.

GOTCHA (this image): a site pytest plugin imports jax before conftest runs,
so JAX_PLATFORM_NAME/XLA_FLAGS env vars set here are too late for reliable
effect. jax.config.update works any time before backend initialization, so
the CPU pin and the virtual device count go through jax.config instead.
"""

import os
import sys

# Stash the TRUE ambient platform before overwriting, so subprocess tests
# (test_graft_entry) can reconstruct the driver's environment — e.g.
# JAX_PLATFORMS=axon, under which dryrun_multichip must self-pin CPU or die
# with "requested 8 devices, have 1" (the round-1 regression).
os.environ.setdefault("AMBIENT_JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))

# Env vars kept for subprocesses the tests may spawn.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: this box has one CPU core and XLA compiles
# are the dominant test cost; cache makes re-runs near-instant.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.default_backend()
    )
    assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(42)
