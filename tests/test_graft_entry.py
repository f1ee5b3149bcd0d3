"""Regression tests for the driver-facing __graft_entry__ module.

The driver runs ``dryrun_multichip(N)`` in a fresh process with the ambient
environment (which may expose only ONE real TPU chip via the axon tunnel).
Round 1 shipped a dryrun that inherited that backend and died in get_mesh
("requested 8 devices, have 1") — so these tests run the entry points in a
subprocess with the ambient env *untouched*, exactly like the driver does.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ambient_env():
    """The env the driver would use: drop the CPU pins conftest exports and
    restore the TRUE ambient JAX_PLATFORMS (conftest stashes it before
    overwriting — without this, the subprocess inherits conftest's cpu pin
    and the round-1 regression this file exists for is undetectable)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORM_NAME", None)
    ambient = env.pop("AMBIENT_JAX_PLATFORMS", "")
    if ambient:
        env["JAX_PLATFORMS"] = ambient
    else:
        env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    ).strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_subprocess_self_bootstraps():
    """dryrun_multichip(8) must pass even when the ambient backend has <8
    devices — it pins an 8-device virtual CPU backend before jax init."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=_ambient_env(), capture_output=True, text=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout, proc.stdout


def test_entry_compile_check_subprocess():
    """entry() must return a jittable fn + example args (driver compile check)."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import __graft_entry__; fn, args = __graft_entry__.entry();"
         "out = jax.jit(fn)(*args); print('SHAPE', out.shape)"],
        cwd=REPO, env=_ambient_env(), capture_output=True, text=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SHAPE (8, 4)" in proc.stdout, proc.stdout
