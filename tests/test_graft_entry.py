"""Driver-contract regression tests for __graft_entry__.py.

The driver invokes the entry points in a *fresh* process with no env forcing:
    python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
Round 1 failed exactly there (MULTICHIP_r01.json rc=1): the in-container
default backend (axon TPU plugin) was present-but-broken, and the entry fell
back to CPU mesh devices while model.init still dispatched to the default
backend.  These tests reproduce the driver's invocation verbatim — a bare
subprocess whose env carries NO JAX_PLATFORMS / XLA_FLAGS overrides — so any
regression in the platform-forcing logic fails here, not in the driver.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bare_env():
    """The driver's env: whatever the container ships, minus our overrides."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


@pytest.mark.slow
def test_dryrun_multichip_bare_subprocess():
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=_bare_env(), capture_output=True, text=True,
        timeout=1200)
    assert out.returncode == 0, (
        f"driver-style dryrun failed\nstdout: {out.stdout[-2000:]}\n"
        f"stderr: {out.stderr[-2000:]}")
    assert "one DP train step ok" in out.stdout


def test_ensure_n_devices_forces_cpu_when_platform_too_small():
    """In a fresh subprocess with the default (1-device) platform, requesting
    8 devices must yield 8 CPU devices with the default backend switched to
    CPU (so model.init cannot land on a broken default backend)."""
    code = (
        "import __graft_entry__, jax\n"
        "devs = __graft_entry__._ensure_n_devices(8)\n"
        "assert len(devs) >= 8, len(devs)\n"
        "assert devs[0].platform == 'cpu', devs[0].platform\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "print('FORCED-CPU-OK')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         env=_bare_env(), capture_output=True, text=True,
                         timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "FORCED-CPU-OK" in out.stdout
