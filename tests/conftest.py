"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-device sharding logic is
exercised without TPU hardware (SURVEY.md §4).

The container's sitecustomize imports jax (and registers the axon TPU plugin)
at interpreter start with JAX_PLATFORMS=axon, so plain env mutation is too
late — but the backend itself is initialized lazily, so overriding via
jax.config before any array op still wins.
"""

import os

# must precede backend initialization for the 8 virtual CPU devices
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (subprocess dryruns, training)")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run slow-marked tests (full CI-style suite; the "
             "default loop stays < 4 min)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: pass --runslow (or RUN_SLOW=1) to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(3)  # cfg.RNG_SEED parity
