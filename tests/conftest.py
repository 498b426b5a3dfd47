"""Test harness setup: force CPU with an 8-device virtual mesh.

Multi-chip sharding paths are exercised on virtual CPU devices
(xla_force_host_platform_device_count), per the framework's test strategy for
distributed code without real hardware (SURVEY.md §4). A pytest plugin imports
jax before this conftest runs, so the platform is forced through jax.config
(backends initialize lazily) as well as the environment.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
    assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0xC0FFEE)
