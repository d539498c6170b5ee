"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's CPU-only CI (SURVEY.md §4) while also exercising
multi-device sharding.  The axon TPU plugin registers itself via
sitecustomize before any of this runs, so the platform override must go
through ``jax.config`` (env vars alone are too late), and the XLA flag
must land before the first backend initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def flowgraph():
    from cyberether_tpu import Flowgraph

    fg = Flowgraph()
    yield fg
    fg.stop()


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "slow: long-running integration tests")
