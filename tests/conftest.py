"""Test configuration: force an 8-device virtual CPU mesh.

The axon sitecustomize pins JAX_PLATFORMS=axon (single real TPU); tests run on
CPU with 8 virtual devices so multi-chip sharding paths are exercised without
hardware. jax.config.update must happen before any backend initialization.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end app tests")
