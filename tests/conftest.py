"""Test configuration.

Platform: this image's axon sitecustomize force-registers the single TPU chip
at interpreter start (PALLAS_AXON_POOL_IPS), so in-process JAX_PLATFORMS
overrides cannot win. Tests are platform-agnostic; multi-device sharding tests
skip when fewer than 8 devices are visible. To run them on the virtual CPU
mesh use:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest tests/

(the flags below still request the 8-device CPU topology for environments
without the axon plugin, e.g. CI containers).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
