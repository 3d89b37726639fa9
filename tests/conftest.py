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
# Persistent compilation cache: the suite is compile-bound (hundreds of jitted
# programs, one CPU core here), and most runs re-compile identical programs.
# Cache them on disk so repeat runs pay only execution (round-2 VERDICT item 3).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
