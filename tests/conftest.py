"""Test configuration.

Sharding tests need a virtual 8-device CPU mesh; model tests run on whatever
backend is fastest (TPU when present, CPU otherwise).  We therefore force 8
host-platform devices (affects only the CPU platform) but do NOT force the
CPU backend globally — sharding tests request `jax.devices("cpu")`
explicitly, which coexists with a TPU default backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: repeated test runs (and the many jit variants
# of the same graphs) skip recompilation.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def cpu_mesh_devices():
    """8 virtual CPU devices for multi-chip sharding tests."""
    import jax

    devices = jax.devices("cpu")
    if len(devices) < 8:
        pytest.skip("virtual CPU mesh unavailable")
    return devices[:8]
