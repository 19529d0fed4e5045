"""Test configuration.

Sharding tests need a virtual 8-device CPU mesh; model tests run on whatever
backend is fastest (TPU when present, CPU otherwise).  We therefore force 8
host-platform devices (affects only the CPU platform) but do NOT force the
CPU backend globally — sharding tests request `jax.devices("cpu")`
explicitly, which coexists with a TPU default backend.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def _default_backend_alive() -> bool:
    """Probe the default jax backend in a subprocess with a hard timeout.

    In this environment the TPU client reaches the chip through a tunnel
    that sometimes dies or HANGS (init blocks for minutes before an
    UNAVAILABLE) — and a sitecustomize re-selects the TPU platform on every
    interpreter start, so a broken tunnel turns every default-backend test
    red for reasons unrelated to the code.  A subprocess probe is the only
    safe check: an in-process ``jax.devices()`` can hang unrecoverably.
    """
    from spr_pick_tpu.utils.cpuforce import _PLUGIN_TRIGGER_VARS, \
        default_backend_alive

    plat = os.environ.get("JAX_PLATFORMS", "")
    if (
        plat
        and not any(p in plat for p in ("axon", "tpu"))
        and not any(os.environ.get(v) for v in _PLUGIN_TRIGGER_VARS)
    ):
        # Genuinely non-TPU: env asks for e.g. cpu AND no sitecustomize
        # trigger vars that would override it in-process.  (JAX_PLATFORMS
        # alone is NOT trustworthy here — the sitecustomize re-selects the
        # TPU platform via jax.config.update regardless of the env var.)
        return True
    return default_backend_alive(
        timeout=float(os.environ.get("SPR_TPU_PROBE_TIMEOUT", "75"))
    )


_backend_ok = _default_backend_alive()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: repeated test runs (and the many jit variants
# of the same graphs) skip recompilation.
import jax  # noqa: E402

if not _backend_ok:
    # Fall back to CPU for the whole session (overrides the sitecustomize's
    # platform re-selection).  Slower for the `slow` tests, but the suite
    # stays green when the TPU tunnel is down — correctness tests don't
    # care which backend executes them.
    sys.stderr.write(
        "[conftest] default jax backend unreachable -> forcing CPU for "
        "this test session\n"
    )
    jax.config.update("jax_platforms", "cpu")

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


@pytest.fixture
def subprocess_jax_env():
    """Environment for tests that spawn jax-using subprocesses (CLI e2e).

    The in-process CPU fallback above cannot protect a CHILD interpreter:
    it re-runs the sitecustomize and re-selects the dead TPU platform, then
    hangs.  When the backend probe failed, hand children a genuinely
    TPU-free env instead (same neutralisation as the multi-chip dryrun).
    """
    if _backend_ok:
        return dict(os.environ)
    from spr_pick_tpu.utils.cpuforce import cpu_forced_env

    return cpu_forced_env()
