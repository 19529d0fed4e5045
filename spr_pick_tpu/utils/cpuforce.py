"""Build a subprocess environment that can NEVER touch the TPU plugin.

In this environment ``JAX_PLATFORMS=cpu`` alone is not sufficient: a
``sitecustomize`` on ``PYTHONPATH`` registers the TPU PJRT plugin on every
interpreter start and calls ``jax.config.update("jax_platforms", ...)``,
which overrides the env var.  A child that must be genuinely TPU-free (the
multi-chip CPU-mesh dryrun, CLI e2e tests while the TPU tunnel is down)
additionally needs the sitecustomize neutralised: strip its dir from
``PYTHONPATH`` and unset the env vars that trigger plugin registration.

Used by ``__graft_entry__.dryrun_multichip`` (the driver's multi-chip
check — it must stay green even when the resident TPU client is broken,
VERDICT r2 item 1) and by the test suite's subprocess fixtures.
"""

import os
import signal
import subprocess
import sys
from typing import Dict, Optional

#: env vars whose presence makes the sitecustomize register the TPU plugin
_PLUGIN_TRIGGER_VARS = (
    "PALLAS_AXON_POOL_IPS",
    "PALLAS_AXON_REMOTE_COMPILE",
    "AXON_LOOPBACK_RELAY",
    "AXON_POOL_SVC_OVERRIDE",
)


def cpu_forced_env(
    base: Optional[Dict[str, str]] = None,
    n_cpu_devices: Optional[int] = None,
    extra_pythonpath: Optional[str] = None,
) -> Dict[str, str]:
    """Return a copy of ``base`` (default ``os.environ``) forced to CPU.

    - ``JAX_PLATFORMS=cpu``
    - TPU-plugin trigger vars unset (the sitecustomize then no-ops)
    - any PYTHONPATH entry whose basename contains ``axon`` stripped
      (the sitecustomize never imports)
    - optionally ``--xla_force_host_platform_device_count=N`` appended to
      ``XLA_FLAGS`` for a virtual N-device CPU mesh
    """
    env = dict(os.environ if base is None else base)
    env["JAX_PLATFORMS"] = "cpu"
    for var in _PLUGIN_TRIGGER_VARS:
        env.pop(var, None)
    pypath = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in os.path.basename(os.path.normpath(p))
    ]
    if extra_pythonpath:
        pypath.insert(0, extra_pythonpath)
    env["PYTHONPATH"] = os.pathsep.join(pypath)
    if n_cpu_devices is not None:
        xla_flags = env.get("XLA_FLAGS", "")
        xla_flags += f" --xla_force_host_platform_device_count={n_cpu_devices}"
        env["XLA_FLAGS"] = xla_flags.strip()
    return env


def default_backend_alive(timeout: float = 75.0) -> bool:
    """Probe the default jax backend in a subprocess with a hard timeout.

    The TPU client here reaches the chip through a tunnel that sometimes
    dies or HANGS (init blocks for minutes before an UNAVAILABLE), so an
    in-process ``jax.devices()`` can hang unrecoverably — a killable
    subprocess is the only safe check.  Used by the test suite's CPU
    fallback and by bench.py's fail-fast gate.
    """
    # DEVNULL, not PIPE: a hung TPU client leaves threads holding the pipe
    # open and a captured read would block even after killing the child.
    # start_new_session so the kill reaps any helper processes.
    proc = subprocess.Popen(
        [sys.executable, "-c", "import jax; jax.devices()"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    try:
        return proc.wait(timeout=timeout) == 0
    except subprocess.TimeoutExpired:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
        return False
