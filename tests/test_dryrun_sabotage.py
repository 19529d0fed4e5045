"""The driver's multi-chip dry run must be genuinely TPU-free.

`__graft_entry__.dryrun_multichip` is the driver's only multi-chip
evidence, and it must stay green even when the resident TPU client is
BROKEN (rounds 1-2 went red exactly this way: the child initialised the
axon backend despite `JAX_PLATFORMS=cpu` because a sitecustomize on
PYTHONPATH re-registers the TPU plugin on every interpreter start —
see spr_pick_tpu/utils/cpuforce.py).

This test runs the dryrun with the TPU tunnel env deliberately
sabotaged (dead pool IP, axon platform forced) and asserts the child
(a) succeeds and (b) never mentions the axon/libtpu stack in stderr —
i.e. the TPU plugin was never registered, not merely lucky.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
_ENTRY = os.path.join(_REPO, "__graft_entry__.py")


@pytest.mark.slow
def test_dryrun_multichip_survives_broken_tpu_env():
    env = dict(os.environ)
    # Sabotage: a dead (non-routable) pool IP and the axon platform
    # forced — an in-child TPU plugin registration would hang or die on
    # this.  The dryrun's cpu_forced_env scrub must neutralise ALL of it.
    env.update(
        PALLAS_AXON_POOL_IPS="10.255.255.1",
        AXON_POOL_SVC_OVERRIDE="10.255.255.1",
        PALLAS_AXON_REMOTE_COMPILE="1",
        JAX_PLATFORMS="axon",
    )
    proc = subprocess.run(
        [sys.executable, _ENTRY, "multichip", "8"],
        env=env,
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, (
        f"dryrun failed under sabotaged TPU env:\n{proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip(8): ok" in proc.stdout
    bad = [
        line
        for line in proc.stderr.splitlines()
        if "axon" in line.lower() or "libtpu" in line.lower()
    ]
    assert not bad, f"child touched the TPU stack:\n" + "\n".join(bad)
