"""TRUE multi-process DCN test: 2 OS processes x 4 virtual CPU devices.

The simulated two-host tests (test_dcn.py) exercise the metric-vector
codec with explicit index/count args; this test runs the REAL runtime —
two interpreters joined via ``jax.distributed.initialize`` (gloo CPU
collectives over localhost), a global 8-device mesh spanning both, the
production ``global_batch``/``replicate``/``shard_batch`` placements, a
jitted step whose gradient reduction crosses the process boundary, and
``allreduce_metrics``'s ``process_allgather`` branch (dcn.py:114-126)
that single-process runs short-circuit.  SURVEY.md §2.7 "multi-host DCN
data parallelism"; VERDICT r2 "Missing #3 / component 64".
"""

import json
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

from spr_pick_tpu.utils.cpuforce import cpu_forced_env

_CHILD = os.path.join(os.path.dirname(__file__), "_mp_child.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env(n_local_devices: int) -> dict:
    env = cpu_forced_env(extra_pythonpath=_REPO)
    # conftest force-adds an 8-device flag to the parent's XLA_FLAGS; the
    # children need exactly n_local each, so strip any existing count flag
    # before appending ours (XLA rejects/last-wins ambiguity either way).
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\S+",
        "",
        env.get("XLA_FLAGS", ""),
    )
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={n_local_devices}"
    ).strip()
    return env


def test_two_process_dcn_pipeline():
    nproc, n_local = 2, 4
    port = _free_port()
    env = _child_env(n_local)

    procs = [
        subprocess.Popen(
            [sys.executable, _CHILD, str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
            # gloo logs on stdout; the JSON result is the last line.
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()

    r0, r1 = sorted(outs, key=lambda r: r["pid"])

    # Real multi-process runtime, global device view on both hosts.
    assert r0["process_info"] == [0, 2] and r1["process_info"] == [1, 2]
    for r in (r0, r1):
        assert r["n_global"] == nproc * n_local
        assert r["n_local"] == n_local

    # host_shard with real process indices: disjoint, complete, balanced.
    all_items = sorted(r0["shard"] + r1["shard"])
    assert all_items == sorted(f"m{i}" for i in range(10))
    assert abs(len(r0["shard"]) - len(r1["shard"])) <= 1

    # global_batch assembled the two distinct per-host blocks: both hosts
    # see the sum over the GLOBAL batch (numpy oracle).
    blocks = [
        np.arange(24, dtype=np.float32).reshape(4, 6) + 100.0 * i
        for i in range(nproc)
    ]
    x = np.concatenate(blocks)  # row-major host order == shard order
    assert r0["gsum"] == r1["gsum"] == pytest.approx(float(x.sum()))

    # replicate / shard_batch worked across the process boundary.
    for r in (r0, r1):
        assert r["rep_sum"] == pytest.approx(15.0)
        assert r["sb_sum"] == pytest.approx(float(np.arange(48).sum()))

    # GD step: gradient reduction crossed DCN; both hosts hold the same
    # updated params, equal to the single-host numpy computation.
    w = np.arange(6, dtype=np.float32)
    pred = x @ w
    loss = float(np.mean(pred**2))
    grad = 2.0 * x.T @ pred / x.shape[0]
    w_expect = w - 0.01 * grad
    for r in (r0, r1):
        assert r["loss"] == pytest.approx(loss, rel=1e-5)
        np.testing.assert_allclose(r["w_new"], w_expect, rtol=1e-5)
    assert r0["w_new"] == r1["w_new"]

    # allreduce_metrics via the real process_allgather: window 1 merges to
    # the global mean over items 0..4; window 2 exchanges only the delta
    # (base protocol) — a double count would inflate psnr/n.
    for r in (r0, r1):
        assert r["w1_n"] == 5
        assert r["w1_psnr"] == pytest.approx(np.mean(20.0 + np.arange(5)))
        assert r["w2_n"] == 10
        assert r["w2_psnr"] == pytest.approx(
            np.mean(np.concatenate([20.0 + np.arange(5), 30.0 + np.arange(5)]))
        )
