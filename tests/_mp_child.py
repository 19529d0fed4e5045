"""Child program for the TRUE multi-process DCN test (test_multiprocess.py).

Runs as one of N OS processes joined via ``jax.distributed.initialize``
over localhost with gloo CPU collectives — the real ``jax.process_count()
== N`` runtime that the simulated two-host tests in test_dcn.py stand in
for.  Exercises ONLY production code from ``spr_pick_tpu.parallel``:
``process_info``/``host_shard`` (real process indices), ``global_batch``
(per-host blocks -> one global sharded array), ``replicate``/``shard_batch``
(cross-process device_put), a jitted grad step whose gradient all-reduce
XLA inserts across the process boundary, and ``allreduce_metrics``
including the two-window ``base`` delta protocol (dcn.py:98-126 — the
``process_allgather`` branch that single-process tests cannot reach).

Writes a JSON result line as the LAST line of stdout (gloo chatters on
stdout); the parent asserts both processes report identical global values
matching a numpy-computed oracle.

Usage: python _mp_child.py <process_id> <num_processes> <port>
"""

import json
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    # Belt and braces: the parent hands us a TPU-free env (cpuforce), but
    # the config update also wins over any sitecustomize re-selection.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )

    import jax.numpy as jnp
    import numpy as np

    from spr_pick_tpu.parallel.dcn import (
        allreduce_metrics,
        global_batch,
        host_shard,
        process_info,
    )
    from spr_pick_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from spr_pick_tpu.utils.metrics import MetricDict

    res = {
        "pid": pid,
        "process_info": list(process_info()),
        "n_global": jax.device_count(),
        "n_local": jax.local_device_count(),
    }
    mesh = make_mesh(devices=jax.devices())

    # --- host_shard with REAL process indices (no explicit index/count).
    res["shard"] = host_shard([f"m{i}" for i in range(10)])

    # --- global_batch: per-host local blocks -> one global array.  Blocks
    # are distinct per host so a wrong assembly cannot cancel out.
    local = np.arange(4 * 6, dtype=np.float32).reshape(4, 6) + 100.0 * pid
    garr = global_batch(local, mesh)
    res["gsum"] = float(jax.jit(jnp.sum)(garr))

    # --- production replicate()/shard_batch() across the process boundary.
    w0 = np.arange(6, dtype=np.float32)
    w_rep = replicate(w0, mesh)
    res["rep_sum"] = float(jax.jit(jnp.sum)(w_rep))
    full = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    res["sb_sum"] = float(jax.jit(jnp.sum)(shard_batch(full, mesh)))

    # --- one jitted GD step on the global batch: params replicated, batch
    # sharded over 8 devices on 2 hosts; jit partitions the loss and inserts
    # the cross-host gradient reduction (ICI within a host, DCN across).
    @jax.jit
    def gd(w, xb):
        def loss(p):
            return jnp.mean((xb @ p) ** 2)

        val, grad = jax.value_and_grad(loss)(w)
        return w - 0.01 * grad, val

    w_new, lval = gd(w_rep, garr)
    res["loss"] = float(lval)
    res["w_new"] = np.asarray(w_new).tolist()

    # --- allreduce_metrics over the REAL process_allgather, two eval
    # windows with the `base` delta protocol between them.
    hist = MetricDict()
    hist["n"] = 0  # plain-int counter, as trainer reset_metrics leaves it
    for it in host_shard(list(range(5))):
        hist["n"] += 1
        hist["psnr_out"] += 20.0 + it
    base = allreduce_metrics(hist, ["n", "psnr_out"], base=None)
    res["w1_n"] = hist["n"]
    res["w1_psnr"] = float(hist["psnr_out"].accumulated())
    for it in host_shard(list(range(5))):
        hist["n"] += 1
        hist["psnr_out"] += 30.0 + it
    allreduce_metrics(hist, ["n", "psnr_out"], base=base)
    res["w2_n"] = hist["n"]
    res["w2_psnr"] = float(hist["psnr_out"].accumulated())

    print(json.dumps(res))


if __name__ == "__main__":
    main()
