"""Multi-host (DCN) input pipelines for dataset-scale work.

SURVEY.md §2.7 lists optional "multi-host DCN data parallelism for
dataset-scale eval" as the remaining parallelism axis.  The TPU-native
recipe: each HOST loads only its shard of the micrograph list from its
local filesystem (pure host work — no DCN traffic for pixels), and
per-host batches are assembled into one GLOBAL `jax.Array` laid out over
the full (multi-host) mesh with `jax.make_array_from_process_local_data`
— gradient/eval collectives then ride ICI within each slice and DCN only
for the cross-slice reduction, which XLA schedules automatically.

Single-process environments degrade to the identity (host 0 owns
everything), so the same trainer code runs everywhere; multi-host
correctness of the sharding math is unit-tested, and the global-array
assembly is exercised on the virtual CPU mesh.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spr_pick_tpu.parallel.mesh import DATA_AXIS


def process_info():
    """(process_index, process_count) for the current runtime."""
    return jax.process_index(), jax.process_count()


def host_shard(items: Sequence, index: int = None, count: int = None) -> List:
    """Deterministic round-robin partition of a work list across hosts.

    Round-robin (rather than contiguous blocks) keeps per-host load even
    when micrograph sizes correlate with collection order.  Every item is
    owned by exactly one host; hosts with ``i >= len(items)`` get the
    empty list.
    """
    if index is None or count is None:
        index, count = process_info()
    if count <= 1:
        return list(items)
    return [it for j, it in enumerate(items) if j % count == index]


def shard_sizes(n_items: int, count: int) -> List[int]:
    """Items per host under :func:`host_shard` (for progress accounting)."""
    return [len(range(i, n_items, count)) for i in range(count)]


def metrics_to_vector(history, keys: Sequence[str]) -> np.ndarray:
    """Flatten metric accumulators into a summable float64 vector.

    Layout: [total_k0, ..., total_kn, n_k0, ..., n_kn].  Empty metrics
    contribute zeros, so hosts whose shard never produced a metric (e.g.
    no ground-truth micrographs on that host) merge as no-ops.  Entries
    that are plain numbers rather than Metric objects (the trainer keeps
    its item counter ``history["n"]`` as an int) ride in the totals slot
    with NaN in the count slot as a type marker — NaN survives the
    cross-host sum, so the write-back restores a plain number.
    """
    totals = np.zeros(len(keys), np.float64)
    counts = np.zeros(len(keys), np.float64)
    for j, k in enumerate(keys):
        m = history[k]
        if isinstance(m, (int, float, np.integer, np.floating)):
            totals[j] = float(m)
            counts[j] = np.nan
            continue
        if m.total is not None:
            totals[j] = float(np.asarray(m.total))
        counts[j] = float(m.n)
    return np.concatenate([totals, counts])


def vector_to_metrics(history, keys: Sequence[str], vec: np.ndarray) -> None:
    """Write a (merged) metric vector back into the MetricDict in place."""
    k = len(keys)
    for j, key in enumerate(keys):
        nval = vec[k + j]
        if np.isnan(nval):
            # Plain-number entry (see metrics_to_vector).
            total = float(vec[j])
            history[key] = int(round(total)) if total.is_integer() else total
            continue
        m = history[key]
        n = int(round(nval))
        if n == 0:
            m.reset()
        else:
            m.total = np.asarray(vec[j], np.float64)
            m.n = n


def allreduce_metrics(history, keys: Sequence[str], base=None):
    """Sum metric accumulators across all hosts, in place.

    Identity on single-process runtimes.  ``keys`` must be the same on
    every host (derive them from cfg, not from which metrics happened to
    be touched) — process_allgather aligns by position.  Used by the
    host-sharded evaluator so the logged n/PSNR are GLOBAL, not per-host.

    ``base``: the vector this function returned on the PREVIOUS call over
    the same (un-reset) history.  After a merge every host's history holds
    the GLOBAL totals, so a later merge must exchange only the per-host
    delta accumulated since — re-gathering the full totals would count the
    already-global part once per host.  Returns the new merged vector to
    pass as ``base`` next time (None on single-process runs); callers must
    drop the base whenever the history is reset.
    """
    if jax.process_count() <= 1:
        return None
    from jax.experimental import multihost_utils

    local = metrics_to_vector(history, keys)
    if base is not None:
        # NaN count-markers pass through: nan - nan = nan.
        local = local - base
    merged = np.asarray(multihost_utils.process_allgather(local)).sum(axis=0)
    if base is not None:
        merged = merged + base
    vector_to_metrics(history, keys, merged)
    return merged


def global_batch(local: np.ndarray, mesh: Mesh, axis: str = DATA_AXIS):
    """Assemble per-host local batches into one global sharded array.

    ``local`` is this host's (local_batch, ...) block; the result is a
    global jax.Array of shape (global_batch, ...) sharded along `axis`
    over the mesh.  With one process this is equivalent to
    `shard_batch`; with many, each host contributes only its block and
    no pixel data crosses DCN.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local))
