"""Multi-host input-pipeline helpers (single-process + virtual mesh)."""

import numpy as np

from spr_pick_tpu.parallel.dcn import global_batch, host_shard, shard_sizes


def test_host_shard_partition():
    items = list(range(11))
    shards = [host_shard(items, i, 4) for i in range(4)]
    # Disjoint and complete
    flat = sorted(x for s in shards for x in s)
    assert flat == items
    # Round-robin balance: sizes differ by at most 1
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    assert sizes == shard_sizes(11, 4)


def test_host_shard_single_process_identity():
    items = ["a", "b", "c"]
    assert host_shard(items, 0, 1) == items


def test_global_batch_on_mesh(cpu_mesh_devices, rng):
    from spr_pick_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, devices=cpu_mesh_devices)
    local = rng.rand(16, 4, 4).astype(np.float32)
    with mesh:
        arr = global_batch(local, mesh)
    assert arr.shape == (16, 4, 4)
    np.testing.assert_array_equal(np.asarray(arr), local)
    # sharded over the data axis
    assert len(arr.sharding.device_set) == 8


def test_two_host_metric_reduction_matches_global():
    """Simulated two-host eval: each host accumulates metrics over its
    host_shard slice; the vector merge (what allreduce_metrics applies via
    process_allgather) must reproduce the single-host global metrics —
    including a host whose shard has no ground truth (empty PSNR)."""
    from spr_pick_tpu.parallel.dcn import metrics_to_vector, vector_to_metrics
    from spr_pick_tpu.utils.metrics import MetricDict

    rng = np.random.RandomState(0)
    psnrs = rng.rand(5) * 10 + 20  # 5 micrographs; only first 3 have gt
    keys = ["n", "psnr_out"]

    glob = MetricDict()
    for i in range(5):
        glob["n"] += 1
        if i < 3:
            glob["psnr_out"] += psnrs[i]

    merged = None
    for host in range(2):
        hist = MetricDict()
        for i in host_shard(list(range(5)), host, 2):
            hist["n"] += 1
            if i < 3:
                hist["psnr_out"] += psnrs[i]
        vec = metrics_to_vector(hist, keys)
        merged = vec if merged is None else merged + vec

    out = MetricDict()
    vector_to_metrics(out, keys, merged)
    assert out["n"].n == glob["n"].n
    np.testing.assert_allclose(
        out["psnr_out"].accumulated(), glob["psnr_out"].accumulated()
    )
    np.testing.assert_allclose(out["n"].accumulated(), glob["n"].accumulated())


def test_metric_vector_plain_int_n_roundtrip():
    """The trainer keeps its item counter history['n'] as a plain int
    (reset_metrics), not a Metric — the codec must carry it through the
    cross-host sum and restore a plain int."""
    from spr_pick_tpu.parallel.dcn import metrics_to_vector, vector_to_metrics
    from spr_pick_tpu.utils.metrics import MetricDict

    keys = ["n", "psnr_out"]
    hists = []
    for host, count in enumerate((3, 2)):
        hist = MetricDict()
        hist["n"] = 0  # what trainer reset_metrics leaves behind
        hist["n"] += count
        hist["psnr_out"] += 20.0 + host
        hists.append(hist)

    merged = sum(metrics_to_vector(h, keys) for h in hists)
    out = MetricDict()
    out["n"] = 0
    vector_to_metrics(out, keys, merged)
    assert isinstance(out["n"], int) and out["n"] == 5
    np.testing.assert_allclose(out["psnr_out"].accumulated(), 20.5)


def test_repeated_merge_with_base_no_double_count():
    """Two eval windows between resets: after window 1's merge every host
    holds the GLOBAL totals, so window 2 must exchange only the delta
    (the `base` protocol of allreduce_metrics) — a naive re-merge would
    count window 1 once per host."""
    from spr_pick_tpu.parallel.dcn import metrics_to_vector, vector_to_metrics
    from spr_pick_tpu.utils.metrics import MetricDict

    keys = ["n", "psnr_out"]
    n_hosts = 3
    rng = np.random.RandomState(1)
    psnrs = rng.rand(2, n_hosts) * 10 + 20  # [window, host]

    def merge(hists, bases):
        locals_ = [metrics_to_vector(h, keys) for h in hists]
        if bases[0] is not None:
            locals_ = [v - b for v, b in zip(locals_, bases)]
        merged = sum(locals_)
        if bases[0] is not None:
            merged = merged + bases[0]
        for h in hists:
            vector_to_metrics(h, keys, merged)
        return [merged.copy() for _ in hists]

    hists = []
    for _ in range(n_hosts):
        h = MetricDict()
        h["n"] = 0
        hists.append(h)
    bases = [None] * n_hosts

    for w in range(2):
        for host, h in enumerate(hists):
            h["n"] += 1
            h["psnr_out"] += psnrs[w, host]
        bases = merge(hists, bases)

    # Global truth: 2 windows x n_hosts items.
    for h in hists:
        assert h["n"] == 2 * n_hosts
        np.testing.assert_allclose(
            h["psnr_out"].accumulated(), psnrs.mean(), rtol=1e-12
        )


def test_metric_vector_empty_roundtrip():
    from spr_pick_tpu.parallel.dcn import metrics_to_vector, vector_to_metrics
    from spr_pick_tpu.utils.metrics import MetricDict

    hist = MetricDict()
    keys = ["n", "psnr_out"]
    vec = metrics_to_vector(hist, keys)  # all-empty host
    out = MetricDict()
    vector_to_metrics(out, keys, vec)
    assert out["n"].empty() and out["psnr_out"].empty()
