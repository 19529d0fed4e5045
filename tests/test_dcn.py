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


def test_metric_vector_empty_roundtrip():
    from spr_pick_tpu.parallel.dcn import metrics_to_vector, vector_to_metrics
    from spr_pick_tpu.utils.metrics import MetricDict

    hist = MetricDict()
    keys = ["n", "psnr_out"]
    vec = metrics_to_vector(hist, keys)  # all-empty host
    out = MetricDict()
    vector_to_metrics(out, keys, vec)
    assert out["n"].empty() and out["psnr_out"].empty()
