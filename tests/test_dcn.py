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
