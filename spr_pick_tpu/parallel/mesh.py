"""Device mesh + sharding helpers: batch data parallelism over ICI.

The reference's only parallelism is a never-enabled `nn.DataParallel` wrap
(denoiser_v2.py:170-178; SURVEY.md §2.7).  The TPU-native replacement is the
standard JAX recipe: a 1-D `Mesh` over the local chips, parameters
replicated, the batch sharded along its leading axis — `jax.jit` then
partitions the whole train step and inserts the gradient all-reduce over ICI
automatically (computation follows data; no pmap, no hand-written
collectives).

At this model size (~2-3M params) pure data parallelism is optimal: the
psum of ~10 MB of grads per step is negligible against the conv FLOPs.
Spatial (halo-tiled) sharding for giant-micrograph inference lives in
parallel/tiling.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over `n_devices` (default: all local)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a batch pytree with the leading dim sharded over the mesh."""
    def _put(x):
        spec = P(axis) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state / rng) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_stack(stack, mesh: Mesh, axis: str = DATA_AXIS):
    """Shard an (N, ...) data stack over the mesh along N (zero-padding N up
    to a multiple of the axis size), instead of replicating it.

    This is the out-of-core lever for the device data planes: per-chip HBM
    for the micrograph stack drops |mesh|-fold; the scan-chunked train path
    reassembles per-batch patches with a tiny psum
    (steps.make_train_scan_sharded).  Padded entries are all-zero images the
    sampler can never reference (its indices come from real images).

    Pass the HOST (numpy) stack whenever possible: `device_put` with a
    NamedSharding then copies each shard straight to its chip, so the full
    stack never materialises on a single device — the capacity claim only
    holds on that path.  A jnp input (already placed, e.g. replicated)
    is resharded device-to-device instead.
    """
    import jax.numpy as jnp

    d = mesh.shape[axis]
    n = stack.shape[0]
    pad = (-n) % d
    if pad:
        # Pad on whichever side the stack lives: numpy stays on host (the
        # out-of-core path must not round-trip N images through one chip).
        xp = np if isinstance(stack, np.ndarray) else jnp
        stack = xp.concatenate(
            [stack, xp.zeros((pad,) + tuple(stack.shape[1:]), stack.dtype)]
        )
    return jax.device_put(
        stack, NamedSharding(mesh, P(axis, *([None] * (stack.ndim - 1))))
    )


def shard_scan_indices(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """Place (K, B) per-step index arrays with the BATCH dim sharded.

    The scan-chunked train path (steps.make_train_scan) carries K steps of
    B packed sampler indices; sharding dim 1 makes jit partition the
    per-step gather + forward across the mesh while the scan carry
    (params/optimizer) stays replicated — the same step semantics as the
    per-step data-parallel path, with the gradient psum inserted by XLA.
    """
    sharding = NamedSharding(mesh, P(None, axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
