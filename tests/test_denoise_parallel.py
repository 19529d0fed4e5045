"""Denoise-scan sharding: the device denoise data plane under the mesh.

Same contract as test_parallel.py (SURVEY.md §4(d)): the K-step denoise
scan with (K, B) crop corners sharded over 'data' must equal the
single-device run — including the in-program noise synthesis and n2v UPS
masking, whose PRNG draws must be sharding-invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.data.noisy import prepare_batch_jax
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm
from spr_pick_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_scan_indices,
)
from spr_pick_tpu.steps import init_state, make_denoise_scan


def test_prepare_batch_jax_sharding_invariant(cpu_mesh_devices):
    """Noise synth + UPS masking produce identical values whether the batch
    is on one device or sharded over 8 — the property the sharded scan
    relies on (per-element counter-based PRNG)."""
    crops = jnp.asarray(
        np.random.RandomState(0).rand(8, 32, 32), jnp.float32
    )
    key = jax.random.PRNGKey(7)

    @jax.jit
    def prep(c):
        return prepare_batch_jax(
            c, NoiseAlgorithm.NOISE_TO_VOID, "gauss25", key, training=True
        )

    cpu0 = cpu_mesh_devices[0]
    with jax.default_device(cpu0):
        want = {k: np.asarray(v) for k, v in
                prep(jax.device_put(crops, cpu0)).items()}

    mesh = make_mesh(8, devices=cpu_mesh_devices)
    got = prep(shard_batch(crops, mesh))
    assert set(got) == {"inp", "ref", "mask"}
    for k in want:
        np.testing.assert_array_equal(want[k], np.asarray(got[k]), err_msg=k)


@pytest.mark.slow
def test_denoise_scan_sharded_matches_single(cpu_mesh_devices, rng):
    """make_denoise_scan (n2c, 32^2 crops) on the 8-device mesh equals the
    single-device run: gather + in-program batch prep + grads psum'd by
    XLA from the sharding annotations alone."""
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.NOISE_TO_CLEAN
    c[ConfigValue.NOISE_STYLE] = "gauss25"
    c[ConfigValue.COMPUTE_DTYPE] = "f32"  # see test_parallel._cfg
    cfg_mod.infer(c, model_only=True)
    den = Denoiser(c, mode="denoise")

    k, b = 2, 8
    images = jnp.asarray(rng.rand(3, 64, 64), jnp.float32)
    flat = jnp.asarray(rng.randint(0, 3, (k, b)), jnp.int32)
    ys = jnp.asarray(rng.randint(0, 32, (k, b)), jnp.int32)
    xs = jnp.asarray(rng.randint(0, 32, (k, b)), jnp.int32)
    lrs = jnp.full((k,), 1e-4, jnp.float32)
    key = jax.random.PRNGKey(3)

    scan = make_denoise_scan(
        den, alpha=0.0, tau=0.0, patch=32,
        algorithm=NoiseAlgorithm.NOISE_TO_CLEAN, noise_style="gauss25",
    )

    cpu0 = cpu_mesh_devices[0]
    with jax.default_device(cpu0):
        state1 = jax.device_put(init_state(den, seed=0, patch=32), cpu0)
        new1, m1 = scan(state1, *(jax.device_put(v, cpu0) for v in
                                  (images, flat, ys, xs, lrs, key)))
        loss1 = np.asarray(m1["loss"])

    mesh = make_mesh(8, devices=cpu_mesh_devices)
    state8 = replicate(init_state(den, seed=0, patch=32), mesh)
    images8, lrs8, key8 = replicate((images, lrs, key), mesh)
    flat8, ys8, xs8 = shard_scan_indices((flat, ys, xs), mesh)
    new8, m8 = scan(state8, images8, flat8, ys8, xs8, lrs8, key8)
    loss8 = np.asarray(m8["loss"])

    np.testing.assert_allclose(loss1, loss8, rtol=1e-3, atol=1e-4)
    w1 = np.asarray(jax.tree_util.tree_leaves(new1.trainable)[0])
    w8 = np.asarray(jax.tree_util.tree_leaves(new8.trainable)[0])
    np.testing.assert_allclose(w1, w8, rtol=1e-3, atol=5e-6)
