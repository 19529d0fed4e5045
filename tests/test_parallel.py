"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

SURVEY.md §4(d): a sharded step must be numerically equal to the
single-chip step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue
from spr_pick_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from spr_pick_tpu.steps import init_state, make_train_step


def _cfg():
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    # Sharding-semantics equality is asserted in f32; bf16 (the production
    # default) amplifies cross-shard reduction-order noise.
    c[ConfigValue.COMPUTE_DTYPE] = "f32"
    cfg_mod.infer(c, model_only=True)
    return c


@pytest.mark.slow
def test_sharded_step_matches_single(cpu_mesh_devices, rng):
    den = Denoiser(_cfg(), mode="joint")

    cpu0 = cpu_mesh_devices[0]
    with jax.default_device(cpu0):
        state = init_state(den, seed=0)
        step = make_train_step(den, alpha=0.75, tau=0.01)

        b = 8
        # patch must exceed the detector RF (63); 64 matches training.
        batch = {
            "inp": jnp.asarray(rng.rand(b, 64, 64, 1), jnp.float32),
            "target": jnp.asarray(
                np.where(np.arange(b) % 2 == 0, 1.0, -1.0), jnp.float32
            ),
        }
        key = jax.random.PRNGKey(0)
        lr = jnp.float32(1e-4)

        # Single-device run
        state1 = jax.device_put(state, cpu0)
        batch1 = jax.device_put(batch, cpu0)
        new1, m1 = step(state1, batch1, key, lr)
        loss1 = np.asarray(m1["loss"])

    # 8-device data-parallel run
    mesh = make_mesh(8, devices=cpu_mesh_devices)
    state8 = replicate(init_state(den, seed=0), mesh)
    batch8 = shard_batch(batch, mesh)
    new8, m8 = step(state8, batch8, replicate(key, mesh), replicate(lr, mesh))
    loss8 = np.asarray(m8["loss"])

    # Reduction order differs across shards (psum of partials); equality is
    # up to float32 accumulation noise.
    np.testing.assert_allclose(loss1, loss8, rtol=1e-3, atol=1e-4)

    # Updated weights equal too
    w1 = np.asarray(
        new1.trainable["model"]["denoise_branch"]["enc1_conv0"]["conv"]["kernel"]
    )
    w8 = np.asarray(
        new8.trainable["model"]["denoise_branch"]["enc1_conv0"]["conv"]["kernel"]
    )
    np.testing.assert_allclose(w1, w8, rtol=1e-3, atol=5e-6)


def test_graft_entry_compiles():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    net_out, detect = out
    assert net_out.shape == (2, 64, 64, 2)
