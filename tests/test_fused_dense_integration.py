"""Fused Pallas dense path vs the flax dense path at the Denoiser level.

The reparameterisation noise streams differ between the two paths (flax
derives per-call keys), so full-detect equality is asserted on a model
whose A-head is zeroed (sigma_x == 0 makes z deterministic); the U-Net
out_stats are compared directly.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from spr_pick_tpu import cfg as cfg_mod  # noqa: E402
from spr_pick_tpu.denoiser import Denoiser  # noqa: E402
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue  # noqa: E402


def _denoiser():
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    c[ConfigValue.COMPUTE_DTYPE] = "f32"
    cfg_mod.infer(c, model_only=True)
    return Denoiser(c, mode="joint")


@pytest.mark.slow  # XLA compile dominates (>30 s even cached)
def test_fused_out_stats_match_flax(rng):
    den = _denoiser()
    variables = den.init_variables(seed=0, patch=64)
    inp = jnp.asarray(rng.randn(1, 64, 64, 1).astype(np.float32))
    key = jax.random.PRNGKey(7)

    with jax.default_matmul_precision("highest"):
        den.fused_dense = False
        (want, _), _ = jax.jit(
            lambda v, x, k: den._apply_model(v, x, k, train=False, dense=True)
        )(variables["model"], inp, key)
        den.fused_dense = True
        assert den._can_fuse_dense(inp)
        (got, _), _ = jax.jit(
            lambda v, x, k: den._apply_model(v, x, k, train=False, dense=True)
        )(variables["model"], inp, key)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_fused_detect_exact_with_zeroed_head(rng):
    """Zero the A/mu head so z is deterministic; the whole fused pipeline
    (U-Net + reparameterise + dense detector) must equal the flax path."""
    den = _denoiser()
    variables = den.init_variables(seed=0, patch=64)
    p = variables["model"]["params"]
    oc = p["denoise_branch"]["out_conv"]["conv"]
    oc["kernel"] = jnp.zeros_like(oc["kernel"])
    oc["bias"] = jnp.zeros_like(oc["bias"])

    inp = jnp.asarray(rng.randn(1, 64, 64, 1).astype(np.float32))
    key = jax.random.PRNGKey(3)
    with jax.default_matmul_precision("highest"):
        den.fused_dense = False
        (_, det_want), _ = jax.jit(
            lambda v, x, k: den._apply_model(v, x, k, train=False, dense=True)
        )(variables["model"], inp, key)
        den.fused_dense = True
        (_, det_got), _ = jax.jit(
            lambda v, x, k: den._apply_model(v, x, k, train=False, dense=True)
        )(variables["model"], inp, key)
    np.testing.assert_allclose(
        np.asarray(det_got), np.asarray(det_want), rtol=1e-5, atol=1e-5
    )


def test_fused_precondition_gating():
    den = _denoiser()
    # Rect inputs fuse too now (two-lane rotation fold); only the 32-px
    # pad grid and the fused_dense switch gate the route.
    assert den._can_fuse_dense(jnp.zeros((1, 64, 96, 1)))       # non-square OK
    assert not den._can_fuse_dense(jnp.zeros((1, 48, 48, 1)))   # not %32
    assert not den._can_fuse_dense(jnp.zeros((1, 64, 80, 1)))   # W not %32
    den.fused_dense = False
    assert not den._can_fuse_dense(jnp.zeros((1, 64, 64, 1)))
