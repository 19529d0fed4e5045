"""Optimised dense U-Net (lean XLA program) vs the flax module.

Geometry is verified EXACTLY (f32 compute in the kernels vs the f32 flax
module, 1e-5, under ``jax.default_matmul_precision("highest")`` so the
TPU MXU does not silently drop both paths to bf16 passes): any mis-shift,
wrong rotation mapping, halo error or missing zero-fill produces large
differences.  The bf16 production path is checked against the flax bf16
path with a loose tolerance (different but equally-valid accumulation
orders).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from spr_pick_tpu.models.unet import BlindspotUNet  # noqa: E402


def _setup(s=128, batch=1, out_channels=2, seed=0, dtype=None):
    model = BlindspotUNet(
        in_channels=1, out_channels=out_channels, blindspot=True, levels=5,
        dtype=dtype,
    )
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(batch, s, s, 1).astype(np.float32))
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 1)))[
        "params"
    ]
    return model, params, x


@pytest.mark.slow  # XLA compile dominates (>30 s even cached)
def test_dense_unet_exact_f32():
    from spr_pick_tpu.ops.dense_unet import dense_blindspot_unet

    model, params, x = _setup(s=128)
    with jax.default_matmul_precision("highest"):
        want = np.asarray(model.apply({"params": params}, x))
        got = np.asarray(
            dense_blindspot_unet(
                params, x, out_channels=2, cdtype=jnp.float32,
            )
        )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # XLA compile dominates (>30 s even cached)
def test_dense_unet_batch2_and_tiles():
    """Multiple tiles per image + batch > 1 exercise every rotation rect."""
    from spr_pick_tpu.ops.dense_unet import dense_blindspot_unet

    model, params, x = _setup(s=192, batch=2, seed=1)
    with jax.default_matmul_precision("highest"):
        want = np.asarray(model.apply({"params": params}, x))
        got = np.asarray(
            dense_blindspot_unet(
                params, x, out_channels=2, cdtype=jnp.float32,
            )
        )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # XLA compile dominates (>30 s even cached)
def test_dense_unet_bf16_close():
    from spr_pick_tpu.ops.dense_unet import dense_blindspot_unet

    model, params, x = _setup(s=128, dtype=jnp.bfloat16)
    want = np.asarray(model.apply({"params": params}, x))
    got = np.asarray(
        jax.jit(lambda p, t: dense_blindspot_unet(p, t, out_channels=2))(params, x)
    )
    # bf16 paths with different accumulation order; the signal magnitude
    # here is O(0.1..1).
    assert np.max(np.abs(got - want)) < 0.15
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.999


def test_rect_fold_exact_vs_rot4_on_square():
    """The two-lane rectangular fold must agree with the rot4 fold exactly
    (same convs, different batching) — proven on a square input where both
    paths are defined."""
    from spr_pick_tpu.ops.dense_unet import dense_blindspot_unet

    _, params, x = _setup(s=96, seed=2)
    with jax.default_matmul_precision("highest"):
        rot4 = np.asarray(
            dense_blindspot_unet(params, x, out_channels=2, cdtype=jnp.float32)
        )
        rect = np.asarray(
            dense_blindspot_unet(
                params, x, out_channels=2, cdtype=jnp.float32, force_rect=True
            )
        )
    np.testing.assert_allclose(rect, rot4, rtol=1e-5, atol=1e-5)


def test_rect_dense_rotation_equivariance_exact():
    """Exact oracle for the rectangular two-lane fold, on BOTH orientations.

    The concatenated rotation features satisfy
    ``cat(rot90(x))[k] = rot90(cat(x)[k+1 group])`` — so running the model
    on the 90-degree-rotated rectangle with the head's input-channel
    groups rolled by one must reproduce the rotated output EXACTLY:
    ``dense(p', rot90 x) == rot90(dense(p, x))`` where p' rolls the first
    1x1 head conv's input channels by -96.  Any mis-rotation, lane swap or
    shape bug in the rect path breaks this bit-exactly.

    (No comparison against the square-zero-padded forward: square padding
    genuinely CHANGES the function near edges — the pad band carries
    bias-propagated activations whose distance to the canvas edge differs —
    so that's a semantic difference, not an error; pick-level agreement on
    trained models is covered by the evaluator tests.)
    """
    import copy

    from spr_pick_tpu.models.blindspot import rotate
    from spr_pick_tpu.ops.dense_unet import dense_blindspot_unet

    _, params, _ = _setup(s=64, seed=3)
    rng = np.random.RandomState(3)
    h, w = 96, 160
    x = jnp.asarray(rng.randn(1, h, w, 1).astype(np.float32))

    p_rolled = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    k = p_rolled["out_block_conv0"]["conv"]["kernel"]  # (1, 1, 384, 384)
    p_rolled["out_block_conv0"]["conv"]["kernel"] = np.roll(k, -96, axis=2)

    with jax.default_matmul_precision("highest"):
        out = np.asarray(
            dense_blindspot_unet(params, x, out_channels=2, cdtype=jnp.float32)
        )
        out90 = np.asarray(
            dense_blindspot_unet(
                p_rolled, rotate(x, 90), out_channels=2, cdtype=jnp.float32
            )
        )
    assert out.shape == (1, h, w, 2) and out90.shape == (1, w, h, 2)
    want = np.asarray(rotate(jnp.asarray(out), 90))
    np.testing.assert_allclose(out90, want, rtol=1e-5, atol=1e-5)
