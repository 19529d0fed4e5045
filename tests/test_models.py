"""Model geometry + blind-spot correctness tests.

These encode the behavioural contracts from SURVEY.md §4:
  (b) shape/receptive-field invariants (blind-spot property, RF width 63,
      input_wh_mul 32) and fill()-equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spr_pick_tpu.models import (
    BlindspotUNet,
    Detector,
    JointNetwork,
    ResNet8,
    rot4_stack,
    rot4_unstack,
    rotate,
    shift_down,
)


def test_rotate_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 8, 3))
    for fwd, inv in zip((0, 90, 180, 270), (0, 270, 180, 90)):
        np.testing.assert_allclose(rotate(rotate(x, fwd), inv), x)


def test_rot4_stack_unstack_shapes():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 1))
    s = rot4_stack(x)
    assert s.shape == (8, 8, 8, 1)
    u = rot4_unstack(s)
    assert u.shape == (2, 8, 8, 4)
    # chunk 0 is the un-rotated original
    np.testing.assert_allclose(u[..., 0:1], x)


def test_shift_down():
    x = jnp.arange(12.0).reshape(1, 3, 4, 1)
    y = shift_down(x, 1)
    np.testing.assert_allclose(np.asarray(y)[0, 0, :, 0], 0.0)
    np.testing.assert_allclose(np.asarray(y)[0, 1:, :, 0], np.asarray(x)[0, :2, :, 0])


@pytest.mark.slow  # XLA compile dominates (>30 s even cached)
def test_unet_shapes():
    model = BlindspotUNet(in_channels=1, out_channels=2, blindspot=True)
    x = jnp.zeros((2, 64, 64, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 64, 64, 2)
    assert model.input_wh_mul == 32


@pytest.mark.slow  # XLA compile dominates (>30 s even cached)
def test_blindspot_property():
    """Output at (r, c) must not depend on input at (r, c).

    The single most important correctness property of the blind-spot net
    (SURVEY.md §7.3).  Probed via the exact jacobian-vector product: perturb
    only the centre pixel and check the output there is unchanged.
    """
    model = BlindspotUNet(in_channels=1, out_channels=2, blindspot=True, levels=3)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x)

    r, c = 13, 17

    def out_at_center(inp):
        return model.apply(params, inp)[0, r, c, :]

    # Gradient of the output at (r,c) wrt the full input:
    g = jax.jacrev(out_at_center)(x)  # (2, 1, 32, 32, 1)
    g_center = np.asarray(g)[:, 0, r, c, 0]
    np.testing.assert_allclose(g_center, 0.0, atol=1e-7)
    # ...but the output does depend on neighbouring pixels.
    assert np.abs(np.asarray(g)).sum() > 0.0


@pytest.mark.slow  # XLA compile dominates (>30 s even cached)
def test_nonblindspot_is_not_blind():
    model = BlindspotUNet(in_channels=1, out_channels=1, blindspot=False, levels=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    r, c = 13, 17

    def out_at_center(inp):
        return model.apply(params, inp)[0, r, c, 0]

    g = jax.grad(out_at_center)(x)
    assert abs(float(g[0, r, c, 0])) > 0.0


def test_resnet8_width_and_stride():
    model = ResNet8()
    assert model.width == 63
    x = jnp.zeros((1, 64, 64, 1))
    vs = model.init(jax.random.PRNGKey(0), x, False)
    y = model.apply(vs, x, False)
    # 64x64 patch -> single spatial logit site (Topaz crop classification).
    assert y.shape == (1, 1, 1, 128)


def test_resnet8_dense_shape():
    model = ResNet8(dense=True)
    x = jnp.zeros((1, 96, 96, 1))
    vs = model.init(jax.random.PRNGKey(0), x, False)
    y = model.apply(vs, x, False)
    # Dense (filled) mode: stride-1 per-pixel output over the full image.
    assert y.shape == (1, 96, 96, 128)


@pytest.mark.slow  # XLA compile dominates (>30 s even cached)
def test_fill_equivalence():
    """Dense (filled) output sampled at the stride-4 grid == strided output.

    Parity property for the reference's fill()/unfill() dilation surgery
    (feature_extractor.py:31-61): both modes share identical weights.
    """
    train_net = ResNet8(bn=False)
    dense_net = ResNet8(bn=False, dense=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 95, 95, 1))
    vs = train_net.init(jax.random.PRNGKey(0), x, False)

    y_strided = train_net.apply(vs, x, False)  # valid convs, stride 4
    y_dense = dense_net.apply(vs, x, False)  # padded, stride 1

    # The strided output's site (i, j) looks at input window starting at
    # (4i, 4j); in the dense padded net the same window is centred at
    # (4i + width//2, 4j + width//2) - width//2 = pixel (4i + 31, ...). With
    # pad = width//2 the dense output index equals the input centre pixel:
    # centre = 4i + 31.
    h_out = y_strided.shape[1]
    idx = 31 + 4 * np.arange(h_out)
    sampled = np.asarray(y_dense)[:, idx][:, :, idx]
    np.testing.assert_allclose(np.asarray(y_strided), sampled, rtol=2e-4, atol=2e-5)


@pytest.mark.slow  # XLA compile dominates (>30 s even cached)
def test_joint_network_shapes():
    model = JointNetwork()
    x = jnp.zeros((2, 64, 64, 1))
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, True
    )
    (out_stats, detect), mutated = model.apply(
        vs, x, True, rngs={"sample": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out_stats.shape == (2, 64, 64, 2)
    assert detect.shape == (2, 1, 1, 1)
    assert "batch_stats" in mutated


@pytest.mark.slow  # XLA compile dominates (>30 s even cached)
def test_joint_network_dense_param_compat():
    """Weights trained in crop mode must load & run in dense mode unchanged."""
    train_model = JointNetwork(dense=False)
    dense_model = JointNetwork(dense=True)
    x = jnp.zeros((1, 64, 64, 1))
    vs = train_model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, True
    )
    X = jnp.zeros((1, 96, 96, 1))
    out_stats, detect = dense_model.apply(
        vs, X, False, rngs={"sample": jax.random.PRNGKey(2)}
    )
    assert out_stats.shape == (1, 96, 96, 2)
    assert detect.shape == (1, 96, 96, 1)
