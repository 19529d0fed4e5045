"""Pipeline + train-step tests: loss flows, grads move weights, eval runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.params import (
    ConfigValue,
    NoiseAlgorithm,
    NoiseValue,
    PipelineOutput,
)
from spr_pick_tpu.steps import init_state, make_eval_step, make_train_step


def _joint_cfg(noise_value=NoiseValue.UNKNOWN_CONSTANT):
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = noise_value
    cfg_mod.infer(c, model_only=True)
    return c


def _batch(rng, b=2, hw=64):
    inp = jnp.asarray(rng.rand(b, hw, hw, 1), jnp.float32)
    target = jnp.asarray(
        np.concatenate([np.ones((b // 2,)), -np.ones((b - b // 2,))]), jnp.float32
    )
    return {"inp": inp, "target": target}


def test_joint_train_step_runs_and_updates(rng):
    den = Denoiser(_joint_cfg(), mode="joint")
    state = init_state(den, seed=0)
    step = make_train_step(den, alpha=0.75, tau=0.01)
    batch = _batch(rng)
    p0 = state.trainable["model"]["denoise_branch"]["enc1_conv0"]["conv"]["kernel"]
    p0 = np.asarray(p0).copy()
    state2, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.float32(1e-4))
    assert np.isfinite(float(np.mean(metrics["loss"])))
    assert np.isfinite(float(metrics["det_loss"]))
    p1 = np.asarray(
        state2.trainable["model"]["denoise_branch"]["enc1_conv0"]["conv"]["kernel"]
    )
    assert not np.allclose(p0, p1)
    # Learnable sigma updated too (const noise mode)
    assert "l_params" in state2.trainable
    # BatchNorm running stats were updated
    bs0 = state.static  # donated; only check presence on new state
    assert "model" in state2.static


def test_joint_eval_step_dense(rng):
    den = Denoiser(_joint_cfg(), mode="joint")
    state = init_state(den, seed=0)
    ev = make_eval_step(den, dense=True)
    batch = {"inp": jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)}
    out = ev(state, batch, jax.random.PRNGKey(1))
    assert out[PipelineOutput.DETECT].shape == (1, 64, 64, 1)
    assert out[PipelineOutput.IMG_DENOISED].shape == (1, 64, 64, 1)
    hm = np.asarray(out[PipelineOutput.DETECT])
    assert hm.min() >= 1e-4 and hm.max() <= 1 - 1e-4


@pytest.mark.slow  # XLA compile dominates (>30 s even cached)
def test_joint_var_sigma(rng):
    den = Denoiser(_joint_cfg(NoiseValue.UNKNOWN_VARIABLE), mode="joint")
    assert den.sigma_model is not None
    state = init_state(den, seed=0)
    step = make_train_step(den, alpha=0.75, tau=0.01)
    s0 = np.asarray(
        jax.tree_util.tree_leaves(state.trainable["sigma"])[0]
    ).copy()
    state2, metrics = step(state, _batch(rng), jax.random.PRNGKey(0), jnp.float32(1e-4))
    assert np.isfinite(float(np.mean(metrics["loss"])))
    s1 = np.asarray(jax.tree_util.tree_leaves(state2.trainable["sigma"])[0])
    assert not np.allclose(s0, s1)


def test_ssdn_denoise_only(rng):
    den = Denoiser(_joint_cfg(), mode="denoise")
    state = init_state(den, seed=0)
    step = make_train_step(den, alpha=0.0, tau=0.0)
    batch = {"inp": jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)}
    state2, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.float32(1e-4))
    assert np.isfinite(float(np.mean(metrics["loss"])))


def test_n2c_mse_pipeline_learns(rng):
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.NOISE_TO_CLEAN
    c[ConfigValue.NOISE_STYLE] = "gauss25"
    cfg_mod.infer(c, model_only=True)
    den = Denoiser(c, mode="denoise")
    state = init_state(den, seed=0, patch=32)
    step = make_train_step(den, alpha=0.0, tau=0.0)
    clean = jnp.asarray(rng.rand(2, 32, 32, 1), jnp.float32)
    noisy = clean + 0.1 * jnp.asarray(rng.randn(2, 32, 32, 1), jnp.float32)
    batch = {"inp": noisy, "ref": clean}
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i), jnp.float32(1e-3))
        losses.append(float(np.mean(metrics["loss"])))
    assert losses[-1] < losses[0]


def test_n2v_mask_pipeline(rng):
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.NOISE_TO_VOID
    c[ConfigValue.NOISE_STYLE] = "gauss25"
    cfg_mod.infer(c, model_only=True)
    den = Denoiser(c, mode="denoise")
    state = init_state(den, seed=0, patch=32)
    step = make_train_step(den, alpha=0.0, tau=0.0)
    img = jnp.asarray(rng.rand(2, 32, 32, 1), jnp.float32)
    mask = jnp.zeros((2, 32, 32, 1)).at[:, ::5, ::5, :].set(1.0)
    batch = {"inp": img, "ref": img, "mask": mask}
    state2, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.float32(1e-4))
    assert np.isfinite(float(np.mean(metrics["loss"])))


def test_fold_tta_mechanism_matches_sequential(rng):
    """The folded flip-TTA forward (Denoiser.fold_tta, round 5) must wire
    the 2B split / un-flip / losses EXACTLY like the sequential pair.
    With the model stubbed to a deterministic function (no BN, no RNG —
    the only two places where fold semantics legitimately differ, see the
    fold_tta field docstring) the two modes must agree bit-for-bit."""
    c = _joint_cfg()
    batch = _batch(rng, b=4, hw=32)
    key = jax.random.PRNGKey(5)

    def fake_apply(model_vars, inp, rng_, train, dense):
        mu = inp * 2.0 - 0.3
        a = inp * 0.5
        net_out = jnp.concatenate([mu, a], axis=-1)
        hm = jnp.mean(inp, axis=(1, 2), keepdims=True) * 3.0 - 1.0
        return (net_out, hm), None

    losses_out = {}
    for fold in (True, False):
        den = Denoiser(c, mode="joint", fold_tta=fold)
        state = init_state(den, seed=0, patch=32)
        den._apply_model = fake_apply
        loss, (outputs, _) = den.joint_pipeline(
            state.trainable, state.static, batch, key,
            alpha=0.75, tau=0.05, train=True,
        )
        losses_out[fold] = (
            float(loss),
            np.asarray(outputs[PipelineOutput.DETECT]),
            float(np.asarray(outputs[PipelineOutput.AUG_LOSS])),
            float(np.asarray(outputs[PipelineOutput.DETECT_LOSS])),
        )
    assert losses_out[True][0] == losses_out[False][0]
    np.testing.assert_array_equal(losses_out[True][1], losses_out[False][1])
    assert losses_out[True][2] == losses_out[False][2]
    assert losses_out[True][3] == losses_out[False][3]


def test_fold_tta_default_policy(monkeypatch):
    """fold_tta=None resolves from the configured train batch size: the
    fold wins everywhere EXCEPT the reference-default batch 16 (measured
    ~10% regression, docs/PERF.md round 5); SPR_FOLD_TTA overrides."""
    monkeypatch.delenv("SPR_FOLD_TTA", raising=False)
    c = _joint_cfg()
    c[ConfigValue.TRAIN_MINIBATCH_SIZE] = 16
    assert Denoiser(c, mode="joint").fold_tta is False
    c2 = _joint_cfg()
    c2[ConfigValue.TRAIN_MINIBATCH_SIZE] = 4
    assert Denoiser(c2, mode="joint").fold_tta is True
    monkeypatch.setenv("SPR_FOLD_TTA", "1")
    c3 = _joint_cfg()
    c3[ConfigValue.TRAIN_MINIBATCH_SIZE] = 16
    assert Denoiser(c3, mode="joint").fold_tta is True
    monkeypatch.setenv("SPR_FOLD_TTA", "0")
    c4 = _joint_cfg()
    c4[ConfigValue.TRAIN_MINIBATCH_SIZE] = 4
    assert Denoiser(c4, mode="joint").fold_tta is False
    # An explicit constructor value survives when no env override is set.
    monkeypatch.delenv("SPR_FOLD_TTA", raising=False)
    assert Denoiser(c3, mode="joint", fold_tta=True).fold_tta is True


def test_fold_tta_trains(rng):
    """Short folded-TTA training run: loss finite and decreasing-ish, BN
    stats update, grads flow through both halves of the fold.

    64^2 patches (the production crop): the detector's receptive field is
    63, so anything smaller yields an empty heatmap."""
    c = _joint_cfg()
    den = Denoiser(c, mode="joint", fold_tta=True)
    state = init_state(den, seed=0, patch=64)
    step = make_train_step(den, alpha=0.75, tau=0.05)
    key = jax.random.PRNGKey(0)
    bn_before = jax.tree_util.tree_map(
        np.asarray, state.static["model"]
    )
    losses = []
    for i in range(4):
        key, sub = jax.random.split(key)
        batch = _batch(np.random.RandomState(i), b=4, hw=64)
        state, metrics = step(state, batch, sub, jnp.float32(1e-3))
        losses.append(float(np.mean(np.asarray(metrics["loss"]))))
    assert all(np.isfinite(l) for l in losses)
    bn_after = state.static["model"]
    changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(bn_before),
            jax.tree_util.tree_leaves(bn_after),
        )
    )
    assert changed, "detector BN running stats must update under the fold"
