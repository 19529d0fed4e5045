"""Golden-value loss tests against independent numpy/scipy formulations.

SURVEY.md §4(a): golden-value tests of the math (NLL/PME/PU-loss) against
hand-computed cases.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spr_pick_tpu import losses


def test_gaussian_nll_pme_golden():
    y = jnp.asarray([[0.5]], jnp.float32).reshape(1, 1, 1, 1)
    mu = jnp.asarray([[0.3]], jnp.float32).reshape(1, 1, 1, 1)
    sigma_x = jnp.asarray([[0.04]], jnp.float32).reshape(1, 1, 1, 1)
    noise_std = jnp.asarray([[0.2]], jnp.float32).reshape(1, 1, 1, 1)

    loss, pme, net_std, _ = losses.gaussian_nll_pme(
        y, mu, sigma_x, noise_std, known_noise=True
    )
    sigma_n = 0.2 ** 2
    sigma_y = 0.04 + sigma_n
    expect_loss = (0.5 - 0.3) ** 2 / sigma_y + np.log(sigma_y)
    expect_pme = (0.5 * 0.04 + 0.3 * sigma_n) / (0.04 + sigma_n)
    assert float(np.asarray(loss).squeeze()) == pytest.approx(expect_loss, rel=1e-4)
    assert float(np.asarray(pme).squeeze()) == pytest.approx(expect_pme, rel=1e-4)
    assert float(np.asarray(net_std).squeeze()) == pytest.approx(0.2, rel=1e-5)

    # Unknown noise: -0.05 * noise_std balance regularisation
    loss_u, _, _, _ = losses.gaussian_nll_pme(
        y, mu, sigma_x, noise_std, known_noise=False
    )
    assert float(np.asarray(loss_u).squeeze()) == pytest.approx(expect_loss - 0.05 * 0.2, rel=1e-4)


def test_softplus_noise_remap():
    x = jnp.asarray([0.0, 4.0, 10.0])
    out = np.asarray(losses.softplus_noise_remap(x))
    expect = np.log1p(np.exp(np.asarray([-4.0, 0.0, 6.0]))) + 1e-3
    np.testing.assert_allclose(out, expect, rtol=1e-4)


def test_binom_logpmf_vs_scipy():
    from scipy import stats

    n, p = 37, 0.01
    k = np.arange(0, n + 1)
    expect = stats.binom.logpmf(k, n, p)
    got = np.asarray(losses.binom_logpmf(jnp.asarray(k, jnp.float32), n, p))
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-2)


def _pu_loss_numpy(pred, y, tau, slack=4.0):
    """Independent transliteration of the reference pu_loss math
    (losses.py:303-341) in float64 numpy + scipy."""
    from scipy import stats
    from scipy.special import softmax

    pred = pred.reshape(-1).astype(np.float64)
    y = y.reshape(-1).astype(np.float64)
    sel = y >= 0
    if sel.sum() > 0:
        p, t = pred[sel], y[sel]
        cls = np.mean(-(t * np.log(p) + (1 - t) * np.log(1 - p)))
    else:
        cls = 0.0
    un = y == -1
    n = int(un.sum())
    p_hat = pred[un]
    q_mu = p_hat.sum()
    q_var = np.sum(p_hat * (1 - p_hat))
    k = np.arange(0, n + 1)
    q_disc = softmax(-0.5 * (q_mu - k) ** 2 / (q_var + 1e-7))
    log_binom = stats.binom.logpmf(k, n, tau)
    ge = -np.sum(log_binom * q_disc)
    return cls + slack * ge


def test_pu_loss_vs_reference_math(rng):
    pred = np.clip(rng.rand(16).astype(np.float32), 1e-4, 1 - 1e-4)
    y = np.full(16, -1.0, np.float32)
    y[0] = 1.0
    y[1] = 0.7  # soft positive from the heatmap
    y[2] = 0.0
    expect = _pu_loss_numpy(pred, y, tau=0.05)
    got = float(losses.pu_loss(jnp.asarray(pred), jnp.asarray(y), tau=0.05))
    assert got == pytest.approx(expect, rel=1e-4)


def test_pu_loss_no_labeled(rng):
    pred = np.clip(rng.rand(8).astype(np.float32), 1e-4, 1 - 1e-4)
    y = np.full(8, -1.0, np.float32)
    got = float(losses.pu_loss(jnp.asarray(pred), jnp.asarray(y), tau=0.01))
    expect = _pu_loss_numpy(pred, y, tau=0.01)
    assert got == pytest.approx(expect, rel=1e-4)


def test_focal_loss_golden():
    pred = jnp.asarray([[0.9, 0.2]], jnp.float32)
    gt = jnp.asarray([[1.0, 0.0]], jnp.float32)
    # pos: log(0.9) * (1-0.9)^2 ; neg: log(0.8) * 0.2^2 * (1-0)^4
    pos = np.log(0.9) * 0.01
    neg = np.log(0.8) * 0.04
    expect = -(pos + neg) / 1.0
    assert float(losses.focal_loss(pred, gt)) == pytest.approx(expect, rel=1e-3)


def test_js_div_zero_for_identical():
    p = jnp.full((1, 2, 4, 1), 0.125, jnp.float32)
    assert float(losses.js_div_loss_2d(p, p)) == pytest.approx(0.0, abs=1e-7)


def test_masked_mse():
    pred = jnp.zeros((1, 4, 4, 1))
    tgt = jnp.ones((1, 4, 4, 1))
    mask = jnp.zeros((1, 4, 4, 1)).at[0, 1, 1, 0].set(1.0).at[0, 2, 3, 0].set(1.0)
    assert float(losses.masked_mse(pred, tgt, mask)[0, 0]) == pytest.approx(2.0)


def test_full_cov_nll_matches_scalar_case(rng):
    """3-channel full-cov NLL with a diagonal sigma reduces to per-channel
    scalar NLL (minus the different regulariser constant)."""
    b, h, w, c = 1, 2, 2, 3
    y = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    mu = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    diag = jnp.asarray(rng.rand(b, h, w, c) + 0.5, jnp.float32)
    sigma_x = jnp.zeros((b, h, w, c, c)).at[..., np.arange(c), np.arange(c)].set(diag)
    noise_std = jnp.full((b, h, w, c), 0.3, jnp.float32)

    loss, pme, _, _ = losses.full_cov_nll_pme(y, mu, sigma_x, noise_std, True)
    # Scalar per-channel: 0.5 * sum_c [ log(sig_c) + (y-mu)^2 / sig_c ]
    sig = np.asarray(diag) + 0.09
    expect = 0.5 * np.sum(
        np.log(sig) + (np.asarray(y) - np.asarray(mu)) ** 2 / sig, axis=-1
    )
    np.testing.assert_allclose(np.asarray(loss), expect, rtol=1e-3, atol=1e-4)
    expect_pme = (np.asarray(y) * np.asarray(diag) + np.asarray(mu) * 0.09) / sig
    np.testing.assert_allclose(np.asarray(pme), expect_pme, rtol=5e-3, atol=1e-3)
