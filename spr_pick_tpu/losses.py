"""Loss functions: ssdn NLL/PME, PU losses, focal, JS divergence, n2v mask.

Parity: `spr_pick/utils/losses.py` and the NLL/PME math inlined in
`spr_pick/denoiser_v2.py:448-519,760-823`.  All functions are pure and
static-shaped so they jit cleanly; the reference's dynamic ``N = #unlabeled``
in the PU generalised-expectation penalty is handled with masking over a
static ``0..B`` count vector, and ``scipy.stats.binom.logpmf`` is re-derived
from ``lgamma`` on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Matches the `_sigmoid` clamp at denoiser_v2.py:32-34.
SIGMOID_EPS = 1e-4


def clamped_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jax.nn.sigmoid(x), SIGMOID_EPS, 1.0 - SIGMOID_EPS)


# ---------------------------------------------------------------------------
# ssdn negative log-likelihood + posterior mean estimate (1 channel)
# ---------------------------------------------------------------------------

def gaussian_nll_pme(
    noisy_in: jnp.ndarray,
    mu_x: jnp.ndarray,
    sigma_x: jnp.ndarray,
    noise_std: jnp.ndarray,
    known_noise: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-channel Gaussian NLL loss and posterior mean estimate.

    Parity: denoiser_v2.py:448-462 —
      sigma_n = noise_std**2
      sigma_y = sigma_x + sigma_n
      loss    = (y - mu)^2 / sigma_y + log(sigma_y)  [- 0.05 * noise_std]
      pme     = (y * sigma_x + mu * sigma_n) / (sigma_x + sigma_n)

    Returns (loss_map, pme, net_std, noise_std_map).
    """
    sigma_n = noise_std ** 2
    sigma_y = sigma_x + sigma_n
    loss_out = ((noisy_in - mu_x) ** 2) / sigma_y + jnp.log(sigma_y)
    pme_out = (noisy_in * sigma_x + mu_x * sigma_n) / (sigma_x + sigma_n)
    net_std_out = jnp.sqrt(sigma_x)
    noise_std_out = jnp.broadcast_to(noise_std, noisy_in.shape)
    if not known_noise:
        loss_out = loss_out - 0.05 * noise_std  # balance regularisation
    return loss_out, pme_out, net_std_out, noise_std_out


def full_cov_nll_pme(
    noisy_in: jnp.ndarray,
    mu_x: jnp.ndarray,
    sigma_x: jnp.ndarray,
    noise_std: jnp.ndarray,
    known_noise: bool = False,
):
    """3-channel full-covariance NLL/PME.

    Parity: denoiser_v2.py:778-823.  Layout (TPU-native NHWC):
      noisy_in, mu_x: (B, H, W, 3);  sigma_x: (B, H, W, 3, 3) = A^T A;
      noise_std: broadcastable (B, H, W, 3) per-channel std.
    """
    c = noisy_in.shape[-1]
    eye = jnp.eye(c)
    i_eps = eye * 1e-6

    sigma_n = (noise_std ** 2)[..., None] * eye  # BHWCC diagonal
    sigma_y = sigma_x + sigma_n

    sigma_y_inv = jnp.linalg.inv(sigma_y)
    diff = noisy_in - mu_x  # BHWC
    # v^T M v
    vtmv = jnp.einsum("...i,...ij,...j->...", diff, sigma_y_inv, diff)
    dets = jnp.maximum(jnp.linalg.det(sigma_y), 0.0)
    loss_out = 0.5 * jnp.log(dets) + 0.5 * vtmv  # BHW
    if not known_noise:
        loss_out = loss_out - 0.1 * jnp.mean(noise_std, axis=-1)

    sigma_x_inv = jnp.linalg.inv(sigma_x + i_eps)
    sigma_n_inv = jnp.linalg.inv(sigma_n + i_eps)
    pme_c1 = jnp.linalg.inv(sigma_x_inv + sigma_n_inv + i_eps)
    pme_c2 = jnp.einsum("...ij,...j->...i", sigma_x_inv, mu_x) + jnp.einsum(
        "...ij,...j->...i", sigma_n_inv, noisy_in
    )
    pme_out = jnp.einsum("...ij,...j->...i", pme_c1, pme_c2)  # BHWC

    net_std_out = jnp.maximum(jnp.linalg.det(sigma_x), 0.0) ** (1.0 / 6.0)
    noise_std_out = jnp.maximum(jnp.linalg.det(sigma_n), 0.0) ** (1.0 / 6.0)
    return loss_out, pme_out, net_std_out, noise_std_out


def softplus_noise_remap(noise_est: jnp.ndarray) -> jnp.ndarray:
    """softplus(x - 4) + 1e-3 — keeps the noise estimate positive, starting
    near zero.  Parity: denoiser_v2.py:399-402."""
    return jax.nn.softplus(noise_est - 4.0) + 1e-3


# ---------------------------------------------------------------------------
# Positive-unlabeled loss with generalised-expectation binomial penalty
# ---------------------------------------------------------------------------

def binom_logpmf(k: jnp.ndarray, n: jnp.ndarray, p: float) -> jnp.ndarray:
    """log Binomial(k; n, p) via lgamma (device-side replacement for
    scipy.stats.binom.logpmf at losses.py:326)."""
    k = k.astype(jnp.float32)
    n = jnp.asarray(n, jnp.float32)
    return (
        jax.lax.lgamma(n + 1.0)
        - jax.lax.lgamma(k + 1.0)
        - jax.lax.lgamma(jnp.maximum(n - k, 0.0) + 1.0)
        + k * jnp.log(p)
        + (n - k) * jnp.log1p(-p)
    )


def bce(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross entropy on probabilities (torch nn.BCELoss
    semantics, soft targets allowed)."""
    return -(target * jnp.log(pred) + (1.0 - target) * jnp.log(1.0 - pred))


def pu_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    tau: float,
    slack: float = 4.0,
    entropy_penalty: float = 0.0,
) -> jnp.ndarray:
    """PU loss: BCE on labeled coords + slack * GE binomial penalty.

    Parity: `pu_loss` at losses.py:303-341 (called with criteria=BCELoss,
    slack=4 via the `PuLoss` wrapper, losses.py:343-349; call site
    denoiser_v2.py:323-328).

      labeled  : y >= 0 -> BCE(pred, y), mean over labeled
      unlabeled: y == -1 -> q_mu = sum p, q_var = sum p(1-p)
                 q_discrete = softmax_k(-(q_mu - k)^2 / (2 q_var)), k = 0..N
                 ge = -sum_k logBinom(k; N, tau) * q_discrete

    Static-shape treatment: k runs over 0..B (B = flattened batch size) and
    entries k > N are masked out of the softmax.
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    b = pred.shape[0]

    labeled = (target >= 0).astype(pred.dtype)
    n_labeled = jnp.sum(labeled)
    cls_elem = bce(pred, jnp.clip(target, 0.0, 1.0)) * labeled
    classifier_loss = jnp.where(n_labeled > 0, jnp.sum(cls_elem) / jnp.maximum(n_labeled, 1.0), 0.0)

    unlabeled = (target == -1).astype(pred.dtype)
    n_unlabeled = jnp.sum(unlabeled)
    p_hat = pred * unlabeled
    q_mu = jnp.sum(p_hat)
    q_var = jnp.sum(p_hat * (1.0 - p_hat))

    k = jnp.arange(0, b + 1, dtype=pred.dtype)
    valid = (k <= n_unlabeled).astype(pred.dtype)
    logits = -0.5 * (q_mu - k) ** 2 / (q_var + 1e-7)
    logits = jnp.where(valid > 0, logits, -jnp.inf)
    q_discrete = jax.nn.softmax(logits)

    log_binom = binom_logpmf(k, n_unlabeled, tau)
    log_binom = jnp.where(valid > 0, log_binom, 0.0)
    ge_penalty = -jnp.sum(log_binom * q_discrete)

    if entropy_penalty > 0:
        q_entropy = 0.5 * (jnp.log(q_var) + jnp.log(2 * jnp.pi) + 1.0)
        ge_penalty = ge_penalty + q_entropy * entropy_penalty

    return classifier_loss + slack * ge_penalty


def modified_pu_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    tau: float,
    slack: float = 1.0,
    entropy_penalty: float = 0.0,
) -> jnp.ndarray:
    """Per-patch GE variant: focal classifier on patches containing positives
    + binomial GE over patch-mean scores of all-unlabeled patches.

    Parity: losses.py:252-300.  ``pred``/``target`` are (B, H, W, 1) maps.
    Static-shape version masks instead of boolean-indexing.
    """
    b = pred.shape[0]
    t_flat = target.reshape(b, -1)
    p_flat = pred.reshape(b, -1)
    has_pos = (jnp.sum(t_flat, axis=1) > 0).astype(pred.dtype)  # per item

    # Classifier (focal) loss over items with positives.
    item_mask = has_pos[:, None]
    cls = _focal_elements(p_flat, t_flat)
    # focal normalisation: by number of pos pixels across selected items
    pos_inds = (t_flat == 1).astype(pred.dtype) * item_mask
    num_pos = jnp.sum(pos_inds)
    cls_sum = jnp.sum(cls * item_mask)
    classifier_loss = jnp.where(num_pos > 0, cls_sum / jnp.maximum(num_pos, 1.0), cls_sum)

    # GE penalty over all-unlabeled patches (patch-mean scores).
    un_mask = 1.0 - has_pos
    n = jnp.sum(un_mask)
    p_mean = jnp.mean(p_flat, axis=1) * un_mask
    q_mu = jnp.sum(p_mean)
    q_var = jnp.sum(p_mean * (1.0 - p_mean) * un_mask)
    k = jnp.arange(0, b + 1, dtype=pred.dtype)
    valid = (k <= n).astype(pred.dtype)
    logits = -0.5 * (q_mu - k) ** 2 / (q_var + 1e-7)
    logits = jnp.where(valid > 0, logits, -jnp.inf)
    q_discrete = jax.nn.softmax(logits)
    log_binom = jnp.where(valid > 0, binom_logpmf(k, n, tau), 0.0)
    ge = -jnp.sum(log_binom * q_discrete)
    if entropy_penalty > 0:
        ge = ge + 0.5 * (jnp.log(q_var) + jnp.log(2 * jnp.pi) + 1.0) * entropy_penalty
    ge = ge / jnp.maximum(n, 1.0)
    return classifier_loss + slack * ge


# ---------------------------------------------------------------------------
# Focal losses (CornerNet style)
# ---------------------------------------------------------------------------

def _focal_elements(pred, gt):
    """Summed CornerNet focal elements (negated, pre-normalisation)."""
    pos_inds = (gt == 1).astype(pred.dtype)
    neg_inds = (gt < 1).astype(pred.dtype)
    neg_weights = (1.0 - gt) ** 4
    pos_loss = jnp.log(pred) * (1.0 - pred) ** 2 * pos_inds
    neg_loss = jnp.log(1.0 - pred) * pred ** 2 * neg_weights * neg_inds
    return -(pos_loss + neg_loss)


def focal_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """CornerNet modified focal loss.  Parity: `_neg_loss`, losses.py:20-60."""
    pos_inds = (gt == 1).astype(pred.dtype)
    neg_inds = (gt < 1).astype(pred.dtype)
    neg_weights = (1.0 - gt) ** 4
    pos_loss = jnp.sum(jnp.log(pred) * (1.0 - pred) ** 2 * pos_inds)
    neg_loss = jnp.sum(jnp.log(1.0 - pred) * pred ** 2 * neg_weights * neg_inds)
    num_pos = jnp.sum(pos_inds)
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def pu_focal_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    tau: float,
    beta: float = 0.0,
    gamma: float = 1.0,
) -> jnp.ndarray:
    """Focal-style PU risk with soft labels and beta clip.

    Parity: `_pu_neg_loss` (losses.py:126-184) behind the `PULoss` wrapper.
    """
    true_pos = (gt > 0.5).astype(pred.dtype)
    other = (gt < 1).astype(pred.dtype)
    soft_pos = ((gt > 0.5).astype(pred.dtype) == other).astype(pred.dtype)
    unlabeled = (gt == -1).astype(pred.dtype)

    num_pos = jnp.sum(true_pos)
    num_soft = jnp.sum(soft_pos)
    num_un = jnp.sum(unlabeled)

    soft_pow_w = (1.0 - gt) ** 4
    soft_pow_neg_w = gt ** 4

    pos_loss = jnp.sum(jnp.log(pred) * (1.0 - pred) ** 2 * true_pos)
    soft_pos_loss = jnp.sum(jnp.log(1.0 - pred) * pred ** 2 * soft_pow_w * soft_pos)
    pos_loss_tot = -pos_loss / jnp.maximum(num_pos, 1.0) - soft_pos_loss / jnp.maximum(num_soft, 1.0)
    pos_risk = pos_loss_tot * tau

    neg_pos_loss = jnp.sum(jnp.log(1.0 - pred) * pred ** 2 * true_pos)
    neg_soft = jnp.sum(jnp.log(pred) * (1.0 - pred) ** 2 * soft_pow_neg_w * soft_pos)
    neg_pos_risk = -neg_pos_loss / jnp.maximum(num_pos, 1.0) - neg_soft / jnp.maximum(num_soft, 1.0)

    unlabeled_loss = -jnp.sum(pred ** 2 * jnp.log(1.0 - pred) * unlabeled)
    unlabeled_risk = unlabeled_loss / jnp.maximum(num_un, 1.0)

    neg_risk_total = -tau * neg_pos_risk + unlabeled_risk
    return jnp.where(neg_risk_total < -beta, pos_risk, pos_risk + neg_risk_total)


# ---------------------------------------------------------------------------
# JS divergence over heatmaps
# ---------------------------------------------------------------------------

def _kl_div_2d(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    # D_KL(P || Q), inputs BHWC treated as (B*C, H*W) distributions.
    b = p.shape[0]
    c = p.shape[-1]
    pf = jnp.moveaxis(p, -1, 1).reshape(b * c, -1)
    qf = jnp.moveaxis(q, -1, 1).reshape(b * c, -1)
    kl = pf * (jnp.log(pf) - jnp.log(qf))
    return jnp.sum(kl, axis=-1).reshape(b, c)


def js_div_loss_2d(inp: jnp.ndarray, target: jnp.ndarray, reduction: str = "mean"):
    """Jensen-Shannon divergence between heatmaps.

    Parity: losses.py:200-248 (note the reference computes JSD(target||input)).
    """
    p, q = target, inp
    m = 0.5 * (p + q)
    js = 0.5 * _kl_div_2d(p, m) + 0.5 * _kl_div_2d(q, m)
    if reduction == "none":
        return js
    return jnp.mean(js) if reduction == "mean" else jnp.sum(js)


# ---------------------------------------------------------------------------
# n2v masked MSE
# ---------------------------------------------------------------------------

def masked_mse(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """MSE only on masked (UPS-manipulated) pixels, summed per item.

    TPU-native replacement for the coordinate-list loop at
    spr_pick/utils/n2v_loss.py:6-17: the mask is a dense 0/1 map (gather-free,
    static shape), value = sum over masked pixels of squared error.
    """
    sq = (target - pred) ** 2 * mask
    return jnp.sum(sq.reshape(sq.shape[0], -1), axis=1, keepdims=True)


def mse_per_item(pred: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Per-item mean MSE (n2c/n2n).  Parity: denoiser_v2.py:209-226."""
    sq = (pred - ref) ** 2
    return jnp.mean(sq.reshape(sq.shape[0], -1), axis=1, keepdims=True)
