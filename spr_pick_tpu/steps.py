"""Jit-compiled train / eval step factories.

The reference's hot loop (train.py:282-362: zero_grad / run_pipeline /
backward / step) becomes ONE pure function
``train_step(state, batch, rng, lr) -> (state, metrics)`` that XLA compiles
end-to-end: both forwards (flip-TTA), all losses, Adam update and BN running
stats in a single fused program.  Data parallelism falls out of jit +
sharding annotations (see spr_pick_tpu/parallel).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.params import PipelineOutput


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    trainable: Any  # {'model': params, 'sigma': params?, 'l_params': {...}?}
    static: Any     # {'model': batch_stats?, 'sigma': batch_stats?}
    opt_state: Any


def make_optimizer() -> optax.GradientTransformation:
    # Adam with reduced beta2, parity with train.py:140
    # (optim.Adam(betas=[0.9, 0.99])); lr applied separately per step so the
    # cosine ramp (train.py:430-442) stays outside the optimizer state.
    return optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8)


def init_state(denoiser: Denoiser, seed: int = 0, patch: int = 64) -> TrainState:
    variables = denoiser.init_variables(seed=seed, patch=patch)
    trainable, static = Denoiser.split_trainable(variables)
    tx = make_optimizer()
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        static=static,
        opt_state=tx.init(trainable),
    )


def _grad_update(denoiser, tx, state: TrainState, batch: Dict, key, lr,
                 alpha: float, tau: float):
    """One forward/backward/Adam/BN update; shared by the per-step and both
    scan factories.  Returns (new_state, pipeline outputs)."""

    def loss_fn(trainable):
        loss, (outputs, bn_updates) = denoiser.run_pipeline(
            trainable, state.static, batch, key, alpha, tau, train=True
        )
        return loss, (outputs, bn_updates)

    (_, (outputs, bn_updates)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.trainable)

    updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    trainable = optax.apply_updates(state.trainable, updates)

    static = state.static
    if bn_updates is not None:
        static = dict(static)
        static["model"] = bn_updates

    new_state = TrainState(
        step=state.step + 1,
        trainable=trainable,
        static=static,
        opt_state=opt_state,
    )
    return new_state, outputs


def _collect_metrics(outputs: Dict, mean: bool = False) -> Dict:
    """Host-facing metric dict from pipeline outputs.  ``mean=True`` reduces
    per-item losses to scalars (scan paths stack them over K steps)."""
    reduce = jnp.mean if mean else (lambda x: x)
    metrics = {"loss": reduce(outputs[PipelineOutput.LOSS])}
    for key in (
        PipelineOutput.DENOISE_LOSS,
        PipelineOutput.DETECT_LOSS,
        PipelineOutput.AUG_LOSS,
    ):
        if key in outputs:
            metrics[key.value] = reduce(outputs[key])
    for key in (PipelineOutput.NOISE_STD_DEV, PipelineOutput.MODEL_STD_DEV):
        if key in outputs:
            metrics[key.value] = jnp.mean(outputs[key])
    return metrics


def make_train_step(denoiser: Denoiser, alpha: float, tau: float):
    """Build the jitted joint/denoise training step."""
    tx = make_optimizer()

    def train_step(state: TrainState, batch: Dict, rng: jax.Array, lr: jnp.ndarray):
        new_state, outputs = _grad_update(
            denoiser, tx, state, batch, rng, lr, alpha, tau
        )
        return new_state, _collect_metrics(outputs)

    return jax.jit(train_step, donate_argnums=(0,))


def make_train_scan(denoiser: Denoiser, alpha: float, tau: float, crop: int):
    """K train steps + the HBM patch gather compiled into ONE XLA program.

    The host's only per-chunk work is sampling K*B packed indices (numpy)
    and shipping three (K, B) int32 arrays; the gather from the
    device-resident micrograph/heatmap stacks, the flip augment, both
    flip-TTA forwards, losses, Adam and BN updates for all K steps run as a
    single `lax.scan` — no per-step dispatch at all.
    """
    tx = make_optimizer()
    half = crop // 2

    def scan_steps(state: TrainState, images, hms, flat, ys, xs, lrs, rng):
        """images/hms: (N, H, W) device stacks; flat/ys/xs: (K, B) int32;
        lrs: (K,); rng: base key."""

        def gather(n, y, x, flip):
            patch = jax.lax.dynamic_slice(
                images[n], (y - half, x - half), (crop, crop)
            )
            patch = jnp.where(flip > 0, jnp.flip(patch, axis=1), patch)
            return patch, hms[n, y, x]

        def body(state, inputs):
            f, y, x, lr, key = inputs
            k_flip, k_step = jax.random.split(key)
            flips = jax.random.bernoulli(k_flip, 0.5, (f.shape[0],)).astype(
                jnp.int32
            )
            patches, labels = jax.vmap(gather)(f, y, x, flips)
            batch = {"inp": patches[..., None], "target": labels}
            new_state, outputs = _grad_update(
                denoiser, tx, state, batch, k_step, lr, alpha, tau
            )
            return new_state, _collect_metrics(outputs, mean=True)

        k = flat.shape[0]
        keys = jax.random.split(rng, k)
        state, metrics = jax.lax.scan(
            body, state, (flat, ys, xs, lrs, keys)
        )
        return state, metrics

    return jax.jit(scan_steps, donate_argnums=(0,))


def make_denoise_scan(
    denoiser: Denoiser,
    alpha: float,
    tau: float,
    patch: int,
    algorithm,
    noise_style,
    noise_input: bool = False,
):
    """K denoise-only train steps + crop gather + input/reference
    construction in ONE XLA program — the folder/hdf5 analog of
    make_train_scan.

    flat/ys/xs are (K, B) int32 image indices and crop CORNERS (not centres;
    drawn in-bounds by DeviceDenoisePipeline.sample_coords).  Noise
    synthesis and n2v UPS masking (data/noisy.py:prepare_batch_jax) run per
    scan step from a per-step PRNG key, replacing the reference's host-side
    NoisyDataset prep (datasets/noise_wrapper.py:98-168).
    """
    from spr_pick_tpu.data.noisy import prepare_batch_jax

    tx = make_optimizer()

    def scan_steps(state: TrainState, images, flat, ys, xs, lrs, rng):
        def gather(n, y, x):
            return jax.lax.dynamic_slice(images[n], (y, x), (patch, patch))

        def body(state, inputs):
            f, y, x, lr, key = inputs
            k_prep, k_step = jax.random.split(key)
            crops = jax.vmap(gather)(f, y, x)
            batch = prepare_batch_jax(
                crops, algorithm, noise_style, k_prep,
                training=True, noise_input=noise_input,
            )
            new_state, outputs = _grad_update(
                denoiser, tx, state, batch, k_step, lr, alpha, tau
            )
            return new_state, _collect_metrics(outputs, mean=True)

        k = flat.shape[0]
        keys = jax.random.split(rng, k)
        state, metrics = jax.lax.scan(body, state, (flat, ys, xs, lrs, keys))
        return state, metrics

    return jax.jit(scan_steps, donate_argnums=(0,))


def make_eval_step(denoiser: Denoiser, dense: bool = True):
    """Build the jitted dense-inference eval step (no grads, no BN update).

    Equivalent of denoiser.eval(); denoiser.fill() + run_pipeline(train=False)
    at train.py:383-399.
    """

    def eval_step(state: TrainState, batch: Dict, rng: jax.Array):
        _, (outputs, _) = denoiser.run_pipeline(
            state.trainable, state.static, batch, rng, train=False, dense=dense
        )
        return outputs

    return jax.jit(eval_step)
