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

    The host's only per-chunk work is sampling K*B packed indices (numpy),
    point-reading the K*B centre-pixel labels from its heatmaps
    (DevicePatchPipeline.labels_for — heatmaps never go to device), and
    shipping three (K, B) int32 arrays plus one (K, B) float32 label array;
    the gather from the device-resident micrograph stack, the flip augment,
    both flip-TTA forwards, losses, Adam and BN updates for all K steps run
    as a single `lax.scan` — no per-step dispatch at all.
    """
    tx = make_optimizer()
    half = crop // 2

    def scan_steps(state: TrainState, images, flat, ys, xs, labels, lrs, rng):
        """images: (N, H, W) device stack; flat/ys/xs: (K, B) int32;
        labels: (K, B) float32; lrs: (K,); rng: base key."""

        def gather(n, y, x, flip):
            patch = jax.lax.dynamic_slice(
                images[n], (y - half, x - half), (crop, crop)
            )
            return jnp.where(flip > 0, jnp.flip(patch, axis=1), patch)

        def body(state, inputs):
            f, y, x, lab, lr, key = inputs
            k_flip, k_step = jax.random.split(key)
            flips = jax.random.bernoulli(k_flip, 0.5, (f.shape[0],)).astype(
                jnp.int32
            )
            patches = jax.vmap(gather)(f, y, x, flips)
            batch = {"inp": patches[..., None], "target": lab}
            new_state, outputs = _grad_update(
                denoiser, tx, state, batch, k_step, lr, alpha, tau
            )
            return new_state, _collect_metrics(outputs, mean=True)

        k = flat.shape[0]
        keys = jax.random.split(rng, k)
        state, metrics = jax.lax.scan(
            body, state, (flat, ys, xs, labels, lrs, keys)
        )
        return state, metrics

    return jax.jit(scan_steps, donate_argnums=(0,))


def _sharded_patch_gather(mesh, axis: str, crop: int, centered: bool):
    """Patch gather from a mesh-SHARDED (N/D, H, W) image stack, as an
    explicit shard_map (predictable: no GSPMD all-gather of the full
    stack).  Indices/flips for the whole batch ride an all_gather of four
    (B,) element arrays; each chip slices the patches whose source image
    lives in its stack shard (exact zeros otherwise) and a psum over the
    data axis assembles the batch — B*crop^2 floats per step, trivial on
    ICI.  Non-owner contributions are exactly 0.0, so the assembled batch
    is bit-identical to a replicated-stack gather.

    ``centered=True`` treats (y, x) as patch centres with a joint
    image+label flip bit (the joint TXT plane); ``centered=False`` treats
    them as corners with no flip (the denoise plane).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    half = crop // 2 if centered else 0

    def gather_sharded(limgs, f, y, x, flips):
        # limgs: (N/D, H, W) local stack shard; f/y/x/flips: (B/D,) local.
        d = jax.lax.axis_index(axis)
        nl = limgs.shape[0]
        bl = f.shape[0]
        fg = jax.lax.all_gather(f, axis, tiled=True)       # (B,)
        yg = jax.lax.all_gather(y, axis, tiled=True)
        xg = jax.lax.all_gather(x, axis, tiled=True)
        flg = jax.lax.all_gather(flips, axis, tiled=True)
        rel = fg - d * nl
        own = (rel >= 0) & (rel < nl)

        def one(n, yy, xx, fl, ow):
            patch = jax.lax.dynamic_slice(
                limgs[jnp.clip(n, 0, nl - 1)],
                (yy - half, xx - half), (crop, crop),
            )
            patch = jnp.where(fl > 0, jnp.flip(patch, axis=1), patch)
            return jnp.where(ow, patch, jnp.zeros_like(patch))

        patches = jax.vmap(one)(rel, yg, xg, flg, own)     # (B, crop, crop)
        patches = jax.lax.psum(patches, axis)
        return jax.lax.dynamic_slice_in_dim(patches, d * bl, bl)

    return shard_map(
        gather_sharded, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )


def make_train_scan_sharded(denoiser: Denoiser, alpha: float, tau: float,
                            crop: int, mesh, axis: str = "data"):
    """make_train_scan with the micrograph stack SHARDED over the mesh
    (P(axis) along N) instead of replicated — per-chip HBM for the data
    plane drops |mesh|-fold, so dataset capacity scales with the slice.
    Everything downstream of the shard_map gather (flip-TTA forwards,
    losses, Adam) is the same GSPMD program as make_train_scan.
    """
    tx = make_optimizer()
    sharded_gather = _sharded_patch_gather(mesh, axis, crop, centered=True)

    def scan_steps(state: TrainState, images, flat, ys, xs, labels, lrs, rng):
        """Same signature as make_train_scan's scan_steps; `images` must be
        sharded with parallel.mesh.shard_stack (N padded to |mesh|)."""

        def body(state, inputs):
            f, y, x, lab, lr, key = inputs
            k_flip, k_step = jax.random.split(key)
            flips = jax.random.bernoulli(k_flip, 0.5, (f.shape[0],)).astype(
                jnp.int32
            )
            patches = sharded_gather(images, f, y, x, flips)
            batch = {"inp": patches[..., None], "target": lab}
            new_state, outputs = _grad_update(
                denoiser, tx, state, batch, k_step, lr, alpha, tau
            )
            return new_state, _collect_metrics(outputs, mean=True)

        k = flat.shape[0]
        keys = jax.random.split(rng, k)
        return jax.lax.scan(body, state, (flat, ys, xs, labels, lrs, keys))

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


def make_denoise_scan_sharded(
    denoiser: Denoiser,
    alpha: float,
    tau: float,
    patch: int,
    algorithm,
    noise_style,
    mesh,
    noise_input: bool = False,
    axis: str = "data",
):
    """make_denoise_scan with the image stack SHARDED over the mesh (see
    make_train_scan_sharded) — the folder/hdf5 data plane's out-of-core
    lever under multi-chip training."""
    from spr_pick_tpu.data.noisy import prepare_batch_jax

    tx = make_optimizer()
    sharded_gather = _sharded_patch_gather(mesh, axis, patch, centered=False)

    def scan_steps(state: TrainState, images, flat, ys, xs, lrs, rng):
        def body(state, inputs):
            f, y, x, lr, key = inputs
            k_prep, k_step = jax.random.split(key)
            no_flips = jnp.zeros(f.shape, jnp.int32)
            crops = sharded_gather(images, f, y, x, no_flips)
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
        return jax.lax.scan(body, state, (flat, ys, xs, lrs, keys))

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
