#!/usr/bin/env python
"""Headline benchmarks: dense joint inference + training throughput.

Workloads (BASELINE.json metrics):

1. "micrographs/sec/chip for 1024^2 tiled inference": blind-spot U-Net
   denoise (mu/sigma + PME, Pallas-fused dense path) + dense per-pixel
   detector heatmap + on-device greedy multipeak NMS (worst case: the
   2048-peak cap is hit), batch of 2 micrographs per step, single chip.
   Only the picks (~24 KB) and a checksum travel to the host — the
   production contract (SURVEY.md §7.3: "ship only the few-hundred
   picks").
2. "train iters/sec": the scan-chunked joint training step (both
   flip-TTA forwards, PU + NLL + consistency losses, Adam, BN stats,
   HBM patch gather), batch 4 of 64^2 patches — the trainer's fast path
   (steps.make_train_scan).

Prints one JSON line per metric; the HEADLINE (inference) line is LAST
and also embeds the training number as an extra key so drivers that
record a single line capture both.

`vs_baseline` compares against the PyTorch reference on CPU (no published
numbers exist; SURVEY.md §6), measured with
tools/measure_reference_baseline.py on this host: 142.8 s/micrograph
dense inference; 3.711 s/iteration training.
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.ops.nms import non_maximum_suppression_multipeak
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue, PipelineOutput
from spr_pick_tpu.steps import init_state, make_train_scan

REFERENCE_CPU_SEC_PER_MICROGRAPH = 142.8
REFERENCE_CPU_SEC_PER_TRAIN_ITER = 3.711

SIZE = 1024
BATCH = 2
N_WARMUP = 2
N_ITERS = 10

TRAIN_BATCH = 4
TRAIN_CROP = 64
TRAIN_K = 64  # steps per scan chunk


def make_denoiser():
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg_mod.infer(c, model_only=True)
    return c, Denoiser(c, mode="joint")


def bench_train(den, state):
    """Scan-chunked train throughput (iters/sec at batch 4)."""
    scan = make_train_scan(den, alpha=0.75, tau=0.01, crop=TRAIN_CROP)
    rng = np.random.RandomState(1)
    n_imgs, hw = 4, 512
    images = jnp.asarray(rng.rand(n_imgs, hw, hw), jnp.float32)
    hms = jnp.asarray(
        (rng.rand(n_imgs, hw, hw) > 0.99).astype(np.float32) * 2 - 1
    )
    half = TRAIN_CROP // 2

    def sample_indices(k):
        r = np.random.RandomState(k)
        flat = r.randint(0, n_imgs, size=(TRAIN_K, TRAIN_BATCH)).astype(np.int32)
        ys = r.randint(half, hw - half, size=(TRAIN_K, TRAIN_BATCH)).astype(np.int32)
        xs = r.randint(half, hw - half, size=(TRAIN_K, TRAIN_BATCH)).astype(np.int32)
        return jnp.asarray(flat), jnp.asarray(ys), jnp.asarray(xs)

    lrs = jnp.full((TRAIN_K,), 1e-4, jnp.float32)
    key = jax.random.PRNGKey(0)

    flat, ys, xs = sample_indices(0)
    state, metrics = scan(state, images, hms, flat, ys, xs, lrs, key)
    _ = float(np.asarray(metrics["loss"])[-1])  # compile + sync

    reps = 3
    t0 = time.time()
    for i in range(reps):
        flat, ys, xs = sample_indices(i + 1)
        state, metrics = scan(state, images, hms, flat, ys, xs, lrs, key)
        _ = float(np.asarray(metrics["loss"])[-1])
    dt = (time.time() - t0) / (reps * TRAIN_K)
    # The scan donates its input state; hand the live one back so the
    # caller's buffers aren't dead.
    return 1.0 / dt, state


def main():
    c, den = make_denoiser()
    state = init_state(den, seed=0, patch=64)
    nms_radius = int(c[ConfigValue.NMS])
    max_peaks = int(c[ConfigValue.MAX_PEAKS])

    train_iters_per_sec, _ = bench_train(den, state)
    # Fresh init for inference: the worst-case-NMS claim (sigmoid ~0.5
    # everywhere -> 2048-peak cap) holds for untrained weights; timing on
    # the just-trained state would quietly lighten the NMS workload.
    state = init_state(den, seed=0, patch=64)
    print(
        json.dumps(
            {
                "metric": "joint train step (batch 4, scan-chunked), single chip",
                "value": round(train_iters_per_sec, 2),
                "unit": "iters/sec",
                "vs_baseline": round(
                    train_iters_per_sec * REFERENCE_CPU_SEC_PER_TRAIN_ITER, 2
                ),
            }
        ),
        flush=True,
    )

    nms = partial(
        non_maximum_suppression_multipeak,
        radius=nms_radius,
        threshold=0.02,
        max_peaks=max_peaks,
    )

    @jax.jit
    def infer(state, inp, rng):
        _, (outputs, _) = den.run_pipeline(
            state.trainable, state.static, {"inp": inp}, rng,
            train=False, dense=True,
        )
        hm = outputs[PipelineOutput.DETECT][..., 0]  # (B, H, W)
        scores, coords, count = jax.vmap(nms)(hm)
        # Denoised image checksum keeps the PME computation live without
        # shipping megabytes to the host.
        checksum = jnp.sum(outputs[PipelineOutput.IMG_DENOISED])
        return checksum, scores, coords, count

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 1), jnp.float32)
    key = jax.random.PRNGKey(0)

    def run_once():
        checksum, scores, coords, count = infer(state, x, key)
        float(checksum)
        np.asarray(scores)
        np.asarray(coords)
        np.asarray(count)

    for _ in range(N_WARMUP):
        run_once()

    t0 = time.time()
    for _ in range(N_ITERS):
        run_once()
    dt = (time.time() - t0) / (N_ITERS * BATCH)

    value = 1.0 / dt
    vs_baseline = value * REFERENCE_CPU_SEC_PER_MICROGRAPH
    print(
        json.dumps(
            {
                "metric": "dense joint 1024^2 inference (denoise+detect+NMS), single chip",
                "value": round(value, 4),
                "unit": "micrographs/sec",
                "vs_baseline": round(vs_baseline, 2),
                "train_iters_per_sec": round(train_iters_per_sec, 2),
                "train_vs_baseline": round(
                    train_iters_per_sec * REFERENCE_CPU_SEC_PER_TRAIN_ITER, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
