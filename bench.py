#!/usr/bin/env python
"""Headline benchmark: dense joint inference on 1024x1024 micrographs.

Workload (BASELINE.json metric "micrographs/sec/chip for 1024^2 tiled
inference"): blind-spot U-Net denoise (mu/sigma + PME) + dense per-pixel
detector heatmap + on-device greedy NMS (worst case: the 2048-peak cap is
hit), batch of 2 micrographs per step, single chip.  Only the picks
(scores/coords, ~24 KB) and a checksum travel to the host — exactly the
production contract (SURVEY.md §7.3: "ship only the few-hundred picks").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "micrographs/sec", "vs_baseline": N}

`vs_baseline` compares against the PyTorch reference running the same dense
inference on CPU (no published numbers exist; SURVEY.md §6), measured with
tools/measure_reference_baseline.py on this host: 142.8 s/micrograph.
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
from spr_pick_tpu.ops.nms import non_maximum_suppression_blocked
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue, PipelineOutput
from spr_pick_tpu.steps import init_state

REFERENCE_CPU_SEC_PER_MICROGRAPH = 142.8

SIZE = 1024
BATCH = 2
N_WARMUP = 2
N_ITERS = 10


def main():
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg_mod.infer(c, model_only=True)

    den = Denoiser(c, mode="joint")
    state = init_state(den, seed=0, patch=64)
    nms_radius = int(c[ConfigValue.NMS])
    max_peaks = int(c[ConfigValue.MAX_PEAKS])

    nms = partial(
        non_maximum_suppression_blocked,
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
            }
        )
    )


if __name__ == "__main__":
    main()
