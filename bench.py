#!/usr/bin/env python
"""Headline benchmark: dense joint inference on 1024x1024 micrographs.

Workload (BASELINE.json metric "micrographs/sec/chip for 1024^2 tiled
inference"): blind-spot U-Net denoise (mu/sigma + PME) + dense per-pixel
detector heatmap + on-device greedy NMS, per whole padded micrograph,
single chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "micrographs/sec", "vs_baseline": N}

`vs_baseline` compares against the PyTorch reference running the same dense
inference on CPU (no published numbers exist; SURVEY.md §6).  The
denominator was measured on this machine with
tools/measure_reference_baseline.py (reference JointNetwork.fill() forward,
1024^2, torch CPU).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.ops.nms import non_maximum_suppression
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue, PipelineOutput
from spr_pick_tpu.steps import init_state

# Reference torch-CPU dense 1024^2 joint inference (fill()-ed detector),
# measured with tools/measure_reference_baseline.py on this host:
# 142.8 s/micrograph (torch 2.13 CPU).
REFERENCE_CPU_SEC_PER_MICROGRAPH = 142.8

SIZE = 1024
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

    @jax.jit
    def infer(state, inp, rng):
        _, (outputs, _) = den.run_pipeline(
            state.trainable, state.static, {"inp": inp}, rng,
            train=False, dense=True,
        )
        hm = outputs[PipelineOutput.DETECT][0, :, :, 0]
        scores, coords, count = non_maximum_suppression(
            hm, nms_radius, threshold=0.02, max_peaks=max_peaks
        )
        return outputs[PipelineOutput.IMG_DENOISED], scores, coords, count

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, SIZE, SIZE, 1), jnp.float32)
    key = jax.random.PRNGKey(0)

    def run_once():
        out = infer(state, x, key)
        # Force full host materialisation (block_until_ready alone is not a
        # reliable fence on the axon tunnel platform).
        np.asarray(out[0])
        np.asarray(out[3])

    # Warmup / compile
    for i in range(N_WARMUP):
        run_once()

    t0 = time.time()
    for i in range(N_ITERS):
        run_once()
    dt = (time.time() - t0) / N_ITERS

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
