#!/usr/bin/env python
"""Roofline / MFU analysis for the two headline device programs.

For the dense 1024^2 joint inference step and the scan-chunked train step:
  * FLOPs + HBM bytes from XLA's own cost model (compiled.cost_analysis()),
  * measured wall-clock on the attached chip,
  * achieved TFLOP/s and GB/s vs the chip's MEASURED peaks (a large bf16
    matmul for compute, a large on-device copy for bandwidth) — so the
    numbers are argued against this hardware, not a spec sheet.

Writes a markdown fragment to stdout (pasted into docs/PERF.md) and a JSON
blob to tools/roofline_results.json.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue, PipelineOutput
from spr_pick_tpu.steps import init_state, make_train_scan

SIZE = 1024
BATCH = 2
TRAIN_K = 64
TRAIN_BATCH = 4


def _time(fn, *args, reps=5, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    # tiny host pull is the reliable fence on this transport
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def measured_peaks():
    """Peak bf16 matmul TFLOP/s and HBM copy GB/s on this chip."""
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return a @ b

    dt = _time(mm, a, b)
    tflops = 2 * n ** 3 / dt / 1e12

    big = jnp.ones((256, 1024, 1024), jnp.float32)  # 1 GiB

    @jax.jit
    def copy(x):
        return x * 1.000001

    dt = _time(copy, big)
    gbs = 2 * big.size * 4 / dt / 1e9  # read + write
    return tflops, gbs


def analyse(label, jitted, args):
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    dt = _time(jitted, *args)
    return {
        "label": label,
        "seconds": dt,
        "gflops": flops / 1e9,
        "achieved_tflops": flops / dt / 1e12,
        "hbm_gb": bytes_ / 1e9,
        "achieved_gbs": bytes_ / dt / 1e9,
    }


def main():
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg_mod.infer(c, model_only=True)
    den = Denoiser(c, mode="joint")
    state = init_state(den, seed=0, patch=64)

    peak_tflops, peak_gbs = measured_peaks()
    print(f"measured peaks: {peak_tflops:.2f} bf16 TFLOP/s, {peak_gbs:.1f} GB/s\n")

    results = {"peak_tflops": peak_tflops, "peak_gbs": peak_gbs, "programs": []}

    # Dense inference (forward only; the NMS is latency- not FLOP-bound).
    @jax.jit
    def dense(state, inp, rng):
        _, (outputs, _) = den.run_pipeline(
            state.trainable, state.static, {"inp": inp}, rng,
            train=False, dense=True,
        )
        return jnp.sum(outputs[PipelineOutput.IMG_DENOISED]), jnp.sum(
            outputs[PipelineOutput.DETECT]
        )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 1), jnp.float32)
    key = jax.random.PRNGKey(0)
    r = analyse(f"dense joint fwd {SIZE}^2 x{BATCH}", dense, (state, x, key))
    results["programs"].append(r)

    # Scan-chunked train step
    scan = make_train_scan(den, alpha=0.75, tau=0.01, crop=64)
    n_imgs, hw = 4, 512
    images = jnp.asarray(rng.rand(n_imgs, hw, hw), jnp.float32)
    hms = jnp.asarray((rng.rand(n_imgs, hw, hw) > 0.99).astype(np.float32) * 2 - 1)
    flat = jnp.asarray(
        rng.randint(0, n_imgs, (TRAIN_K, TRAIN_BATCH)), jnp.int32
    )
    ys = jnp.asarray(rng.randint(32, hw - 32, (TRAIN_K, TRAIN_BATCH)), jnp.int32)
    xs = jnp.asarray(rng.randint(32, hw - 32, (TRAIN_K, TRAIN_BATCH)), jnp.int32)
    lrs = jnp.full((TRAIN_K,), 1e-4, jnp.float32)

    # non-donating wrapper so repeated timing calls reuse the same state
    def scan_nodonate(state, images, hms, flat, ys, xs, lrs, key):
        return scan(
            jax.tree_util.tree_map(jnp.copy, state),
            images, hms, flat, ys, xs, lrs, key,
        )

    lowered = scan.lower(state, images, hms, flat, ys, xs, lrs, key)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    for _ in range(2):
        st2, m = scan_nodonate(state, images, hms, flat, ys, xs, lrs, key)
        float(np.asarray(m["loss"])[-1])
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        st2, m = scan_nodonate(state, images, hms, flat, ys, xs, lrs, key)
        float(np.asarray(m["loss"])[-1])
    dt = (time.time() - t0) / reps
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    results["programs"].append({
        "label": f"train scan K={TRAIN_K} batch {TRAIN_BATCH} (64^2)",
        "seconds": dt,
        "gflops": flops / 1e9,
        "achieved_tflops": flops / dt / 1e12,
        "hbm_gb": bytes_ / 1e9,
        "achieved_gbs": bytes_ / dt / 1e9,
    })

    print("| program | time | GFLOP | TFLOP/s (MFU) | HBM GB | GB/s (of peak) |")
    print("|---|---|---|---|---|---|")
    for p in results["programs"]:
        print(
            f"| {p['label']} | {p['seconds']*1e3:.1f} ms | {p['gflops']:.1f} "
            f"| {p['achieved_tflops']:.2f} ({100*p['achieved_tflops']/peak_tflops:.0f}%) "
            f"| {p['hbm_gb']:.2f} "
            f"| {p['achieved_gbs']:.1f} ({100*p['achieved_gbs']/peak_gbs:.0f}%) |"
        )

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "roofline_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
