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
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    """Time `fn`.  The FIRST output leaf must be tiny (a scalar/few floats):
    pulling it to host is the only reliable completion fence on this
    transport, and bulk outputs would ride the ~25 MB/s tunnel and corrupt
    the measurement (this exact bug produced a 0.008 TFLOP/s "peak" once)."""
    def fence(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    for _ in range(warm):
        fence(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    return (time.time() - t0) / reps


# Spec-sheet peaks per chip, for an absolute MFU datum next to the
# slice-relative one (the attached slice is throttled and drifts 1.5-2x).
_SPEC = {  # substring of device_kind -> (bf16 TFLOP/s, HBM GB/s)
    "v6": (918.0, 1640.0),
    "v5p": (459.0, 2765.0),
    "v5": (197.0, 819.0),     # v5e / v5 lite
    "v4": (275.0, 1228.0),
}


def spec_peaks():
    kind = jax.devices()[0].device_kind.lower()
    for sub, peaks in _SPEC.items():
        if sub in kind:
            return kind, peaks
    return kind, (None, None)


def measured_peaks():
    """Peak bf16 matmul TFLOP/s and HBM r/w GB/s on this chip.

    Both kernels return only scalars (see _time).  The matmul is a chained
    scan so XLA can neither dead-code-eliminate nor narrow it; the
    bandwidth kernel keeps its GiB-scale buffers on device.

    Chain lengths are sized so ONE call runs ~50 ms of device work: the
    axon tunnel adds ~1-5 ms of dispatch latency per call, and a short
    kernel (the old 16-step/2048 chain: ~1.4 ms at spec) measures mostly
    that latency — rounds 1-4 under-reported the peak 2-6x this way (the
    "31 TFLOP/s peak" the round-4 MFU numbers were normalised by; real
    programs in the same sessions sustained 70+).
    """
    n = 4096
    steps = 128  # 2*n^3*steps = 17.6 TFLOP -> ~90 ms at v5e spec
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.full((n, n), 1.0 / n, jnp.bfloat16)  # keeps the chain ~1.0

    @jax.jit
    def mm(a, b):
        def body(c, _):
            return c @ b, None
        c, _ = jax.lax.scan(body, a, None, length=steps)
        return jnp.sum(c.astype(jnp.float32))

    dt = _time(mm, a, b, reps=3)
    tflops = steps * 2 * n ** 3 / dt / 1e12

    big = jnp.ones((256, 1024, 1024), jnp.float32)  # 1 GiB
    bw_steps = 24  # 24 x (read+write 1 GiB) -> ~60 ms at v5e spec

    @jax.jit
    def rw(x):
        def body(y, _):
            return y * 1.000001, None
        y, _ = jax.lax.scan(body, x, None, length=bw_steps)
        return jnp.sum(y[0, 0, :8])

    dt = _time(rw, big, reps=3)
    gbs = bw_steps * 2 * big.size * 4 / dt / 1e9  # read + write per step
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

    kind, (spec_tflops, spec_gbs) = spec_peaks()
    peak_tflops, peak_gbs = measured_peaks()
    print(f"measured peaks (pre): {peak_tflops:.2f} bf16 TFLOP/s, {peak_gbs:.1f} GB/s")

    results = {"device_kind": kind, "spec_tflops": spec_tflops,
               "spec_gbs": spec_gbs, "programs": []}

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
    flat = jnp.asarray(
        rng.randint(0, n_imgs, (TRAIN_K, TRAIN_BATCH)), jnp.int32
    )
    ys = jnp.asarray(rng.randint(32, hw - 32, (TRAIN_K, TRAIN_BATCH)), jnp.int32)
    xs = jnp.asarray(rng.randint(32, hw - 32, (TRAIN_K, TRAIN_BATCH)), jnp.int32)
    labels = jnp.asarray(
        (rng.rand(TRAIN_K, TRAIN_BATCH) > 0.99).astype(np.float32) * 2 - 1
    )
    lrs = jnp.full((TRAIN_K,), 1e-4, jnp.float32)

    # non-donating wrapper so repeated timing calls reuse the same state
    def scan_nodonate(state, images, flat, ys, xs, labels, lrs, key):
        return scan(
            jax.tree_util.tree_map(jnp.copy, state),
            images, flat, ys, xs, labels, lrs, key,
        )

    lowered = scan.lower(state, images, flat, ys, xs, labels, lrs, key)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    for _ in range(2):
        st2, m = scan_nodonate(state, images, flat, ys, xs, labels, lrs, key)
        float(np.asarray(m["loss"])[-1])
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        st2, m = scan_nodonate(state, images, flat, ys, xs, labels, lrs, key)
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

    # Re-measure peaks after the programs and take the max: the tunnel's
    # throttle drifts within a session, and a peak sampled in a slow window
    # would inflate every MFU number above it.
    t2, g2 = measured_peaks()
    print(f"measured peaks (post): {t2:.2f} bf16 TFLOP/s, {g2:.1f} GB/s")
    peak_tflops, peak_gbs = max(peak_tflops, t2), max(peak_gbs, g2)
    results["peak_tflops"], results["peak_gbs"] = peak_tflops, peak_gbs
    print(f"device: {kind}; slice peaks used: {peak_tflops:.2f} TFLOP/s, "
          f"{peak_gbs:.1f} GB/s; spec: {spec_tflops} TFLOP/s, {spec_gbs} GB/s\n")

    print("| program | time | GFLOP | TFLOP/s (slice MFU / spec MFU) "
          "| HBM GB | GB/s (slice / spec) |")
    print("|---|---|---|---|---|---|")
    for p in results["programs"]:
        sm = f"{100*p['achieved_tflops']/spec_tflops:.1f}%" if spec_tflops else "?"
        sg = f"{100*p['achieved_gbs']/spec_gbs:.1f}%" if spec_gbs else "?"
        print(
            f"| {p['label']} | {p['seconds']*1e3:.1f} ms | {p['gflops']:.1f} "
            f"| {p['achieved_tflops']:.2f} "
            f"({100*p['achieved_tflops']/peak_tflops:.0f}% / {sm}) "
            f"| {p['hbm_gb']:.2f} "
            f"| {p['achieved_gbs']:.1f} "
            f"({100*p['achieved_gbs']/peak_gbs:.0f}% / {sg}) |"
        )

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "roofline_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
