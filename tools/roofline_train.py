#!/usr/bin/env python
"""Per-stage roofline of the LARGE-BATCH joint train step (VERDICT r4 #1).

The dense eval forward reaches ~90% of this slice's measured bf16 matmul
peak while batch-256 training reached ~29% in round 4 — this tool finds
where the other 60% goes.  It times a LADDER of nested programs at batch
256 so consecutive differences isolate each stage of the scan-step body
(steps.py:_grad_update + make_train_scan):

  gather    HBM patch gather + flip augment
  unet      + blind-spot U-Net forward (denoise branch only)
  primary   + reparameterise + detector forward + BN (full fwd, train mode)
  tta       + flip-TTA second forward (the consistency pass)
  loss      + PU + NLL + consistency loss values
  backward  value_and_grad of the full loss (fwd + bwd)
  step      + Adam + BN carry (one full production step)
  scan      K production steps under lax.scan, amortised per step

Each line reports wall ms, XLA-cost-model GFLOP, achieved TFLOP/s, the
share of the measured matmul peak, and the delta vs the previous rung.

Writes tools/roofline_train_results.json and a markdown table to stdout
(pasted into docs/PERF.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from roofline import measured_peaks, spec_peaks  # noqa: E402

from spr_pick_tpu import cfg as cfg_mod  # noqa: E402
from spr_pick_tpu import losses  # noqa: E402
from spr_pick_tpu.denoiser import Denoiser  # noqa: E402
from spr_pick_tpu.models.unet import BlindspotUNet  # noqa: E402
from spr_pick_tpu.params import (  # noqa: E402
    ConfigValue,
    NoiseAlgorithm,
    NoiseValue,
)
from spr_pick_tpu.steps import (  # noqa: E402
    init_state,
    make_train_scan,
    make_train_step,
)

BATCH = int(os.environ.get("ROOFLINE_BATCH", 256))
CROP = 64
K = int(os.environ.get("ROOFLINE_K", 8))
ALPHA, TAU = 0.75, 0.01


def _fence(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


def _time(fn, *args, reps=5, warm=2):
    for _ in range(warm):
        _fence(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _fence(out)
    return (time.time() - t0) / reps


def _flops(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg_mod.infer(c, model_only=True)
    den = Denoiser(c, mode="joint")
    state = init_state(den, seed=0, patch=CROP)

    rng0 = np.random.RandomState(1)
    n_imgs, hw = 4, 512
    images = jnp.asarray(rng0.rand(n_imgs, hw, hw), jnp.float32)
    half = CROP // 2
    flat = jnp.asarray(rng0.randint(0, n_imgs, (BATCH,)), jnp.int32)
    ys = jnp.asarray(rng0.randint(half, hw - half, (BATCH,)), jnp.int32)
    xs = jnp.asarray(rng0.randint(half, hw - half, (BATCH,)), jnp.int32)
    flips = jnp.asarray(rng0.randint(0, 2, (BATCH,)), jnp.int32)
    labels = jnp.asarray(
        (rng0.rand(BATCH) > 0.99).astype(np.float32) * 2 - 1
    )
    key = jax.random.PRNGKey(0)

    trainable, static = state.trainable, state.static

    def gather_patches(flat, ys, xs, flips):
        def one(n, y, x, f):
            patch = jax.lax.dynamic_slice(
                images[n], (y - half, x - half), (CROP, CROP)
            )
            return jnp.where(f > 0, jnp.flip(patch, axis=1), patch)

        return jax.vmap(one)(flat, ys, xs, flips)[..., None]

    # --- ladder rung 1: gather -------------------------------------------
    @jax.jit
    def p_gather(flat, ys, xs, flips):
        return jnp.sum(gather_patches(flat, ys, xs, flips))

    # --- rung 2: + U-Net forward (denoise branch only) -------------------
    unet = BlindspotUNet(
        in_channels=1, out_channels=2, blindspot=True, levels=5,
        dtype=den.compute_dtype,
    )

    @jax.jit
    def p_unet(trainable, flat, ys, xs, flips):
        inp = gather_patches(flat, ys, xs, flips)
        out = unet.apply(
            {"params": trainable["model"]["denoise_branch"]}, inp
        )
        return jnp.sum(out)

    # --- rung 3: + reparam + detector (full primary fwd, train mode) -----
    @jax.jit
    def p_primary(trainable, static, flat, ys, xs, flips, key):
        inp = gather_patches(flat, ys, xs, flips)
        (net_out, hm), bn = den._apply_model(
            {"params": trainable["model"], "batch_stats": static["model"]},
            inp, key, train=True, dense=False,
        )
        return jnp.sum(net_out) + jnp.sum(hm)

    # --- rung 4: + flip-TTA second forward --------------------------------
    @jax.jit
    def p_tta(trainable, static, flat, ys, xs, flips, key):
        inp = gather_patches(flat, ys, xs, flips)
        k1, k2 = jax.random.split(key)
        mv = {"params": trainable["model"], "batch_stats": static["model"]}
        (net_out, hm), bn = den._apply_model(mv, inp, k1, True, False)
        (_, hm_f), _ = den._apply_model(mv, jnp.flip(inp, 2), k2, True, False)
        return jnp.sum(net_out) + jnp.sum(hm) + jnp.sum(hm_f)

    # --- rung 5: + all losses (value only) --------------------------------
    @jax.jit
    def p_loss(trainable, static, flat, ys, xs, flips, labels, key):
        inp = gather_patches(flat, ys, xs, flips)
        batch = {"inp": inp, "target": labels}
        loss, _ = den.run_pipeline(
            trainable, static, batch, key, ALPHA, TAU, train=True
        )
        return loss

    # --- rung 6: value_and_grad (fwd + bwd) --------------------------------
    @jax.jit
    def p_backward(trainable, static, flat, ys, xs, flips, labels, key):
        def loss_fn(tr):
            loss, _ = den.run_pipeline(
                tr, static, {"inp": gather_patches(flat, ys, xs, flips),
                             "target": labels},
                key, ALPHA, TAU, train=True,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return loss + gsum * 0.0

    # --- rung 7: full production step (fwd+bwd+Adam+BN) -------------------
    step = make_train_step(den, alpha=ALPHA, tau=TAU)

    def p_step(state, batch, key):
        # non-donating wrapper for repeated timing
        st = jax.tree_util.tree_map(jnp.copy, state)
        new_state, metrics = step(st, batch, key, jnp.float32(1e-4))
        return metrics["loss"]

    # --- rung 8: K steps under scan, per step ------------------------------
    scan = make_train_scan(den, alpha=ALPHA, tau=TAU, crop=CROP)
    flat_k = jnp.tile(flat, (K, 1))
    ys_k = jnp.tile(ys, (K, 1))
    xs_k = jnp.tile(xs, (K, 1))
    labels_k = jnp.tile(labels, (K, 1))
    lrs = jnp.full((K,), 1e-4, jnp.float32)

    def p_scan(state):
        st = jax.tree_util.tree_map(jnp.copy, state)
        _, metrics = scan(st, images, flat_k, ys_k, xs_k, labels_k, lrs, key)
        return metrics["loss"]

    patches = gather_patches(flat, ys, xs, flips)
    batch = {"inp": patches, "target": labels}

    rungs = []

    def rung(name, fn, args, flops_fn=None, flops_args=None, per=1):
        dt = _time(fn, *args) / per
        fl = 0.0
        if flops_fn is not None:
            fl = _flops(flops_fn, *(flops_args or args)) / per
        rungs.append({"stage": name, "ms": dt * 1e3, "gflop": fl / 1e9,
                      "tflops": fl / dt / 1e12 if fl else None})
        print(f"  {name:<9s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    print(f"batch={BATCH} crop={CROP} K={K}", flush=True)
    rung("gather", p_gather, (flat, ys, xs, flips), p_gather)
    rung("unet", p_unet, (trainable, flat, ys, xs, flips), p_unet)
    rung("primary", p_primary, (trainable, static, flat, ys, xs, flips, key),
         p_primary)
    rung("tta", p_tta, (trainable, static, flat, ys, xs, flips, key), p_tta)
    rung("loss", p_loss,
         (trainable, static, flat, ys, xs, flips, labels, key), p_loss)
    rung("backward", p_backward,
         (trainable, static, flat, ys, xs, flips, labels, key), p_backward)
    # full step: flops from the donating jitted step itself
    dt_step = _time(p_step, state, batch, key)
    fl_step = _flops(step, state, batch, key, jnp.float32(1e-4))
    rungs.append({"stage": "step", "ms": dt_step * 1e3,
                  "gflop": fl_step / 1e9,
                  "tflops": fl_step / dt_step / 1e12})
    print(f"  {'step':<9s} {dt_step*1e3:8.2f} ms", flush=True)
    dt_scan = _time(p_scan, state) / K
    # cost_analysis counts a lax.scan BODY ONCE (not x trip count), so the
    # scan program's own number would under-report K-fold — the rounds-1-4
    # "29% train MFU" artifact.  Per-step FLOPs == the single-step
    # program's (the body is the same _grad_update).
    fl_scan = fl_step
    rungs.append({"stage": "scan/K", "ms": dt_scan * 1e3,
                  "gflop": fl_scan / 1e9,
                  "tflops": fl_scan / dt_scan / 1e12})
    print(f"  {'scan/K':<9s} {dt_scan*1e3:8.2f} ms", flush=True)

    peak_tflops, peak_gbs = measured_peaks()
    kind, (spec_tflops, _) = spec_peaks()
    print(f"\nmeasured bf16 matmul peak: {peak_tflops:.2f} TFLOP/s "
          f"({100*peak_tflops/spec_tflops:.1f}% of {kind} spec)"
          if spec_tflops else "")

    print(f"\n| stage | ms | Δms | GFLOP | TFLOP/s | % peak |")
    print("|---|---|---|---|---|---|")
    prev = 0.0
    for r in rungs:
        delta = r["ms"] - prev
        prev = r["ms"] if r["stage"] not in ("step", "scan/K") else prev
        tf = r["tflops"]
        print(
            f"| {r['stage']} | {r['ms']:.2f} | {delta:+.2f} "
            f"| {r['gflop']:.1f} "
            f"| {tf:.2f} | {100*tf/peak_tflops:.0f}% |" if tf else
            f"| {r['stage']} | {r['ms']:.2f} | {delta:+.2f} "
            f"| {r['gflop']:.1f} | - | - |"
        )

    out = {
        "batch": BATCH, "crop": CROP, "k": K,
        "peak_tflops": peak_tflops, "peak_gbs": peak_gbs,
        "device_kind": kind, "spec_tflops": spec_tflops,
        "rungs": rungs,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline_train_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
