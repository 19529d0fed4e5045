#!/usr/bin/env python
"""A/B the folded flip-TTA forward (Denoiser.fold_tta) against the
reference-shaped sequential pair, on the production scan program."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue
from spr_pick_tpu.steps import init_state, make_train_scan

CROP = 64


def bench(den, batch, k, reps=3):
    state = init_state(den, seed=0, patch=CROP)
    scan = make_train_scan(den, alpha=0.75, tau=0.01, crop=CROP)
    rng0 = np.random.RandomState(1)
    n_imgs, hw = 4, 512
    images = jnp.asarray(rng0.rand(n_imgs, hw, hw), jnp.float32)
    half = CROP // 2

    def sample(i):
        r = np.random.RandomState(i * 7 + batch)
        flat = r.randint(0, n_imgs, size=(k, batch)).astype(np.int32)
        ys = r.randint(half, hw - half, size=(k, batch)).astype(np.int32)
        xs = r.randint(half, hw - half, size=(k, batch)).astype(np.int32)
        labels = (r.rand(k, batch) > 0.99).astype(np.float32) * 2 - 1
        return tuple(jnp.asarray(a) for a in (flat, ys, xs, labels))

    lrs = jnp.full((k,), 1e-4, jnp.float32)
    key = jax.random.PRNGKey(0)
    flat, ys, xs, labels = sample(0)
    state, m = scan(state, images, flat, ys, xs, labels, lrs, key)
    _ = float(np.asarray(m["loss"])[-1])
    times = []
    for i in range(reps):
        flat, ys, xs, labels = sample(i + 1)
        t0 = time.time()
        state, m = scan(state, images, flat, ys, xs, labels, lrs, key)
        _ = float(np.asarray(m["loss"])[-1])
        times.append(time.time() - t0)
    dt = float(np.median(times)) / k
    return 1.0 / dt, batch / dt


def main():
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg_mod.infer(c, model_only=True)

    print(f"{'batch':>6} {'K':>4} {'fold it/s':>10} {'seq it/s':>10} "
          f"{'fold smp/s':>11} {'seq smp/s':>10} {'speedup':>8}")
    for batch, k in ((4, 64), (16, 32), (64, 16), (256, 8)):
        den_fold = Denoiser(c, mode="joint", fold_tta=True)
        den_seq = Denoiser(c, mode="joint", fold_tta=False)
        it_f, s_f = bench(den_fold, batch, k)
        it_s, s_s = bench(den_seq, batch, k)
        print(f"{batch:>6} {k:>4} {it_f:>10.2f} {it_s:>10.2f} "
              f"{s_f:>11.1f} {s_s:>10.1f} {s_f/s_s:>8.2f}x", flush=True)


if __name__ == "__main__":
    main()
