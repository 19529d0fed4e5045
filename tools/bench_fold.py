#!/usr/bin/env python
"""A/B: batch-fold vs channel-packed rotation fold for the dense U-Net.

Interleaved same-session timing (this slice drifts between sessions) at the
production operating point (1024^2, batch 2, bf16).
"""

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

from spr_pick_tpu.models.unet import BlindspotUNet
from spr_pick_tpu.ops.pallas_unet import dense_blindspot_unet


def timed(fn, *args, reps=6, warm=2):
    for _ in range(warm):
        out = fn(*args)
        np.asarray(out).ravel()[:4]
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(out).ravel()[:4]
    return (time.time() - t0) / reps


def main():
    model = BlindspotUNet(in_channels=1, out_channels=2, blindspot=True, levels=5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]
    rng = np.random.RandomState(0)

    for shape in [(2, 1024, 1024, 1), (1, 1024, 1536, 1)]:
        x = jnp.asarray(rng.rand(*shape), jnp.float32)

        fb = jax.jit(
            lambda p, t: jnp.sum(
                dense_blindspot_unet(p, t, out_channels=2, fold="batch"), (1, 2, 3)
            )
        )
        fc = jax.jit(
            lambda p, t: jnp.sum(
                dense_blindspot_unet(p, t, out_channels=2, fold="channel"), (1, 2, 3)
            )
        )
        per = shape[0]
        tb = timed(fb, params, x) / per
        tc = timed(fc, params, x) / per
        # second interleave to expose drift
        tb2 = timed(fb, params, x) / per
        tc2 = timed(fc, params, x) / per
        print(
            f"{shape}: batch {min(tb, tb2)*1e3:.1f} ms/img, "
            f"channel {min(tc, tc2)*1e3:.1f} ms/img "
            f"({min(tb, tb2)/min(tc, tc2):.2f}x)"
        )


if __name__ == "__main__":
    main()
