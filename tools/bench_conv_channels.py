#!/usr/bin/env python
"""Channel-width ceiling of 3x3 convs on this chip.

Evidence for the train-step roofline conclusion (docs/PERF.md): the
blind-spot U-Net's C=48 encoder / C=96 decoder convs under-fill the MXU's
128-wide lanes, capping achievable TFLOP/s regardless of batch size.  This
times the SAME conv shape at increasing channel widths: if achieved
TFLOP/s scales up with width while wall time stays ~flat, the train step
is MXU-bound at the lane-padding ceiling — not latency- or bandwidth-bound.
"""

from __future__ import annotations

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


def _time(fn, *args, reps=5, warm=2):
    def fence(out):
        np.asarray(out).ravel()[:1]
    for _ in range(warm):
        fence(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    return (time.time() - t0) / reps


def main():
    b, h, w = 1024, 64, 64  # the rot4-folded train-batch shape at batch 256
    steps = 8               # chain so one call is tens of ms
    print(f"3x3 conv chain x{steps}, input ({b},{h},{w},C) bf16:")
    print(f"{'C':>4} {'ms/conv':>9} {'TFLOP/s':>9} {'vs C=48':>8}")
    base = None
    for c in (48, 64, 96, 128, 192, 256):
        x = jnp.ones((b, h, w, c), jnp.bfloat16)
        k = jnp.full((3, 3, c, c), 1.0 / (9 * c), jnp.bfloat16)

        @partial(jax.jit, static_argnums=())
        def chain(x, k):
            def body(y, _):
                y = jax.lax.conv_general_dilated(
                    y, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return y, None
            y, _ = jax.lax.scan(body, x, None, length=steps)
            return jnp.sum(y.astype(jnp.float32))

        dt = _time(chain, x, k) / steps
        flops = 2 * b * h * w * 9 * c * c
        tf = flops / dt / 1e12
        if base is None:
            base = tf
        print(f"{c:>4} {dt*1e3:>9.2f} {tf:>9.1f} {tf/base:>7.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
