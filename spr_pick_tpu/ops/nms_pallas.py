"""Pallas TPU kernel: greedy NMS resident in VMEM.

The XLA while_loop NMS (ops/nms.py) pays per-iteration HBM traffic (full-map
argmax + disk write) or, in the blocked variant, per-iteration op-dispatch
latency.  This kernel pins the whole score map in VMEM (a 1024^2 f32 map is
4 MB < 16 MB VMEM) and runs the entire greedy loop on the VPU: each
iteration is a ~1M-element max-reduce + masked write at full vector
throughput with zero HBM round-trips.

Greedy semantics identical to `spr_pick/utils/algorithms.py:59-103` (and to
ops/nms.py): ties resolve to the HIGHEST flat index first — the multipeak
kernel / numpy-oracle order (`np.argsort(flat, kind="stable")[::-1]`).
Exact tie order matters in production: `losses.clamped_sigmoid` clips
detector probabilities to [eps, 1-eps], so saturated maps carry large
equal-score plateaus where tie order decides the greedy pick SET, not just
its order.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(radius: int, threshold: float, max_peaks: int,
                hm_ref, scores_ref, coords_ref, count_ref, work_ref,
                rowmax_ref):
    """Windowed greedy NMS with an incremental row-max cache, all in VMEM.

    Per iteration only the (2r+1, w) band of rows around the pick is read,
    disk-suppressed and written back, and its row maxima are refreshed —
    ~2*(2r+1)*w elements of VMEM traffic instead of 3*h*w full-map passes.
    The map is aliased in-place as the work buffer (input_output_aliases).
    """
    h, w = hm_ref.shape
    big = jnp.int32(h * w)
    r2 = radius * radius
    # Sublane-aligned band: Mosaic requires dynamic dim-0 starts to be
    # provable multiples of 8.  Band of win8 rows (covering [y-r, y+r] for
    # any alignment offset) starting at an 8-aligned row.
    win8 = ((2 * radius + 1 + 7) // 8) * 8 + 8
    neg = jnp.float32(-jnp.inf)

    scores_ref[:] = jnp.zeros_like(scores_ref)
    coords_ref[:] = jnp.zeros_like(coords_ref)
    rowmax_ref[:] = jnp.max(work_ref[:], axis=1, keepdims=True)

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (win8, 1), 0)
    iota_8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def cond(carry):
        k, m = carry
        return jnp.logical_and(k < max_peaks, m > threshold)

    def body(carry):
        k, m = carry
        # LAST row/col holding the global max: highest flat index among
        # ties, the reference's argsort(flat)[::-1] pick order.
        y = jnp.max(jnp.where(rowmax_ref[:] == m, iota_r, jnp.int32(-1)))
        ys = pl.multiple_of((y // 8) * 8, 8)
        block = work_ref[pl.ds(ys, 8), :]  # aligned 8-row block holding y
        in_row = (iota_8 == (y - ys)) & (block == m)
        x = jnp.max(jnp.where(in_row, iota_c, jnp.int32(-1)))

        scores_ref[pl.ds(k, 1), 0] = m[None]
        coords_ref[pl.ds(k, 1), 0] = x[None]
        coords_ref[pl.ds(k, 1), 1] = y[None]

        # Suppress the disk within an aligned (win8, w) row band.
        start = pl.multiple_of(
            jnp.clip((y - radius) // 8 * 8, 0, h - win8), 8
        )
        band = work_ref[pl.ds(start, win8), :]
        band_rows = start + iota_b  # absolute row ids
        dist2 = (band_rows - y) ** 2 + (iota_c - x) ** 2
        band = jnp.where(dist2 <= r2, neg, band)
        work_ref[pl.ds(start, win8), :] = band

        # Refresh the row-max cache for the touched band.
        rowmax_ref[pl.ds(start, win8), 0] = jnp.max(band, axis=1)
        return k + 1, jnp.max(rowmax_ref[:])

    count, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.max(rowmax_ref[:]))
    )
    count_ref[0, 0] = count


@partial(
    jax.jit, static_argnames=("radius", "threshold", "max_peaks", "interpret")
)
def non_maximum_suppression_pallas(
    heatmap: jnp.ndarray,
    radius: int,
    threshold: float = -jnp.inf,
    max_peaks: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS on a (H, W) map, all state in VMEM.

    Returns (scores (K, 1), coords (K, 2) as (x, y), count (1, 1)).
    """
    h0, w0 = heatmap.shape
    # Mosaic wants (8, 128)-aligned tiles; pad with -inf (never picked).
    win8 = ((2 * radius + 1 + 7) // 8) * 8 + 8
    h = max(((h0 + 7) // 8) * 8, win8)
    w = ((w0 + 127) // 128) * 128
    if (h, w) != (h0, w0):
        heatmap = jnp.pad(
            heatmap, ((0, h - h0), (0, w - w0)), constant_values=-jnp.inf
        )
    kernel = partial(_nms_kernel, radius, float(threshold), max_peaks)
    scores, coords, count, _ = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((max_peaks, 1), jnp.float32),
            jax.ShapeDtypeStruct((max_peaks, 2), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),  # aliased work buffer
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        input_output_aliases={0: 3},
        scratch_shapes=[pltpu.VMEM((h, 1), jnp.float32)],
        interpret=interpret,
    )(heatmap.astype(jnp.float32))
    return scores[:, 0], coords, count[0, 0]


def nms_pallas_to_host(heatmap, radius: int, threshold: float = 0.02,
                       max_peaks: int = 2048):
    scores, coords, count = non_maximum_suppression_pallas(
        jnp.asarray(heatmap), radius, threshold, max_peaks
    )
    n = int(count)
    return np.asarray(scores[:n]), np.asarray(coords[:n])
