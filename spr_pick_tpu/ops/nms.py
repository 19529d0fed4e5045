"""Greedy non-maximum suppression, on device.

Parity: `spr_pick/utils/algorithms.py:59-103` — descending-score greedy
picking with disk suppression of radius r and a score floor.  The reference
runs this as a python loop over an argsort on host (a major eval bottleneck,
SURVEY.md §3.5); here it is an exact iterative argmax loop compiled with
``lax.while_loop``: greedy order is reproduced because suppressing the disk
around each picked maximum before the next argmax is equivalent to walking
the sorted order and skipping suppressed coordinates.

Output is static-shaped (max_peaks) with a valid-count, so the op jits and
shards; only the <=few-hundred picks ever travel to the host.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("radius", "max_peaks"))
def non_maximum_suppression(
    heatmap: jnp.ndarray,
    radius: int,
    threshold: float = -jnp.inf,
    max_peaks: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS on a (H, W) score map.

    Returns (scores (K,), coords (K, 2) as (x, y), count) with K = max_peaks;
    entries past `count` hold score 0 / coord 0.
    """
    h, w = heatmap.shape
    neg = jnp.float32(-jnp.inf)
    work = heatmap.astype(jnp.float32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    r2 = radius * radius

    def cond(state):
        work, scores, coords, k = state
        return jnp.logical_and(k < max_peaks, jnp.max(work) > threshold)

    def body(state):
        work, scores, coords, k = state
        idx = jnp.argmax(work)
        y = (idx // w).astype(jnp.int32)
        x = (idx % w).astype(jnp.int32)
        val = work.reshape(-1)[idx]

        scores = scores.at[k].set(val)
        coords = coords.at[k, 0].set(x)
        coords = coords.at[k, 1].set(y)

        dist2 = (rows - y) ** 2 + (cols - x) ** 2
        work = jnp.where(dist2 <= r2, neg, work)
        return work, scores, coords, k + 1

    scores0 = jnp.zeros((max_peaks,), jnp.float32)
    coords0 = jnp.zeros((max_peaks, 2), jnp.int32)
    work, scores, coords, count = jax.lax.while_loop(
        cond, body, (work, scores0, coords0, jnp.int32(0))
    )
    return scores, coords, count


def nms_to_host(
    heatmap, radius: int, threshold: float = 0.02, max_peaks: int = 2048
):
    """Run device NMS and return trimmed numpy (scores, coords)."""
    scores, coords, count = non_maximum_suppression(
        jnp.asarray(heatmap), radius, threshold, max_peaks
    )
    n = int(count)
    return np.asarray(scores[:n]), np.asarray(coords[:n])


def non_maximum_suppression_np(x: np.ndarray, r: int, threshold=-np.inf):
    """Reference-semantics host NMS (oracle for tests / CPU fallback).

    Greedy over descending scores with disk suppression — re-implemented
    with a vectorised disk mask rather than a python coordinate set.
    """
    h, w = x.shape
    flat = x.ravel()
    order = np.argsort(flat)[::-1]
    suppressed = np.zeros((h, w), dtype=bool)
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    disk = (yy ** 2 + xx ** 2) <= r * r

    scores, coords = [], []
    for idx in order:
        if flat[idx] <= threshold:
            break
        y, xq = divmod(int(idx), w)
        if suppressed[y, xq]:
            continue
        scores.append(flat[idx])
        coords.append((xq, y))
        y0, y1 = max(0, y - r), min(h, y + r + 1)
        x0, x1 = max(0, xq - r), min(w, xq + r + 1)
        suppressed[y0:y1, x0:x1] |= disk[
            y0 - (y - r) : y1 - (y - r), x0 - (xq - r) : x1 - (xq - r)
        ]
    return (
        np.asarray(scores, np.float32),
        np.asarray(coords, np.int32).reshape(-1, 2),
    )


def non_maximum_suppression_3d_np(x: np.ndarray, d: float, scale: float = 1.0,
                                  threshold=-np.inf):
    """3-D greedy NMS (tomogram variant).  Parity: algorithms.py:106-143."""
    r = scale * d / 2
    width = int(np.ceil(r))
    nz, ny, nx = x.shape
    flat = x.ravel()
    order = np.argsort(flat)[::-1]
    suppressed = np.zeros(x.shape, dtype=bool)
    zz, yy, xx = np.mgrid[-width : width + 1, -width : width + 1, -width : width + 1]
    ball = (zz ** 2 + yy ** 2 + xx ** 2) <= r * r

    scores, coords = [], []
    for idx in order:
        if flat[idx] <= threshold:
            break
        z, rem = divmod(int(idx), ny * nx)
        y, xq = divmod(rem, nx)
        if suppressed[z, y, xq]:
            continue
        scores.append(flat[idx])
        coords.append((xq, y, z))
        z0, z1 = max(0, z - width), min(nz, z + width + 1)
        y0, y1 = max(0, y - width), min(ny, y + width + 1)
        x0, x1 = max(0, xq - width), min(nx, xq + width + 1)
        suppressed[z0:z1, y0:y1, x0:x1] |= ball[
            z0 - (z - width) : z1 - (z - width),
            y0 - (y - width) : y1 - (y - width),
            x0 - (xq - width) : x1 - (xq - width),
        ]
    return (
        np.asarray(scores, np.float32),
        np.asarray(coords, np.int32).reshape(-1, 3),
    )
