"""Noise2Void uniform-pixel-selection (UPS) masking.

Parity: `spr_pick/utils/n2v_ups.py:7-97` — stratified-grid pixel replacement
producing (manipulated image, mask).  Differences: the mask is returned as a
dense 0/1 map (static-shape friendly, consumed by losses.masked_mse) and the
patch-bound computation uses max() for the lower bound (the reference's
`min(x - r, 0)` at n2v_ups.py:40-43 is inverted; documented fix per
SURVEY.md §7.4).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

PERC_PIX = 1.5  # percentage of pixels manipulated (n2v_ups.py:72)


def stratified_coords(shape, rng: np.random.RandomState) -> Tuple[np.ndarray, np.ndarray]:
    """One random coordinate per box of a sqrt(100/perc)-sized grid."""
    box_size = int(np.round(np.sqrt(100.0 / PERC_PIX)))
    box_count_y = int(np.ceil(shape[0] / box_size))
    box_count_x = int(np.ceil(shape[1] / box_size))
    ys, xs = [], []
    for i in range(box_count_y):
        for j in range(box_count_x):
            y = int(i * box_size + rng.rand() * box_size)
            x = int(j * box_size + rng.rand() * box_size)
            if y < shape[0] and x < shape[1]:
                ys.append(y)
                xs.append(x)
    return np.asarray(ys), np.asarray(xs)


def manipulate(
    image: np.ndarray, subpatch_size: int = 5, rng: np.random.RandomState = None
) -> Tuple[np.ndarray, np.ndarray]:
    """UPS replacement: each selected pixel takes the value of a random
    *different* pixel within its subpatch.  `image` is (H, W); returns
    (manipulated copy, 0/1 mask of replaced pixels)."""
    if subpatch_size % 2 == 0:
        raise ValueError("subpatch_size must be odd")
    rng = rng or np.random
    h, w = image.shape[:2]
    out = image.copy()
    mask = np.zeros((h, w), dtype=np.float32)
    radius = subpatch_size // 2

    ys, xs = stratified_coords((h, w), rng)
    for y, x in zip(ys, xs):
        y0, y1 = max(y - radius, 0), min(y + radius, h - 1)
        x0, x1 = max(x - radius, 0), min(x + radius, w - 1)
        # draw a donor pixel != (y, x)
        for _ in range(16):
            ry = rng.randint(y0, y1 + 1)
            rx = rng.randint(x0, x1 + 1)
            if ry != y or rx != x:
                break
        out[y, x] = image[ry, rx]
        mask[y, x] = 1.0
    return out, mask
