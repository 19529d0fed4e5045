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


def manipulate_jax(images, key, subpatch_size: int = 5):
    """Device-side batched UPS manipulation: the jit-traceable analog of
    :func:`manipulate` for the HBM-resident denoise data plane.

    ``images``: (B, H, W) jnp array.  Returns (manipulated, mask) with the
    same semantics as the host path — one target pixel per cell of an
    ``8x8`` stratified grid (box = round(sqrt(100/PERC_PIX))), each replaced
    by a uniformly-drawn *different* pixel from its clipped
    ``subpatch_size``-square window.  Static shapes throughout: out-of-range
    grid cells (H or W not a box multiple) are dropped via scatter
    ``mode='drop'``.  Bit-parity with the numpy path is impossible
    (different PRNG); the selection distribution is identical by
    construction — exactly uniform over non-target window pixels, where the
    reference's 16-try rejection loop (n2v_ups.py:55-59) is only
    approximately so.
    """
    import jax
    import jax.numpy as jnp

    if subpatch_size % 2 == 0:
        raise ValueError("subpatch_size must be odd")
    b, h, w = images.shape
    box = int(np.round(np.sqrt(100.0 / PERC_PIX)))
    by = int(np.ceil(h / box))
    bx = int(np.ceil(w / box))
    radius = subpatch_size // 2

    def one(img, k):
        k_y, k_x, k_donor = jax.random.split(k, 3)
        gi = jnp.arange(by, dtype=jnp.float32)[:, None]
        gj = jnp.arange(bx, dtype=jnp.float32)[None, :]
        ys = (gi * box + jax.random.uniform(k_y, (by, bx)) * box).astype(
            jnp.int32
        )
        xs = (gj * box + jax.random.uniform(k_x, (by, bx)) * box).astype(
            jnp.int32
        )
        valid = (ys < h) & (xs < w)

        # Clipped donor window around each target (n2v_ups.py:40-47 with the
        # documented max/min bound fix).
        y0 = jnp.maximum(ys - radius, 0)
        y1 = jnp.minimum(ys + radius, h - 1)
        x0 = jnp.maximum(xs - radius, 0)
        x1 = jnp.minimum(xs + radius, w - 1)
        hy = jnp.maximum(y1 - y0 + 1, 1)
        hx = jnp.maximum(x1 - x0 + 1, 1)
        n = hy * hx
        target = (ys - y0) * hx + (xs - x0)
        # Uniform over the n-1 non-target window pixels: draw in [0, n-1)
        # then skip past the target index.
        u = jax.random.uniform(k_donor, (by, bx))
        idx = jnp.minimum((u * (n - 1)).astype(jnp.int32), n - 2)
        idx = idx + (idx >= target).astype(jnp.int32)
        idx = jnp.clip(idx, 0, n - 1)
        dy = jnp.clip(y0 + idx // hx, 0, h - 1)
        dx = jnp.clip(x0 + idx % hx, 0, w - 1)
        donor = img[dy, dx]

        ys_w = jnp.where(valid, ys, h)  # out-of-range -> dropped by scatter
        out = img.at[ys_w, xs].set(donor, mode="drop")
        mask = jnp.zeros((h, w), jnp.float32).at[ys_w, xs].set(
            1.0, mode="drop"
        )
        return out, mask

    return jax.vmap(one)(images, jax.random.split(key, b))
