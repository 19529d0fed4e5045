"""Halo-overlap spatial tiling for whole-micrograph dense inference.

The reference evaluates whole micrographs in one forward (pad-to-32,
image_wrapper.py:221-249) — fine at 1024^2, impossible at 8k^2+.  The
TPU-native scaling axis (SURVEY.md §2.7 / §5 "long-context analog") is
spatial: split the micrograph into fixed-size tiles with a halo wide enough
to cover the U-Net + detector context, shard the tile batch across the data
mesh, run the SAME dense model per tile, and stitch the valid centres.

The blind-spot U-Net's receptive field is huge but its effective context
decays within ~the encoder pyramid extent; `halo=96` (3x detector RF//2)
keeps stitched picks equal to the un-tiled forward's away from the score
floor — validated on the REAL trained JointNetwork in
tests/test_tiling.py::test_tiled_real_joint_model_pick_parity (pick-set
hysteresis match after the product's 30 px border filter; tile-boundary
heatmap deviation measures p99 ~0.01 on a 0..0.8 scale).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spr_pick_tpu.parallel.mesh import shard_batch


def plan_tiles(h: int, w: int, tile: int) -> Tuple[int, int]:
    return math.ceil(h / tile), math.ceil(w / tile)


def extract_tiles(image: np.ndarray, tile: int, halo: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """(H, W) -> (T, tile+2h, tile+2h) reflect-padded overlapping tiles."""
    h, w = image.shape
    ny, nx = plan_tiles(h, w, tile)
    pad_h = ny * tile - h
    pad_w = nx * tile - w
    # Zero-fill beyond the image: matches the conv zero-padding the direct
    # (un-tiled) forward sees at the image boundary (reflect padding makes
    # edge tiles hallucinate mirrored content the direct path never sees).
    padded = np.pad(image, ((halo, halo + pad_h), (halo, halo + pad_w)))
    tiles = np.empty((ny * nx, tile + 2 * halo, tile + 2 * halo), image.dtype)
    k = 0
    for iy in range(ny):
        for ix in range(nx):
            y0 = iy * tile
            x0 = ix * tile
            tiles[k] = padded[y0 : y0 + tile + 2 * halo, x0 : x0 + tile + 2 * halo]
            k += 1
    return tiles, (ny, nx)


def stitch_tiles(tiles: np.ndarray, grid: Tuple[int, int], tile: int, halo: int,
                 out_shape: Tuple[int, int]) -> np.ndarray:
    """(T, tile+2h, tile+2h) centre crops -> (H, W)."""
    ny, nx = grid
    out = np.empty((ny * tile, nx * tile), tiles.dtype)
    k = 0
    for iy in range(ny):
        for ix in range(nx):
            out[iy * tile : (iy + 1) * tile, ix * tile : (ix + 1) * tile] = tiles[
                k, halo : halo + tile, halo : halo + tile
            ]
            k += 1
    return out[: out_shape[0], : out_shape[1]]


def tiled_dense_apply(
    apply_tiles: Callable[[jnp.ndarray], Dict[str, jnp.ndarray]],
    image: np.ndarray,
    tile: int = 1024,
    halo: int = 96,
    mesh=None,
    max_batch: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Run a dense per-pixel model over a large micrograph by tiles.

    `apply_tiles(batch NHWC) -> {name: NHWC}` must be shape-preserving
    (dense mode).  When `mesh` is given the tile batch is sharded over its
    'data' axis so tiles run on all chips concurrently.
    """
    h, w = image.shape
    tiles, grid = extract_tiles(image.astype(np.float32), tile, halo)
    t = tiles.shape[0]

    d = 1 if mesh is None else mesh.devices.size
    batch = max_batch or max(d, 1)
    batch = max(batch, d)
    # pad tile count to a multiple of the batch
    t_pad = math.ceil(t / batch) * batch
    if t_pad != t:
        tiles = np.concatenate([tiles, np.repeat(tiles[-1:], t_pad - t, axis=0)])

    results: Dict[str, list] = {}
    for i in range(0, t_pad, batch):
        chunk = jnp.asarray(tiles[i : i + batch][..., None])
        if mesh is not None:
            chunk = shard_batch(chunk, mesh)
        out = apply_tiles(chunk)
        for name, val in out.items():
            results.setdefault(name, []).append(np.asarray(val)[..., 0])

    stitched = {}
    for name, chunks in results.items():
        all_tiles = np.concatenate(chunks, axis=0)[:t]
        stitched[name] = stitch_tiles(all_tiles, grid, tile, halo, (h, w))
    return stitched
