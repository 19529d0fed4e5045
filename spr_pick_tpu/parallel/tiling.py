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
heatmap deviation measures p99 ~0.01 on a 0..0.8 scale) and across
random-init + partially-trained weight sets in
tests/test_tiling.py::test_tiling_halo_multi_seed.

Edge-tile windows are CLAMPED inside the image (shifted tiles), never
zero-filled past it — see extract_tiles for why that is load-bearing for
boundary exactness.
"""

from __future__ import annotations

import logging
import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spr_pick_tpu.parallel.mesh import shard_batch

logger = logging.getLogger("tiling")


def plan_tiles(h: int, w: int, tile: int) -> Tuple[int, int]:
    return math.ceil(h / tile), math.ceil(w / tile)


def _min_truncation_context(extent: int, tile: int, halo: int) -> float:
    """Smallest one-sided context any tile's valid centre gets at a window
    edge that truncates real image content, along one axis of `extent`.

    Mirrors extract_tiles' clamped-window arithmetic exactly.  A window
    edge that coincides with the image edge truncates nothing (the direct
    forward ends there too), so it does not count.  Returns inf when no
    window edge lies strictly inside the image (single degenerate tile)."""
    n = math.ceil(extent / tile)
    win = min(tile + 2 * halo, extent)
    m = math.inf
    for i in range(n):
        lo = min(max(i * tile - halo, 0), extent - win)
        c_lo, c_hi = i * tile, min((i + 1) * tile, extent)
        if c_lo > 0 and lo > 0:
            m = min(m, c_lo - lo)
        if c_hi < extent and lo + win < extent:
            m = min(m, lo + win - c_hi)
    return m


def usable_halos(
    shape: Tuple[int, int], tile: int, halos
) -> Tuple[int, ...]:
    """Candidate halos a probe of `shape` can SOUNDLY certify for `tile`.

    Certifying halo h from a probe is sound only when the probe geometry
    contains a window edge whose one-sided context is <= h: production
    interior tiles get exactly h of context per side, so the probe must
    measure a truncation at least that severe.  Clamped probe windows can
    instead overlap so much that every boundary sees >= 2h of context —
    then the measured deviation UNDERSTATES production and calibration
    would certify halos ~2x too small (the failure mode this filter
    exists for)."""
    h_, w_ = shape
    return tuple(
        h
        for h in sorted(set(halos))
        if min(
            _min_truncation_context(h_, tile, h),
            _min_truncation_context(w_, tile, h),
        )
        <= h
    )


def extract_tiles(
    image: np.ndarray, tile: int, halo: int
) -> Tuple[np.ndarray, Tuple[int, int], np.ndarray]:
    """(H, W) -> (T, win_y, win_x) overlapping windows, entirely in-image.

    Window positions are CLAMPED to the image extent (shifted tiles) rather
    than zero-filled beyond it.  This is load-bearing for boundary
    exactness: a CNN's implicit zero padding stays zero at EVERY layer,
    but an explicit zero-filled halo does not — the first conv's bias
    turns it into nonzero "hallucinated" features that leak back into the
    valid centre, so edge tiles would disagree with the direct (un-tiled)
    forward in an ~RF/2 border band no matter how wide the halo (observed:
    sigmoid heatmap flips 0.03 -> 0.99 on the border rows of a trained
    JointNetwork).  With clamped windows the window edge coincides with
    the image edge, the network's implicit padding happens at the true
    boundary, and tiled == direct everywhere up to halo context decay.

    Returns (tiles, (ny, nx), offsets) where offsets[k] = (oy, ox) is the
    position of tile k's valid centre within its window (== halo for
    interior tiles, smaller/larger where the window was clamped).
    """
    h, w = image.shape
    ny, nx = plan_tiles(h, w, tile)
    win_y = min(tile + 2 * halo, h)
    win_x = min(tile + 2 * halo, w)
    tiles = np.empty((ny * nx, win_y, win_x), image.dtype)
    offsets = np.empty((ny * nx, 2), np.int64)
    k = 0
    for iy in range(ny):
        wy = min(max(iy * tile - halo, 0), h - win_y)
        for ix in range(nx):
            wx = min(max(ix * tile - halo, 0), w - win_x)
            tiles[k] = image[wy : wy + win_y, wx : wx + win_x]
            offsets[k] = (iy * tile - wy, ix * tile - wx)
            k += 1
    return tiles, (ny, nx), offsets


def stitch_tiles(tiles: np.ndarray, grid: Tuple[int, int], tile: int,
                 offsets: np.ndarray, out_shape: Tuple[int, int]) -> np.ndarray:
    """(T, win_y, win_x) valid-centre crops -> (H, W)."""
    ny, nx = grid
    h, w = out_shape
    out = np.empty((h, w), tiles.dtype)
    k = 0
    for iy in range(ny):
        sy = min(tile, h - iy * tile)
        for ix in range(nx):
            sx = min(tile, w - ix * tile)
            oy, ox = offsets[k]
            out[iy * tile : iy * tile + sy, ix * tile : ix * tile + sx] = (
                tiles[k, oy : oy + sy, ox : ox + sx]
            )
            k += 1
    return out


def tiled_dense_apply(
    apply_tiles: Callable[[jnp.ndarray], Dict[str, jnp.ndarray]],
    image: np.ndarray,
    tile: int = 1024,
    halo: int = 96,
    mesh=None,
    max_batch: Optional[int] = None,
    align: int = 1,
) -> Dict[str, np.ndarray]:
    """Run a dense per-pixel model over a large micrograph by tiles.

    `apply_tiles(batch NHWC) -> {name: NHWC}` must be shape-preserving
    (dense mode).  When `mesh` is given the tile batch is sharded over its
    'data' axis so tiles run on all chips concurrently.  `align` pads
    windows up to a multiple (the dense U-Net route needs 32) when a
    clamped window is not already aligned.
    """
    h, w = image.shape
    if align > 1:
        win = tile + 2 * halo
        if win < max(h, w) and win % align:
            # Interior windows must be aligned BY CONSTRUCTION: padding
            # them with zeros mid-image would reintroduce the
            # hallucinated-halo bug documented in extract_tiles (an
            # explicit zero band inside the image is not equivalent to
            # the network's implicit edge padding).  Widen the halo to
            # the next aligning value — extra context is always safe.
            bumped = next(
                (
                    b
                    for b in range(halo + 1, halo + align + 1)
                    if (tile + 2 * b) % align == 0
                ),
                None,
            )
            if bumped is None:
                raise ValueError(
                    f"tile={tile} with align={align} admits no aligned "
                    f"window for any halo >= {halo}; use an even tile "
                    f"multiple of {align}"
                )
            logger.debug(
                "halo %d widened to %d so windows align to %d",
                halo, bumped, align,
            )
            halo = bumped
    tiles, grid, offsets = extract_tiles(image.astype(np.float32), tile, halo)
    t = tiles.shape[0]

    # Windows clamped to the FULL image extent in a dimension (image
    # smaller than tile+2*halo there) may still be unaligned; zero-pad
    # those at bottom/right and crop after — the pad then sits at the
    # true image edge, exactly where (and how) the direct whole-image
    # path pads-to-32, so boundary semantics stay consistent.
    win_y, win_x = tiles.shape[1:]
    pad_y = (-win_y) % align
    pad_x = (-win_x) % align
    if pad_y or pad_x:
        tiles = np.pad(tiles, ((0, 0), (0, pad_y), (0, pad_x)))

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
        if pad_y or pad_x:
            all_tiles = all_tiles[:, :win_y, :win_x]
        stitched[name] = stitch_tiles(all_tiles, grid, tile, offsets, (h, w))
    return stitched


def calibrate_halo(
    apply_tiles: Callable[[jnp.ndarray], Dict[str, jnp.ndarray]],
    probe: np.ndarray,
    tile: int = 1024,
    tol: float = 0.02,
    percentile: float = 99.0,
    halos: Tuple[int, ...] = (32, 64, 96, 128, 160, 224, 320),
    align: int = 1,
    mesh=None,
) -> Tuple[int, Dict[int, float]]:
    """Derive the smallest sufficient halo from the MEASURED context decay.

    The blind-spot U-Net's vertical receptive field is unbounded (shifted
    convs accumulate downward context), so no fixed halo is provably
    sufficient for every weight set — a partially-trained or adversarial
    model can leak further than the default 96 (observed: p99 heatmap
    deviation 0.03 at halo 96 on a 150-step high-LR model).  Instead of an
    analytic bound, run the probe both directly and tiled at increasing
    halos and return the first whose outputs agree within `tol` at
    `percentile` (max over the apply fn's returned maps).

    A halo h is only a sound candidate when the probe geometry contains a
    window edge truncating real content with one-sided context <= h
    (`usable_halos`): production interior tiles get EXACTLY h of context,
    so a probe whose clamped windows all overlap into >= 2h of context
    would understate the deviation and certify halos ~2x too small.  The
    certificate itself is tile-size independent — per-pixel deviation is a
    function of the distance to the truncating edge, not of the tile size —
    so calibrating with a SMALLER tile than production is valid (and
    conservative: a larger fraction of pixels sits near a boundary).  A
    central crop of a real micrograph, sized so the direct forward is
    still affordable, is the intended probe.  Returns
    (halo, {halo: measured deviation}).  Raises ValueError when the probe
    is too small or no candidate meets `tol`.
    """
    probe = np.asarray(probe, np.float32)
    direct_out = apply_tiles(jnp.asarray(probe[None, :, :, None]))
    direct = {k: np.asarray(v)[0, :, :, 0] for k, v in direct_out.items()}
    usable = usable_halos(probe.shape, tile, halos)
    if not usable:
        raise ValueError(
            f"probe {probe.shape} too small to soundly calibrate "
            f"tile={tile}: no candidate halo in {sorted(set(halos))} has a "
            "window edge with <= halo context (use a larger probe or a "
            "smaller calibration tile)"
        )
    curve: Dict[int, float] = {}
    for halo in usable:
        tiled = tiled_dense_apply(
            apply_tiles, probe, tile=tile, halo=halo, mesh=mesh, align=align
        )
        dev = max(
            float(np.percentile(np.abs(tiled[k] - direct[k]), percentile))
            for k in direct
        )
        curve[halo] = dev
        if dev <= tol:
            return halo, curve
    err = ValueError(
        f"no candidate halo meets tol={tol} at p{percentile:g}: {curve} — "
        "widen `halos` or lower the tile threshold for this model"
    )
    err.curve = curve  # callers can inspect the measured decay
    raise err
