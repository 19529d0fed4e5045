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

import logging
import os
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("nms")

# ---------------------------------------------------------------------------
# Kernel dispatch: the Pallas VMEM-resident kernel (ops/nms_pallas.py) is the
# default on TPU for maps whose padded work buffer fits comfortably in VMEM —
# measured 2.3-3.4x faster than the multipeak XLA kernel at 1024-1536^2 and
# flat per-pick cost through 4096^2 (67 MB padded work map; v5e VMEM is
# 128 MB), with oracle-exact argsort(flat)[::-1] tie order (docs/PERF.md
# round 5).  SPR_NMS_IMPL=multipeak|pallas|auto overrides the dispatch.
# ---------------------------------------------------------------------------
_PALLAS_MAX_BYTES = 96 * 1024 * 1024
# Set after a runtime/compile failure: never retry pallas in this process.
_pallas_broken = False


def _pallas_eligible(h: int, w: int) -> bool:
    impl = os.environ.get("SPR_NMS_IMPL", "auto")
    if impl == "multipeak" or _pallas_broken:
        return False
    if jax.default_backend() != "tpu":
        return False
    if impl == "pallas":
        return True
    padded = (((h + 7) // 8) * 8) * (((w + 127) // 128) * 128) * 4
    return padded <= _PALLAS_MAX_BYTES


def _nms_device_single(heatmap, radius: int, threshold: float, max_peaks: int):
    """One (H, W) map -> (scores, coords, count) on device, best kernel."""
    global _pallas_broken
    h, w = heatmap.shape
    if _pallas_eligible(h, w):
        from spr_pick_tpu.ops.nms_pallas import non_maximum_suppression_pallas

        try:
            return non_maximum_suppression_pallas(
                heatmap, radius, float(threshold), max_peaks
            )
        except Exception:
            _pallas_broken = True
            logger.warning(
                "pallas NMS kernel failed at %dx%d; falling back to the "
                "multipeak XLA kernel for this process", h, w, exc_info=True,
            )
    return non_maximum_suppression_multipeak(
        heatmap, radius, float(threshold), max_peaks
    )

# Bounded auto-retry when a pick list hits the static max_peaks buffer:
# doubling 4 times gives a 16x ceiling, after which the truncation warning
# fires.  Restores the reference's unbounded host-NMS semantics
# (algorithms.py:59-103) with no user action in all but pathological cases.
_MAX_NMS_DOUBLINGS = 4


def _warn_if_capped(counts, max_peaks: int) -> None:
    """Loudly flag silent truncation: the reference's host NMS returns
    EVERY peak above the floor (algorithms.py:59-103); the device kernels
    carry a static ``max_peaks`` buffer, so a pathologically dense map
    (early-training checkpoint, contamination-heavy micrograph) hitting the
    cap would otherwise drop picks without a trace."""
    counts = np.atleast_1d(np.asarray(counts))
    n_capped = int((counts >= max_peaks).sum())
    if n_capped:
        logger.warning(
            "NMS pick list hit the max_peaks cap (%d) on %d of %d map(s); "
            "picks beyond the cap were DROPPED — re-run with a larger "
            "--max_peaks to get the full list",
            max_peaks, n_capped, len(counts),
        )


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


@partial(jax.jit, static_argnames=("radius", "max_peaks", "block"))
def non_maximum_suppression_blocked(
    heatmap: jnp.ndarray,
    radius: int,
    threshold: float = -jnp.inf,
    max_peaks: int = 2048,
    block: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS via a two-level block-max pyramid.

    Identical greedy semantics to :func:`non_maximum_suppression` but each
    iteration touches O(block^2 + radius^2) elements instead of O(H*W):
    argmax over per-block maxima, argmax within the winning block, then a
    windowed disk suppression + block-max repair.  ~10x faster for 1024^2
    maps at radius 15.  Requires 2*radius <= block: the suppression
    window spans at most 2 blocks per axis only under that bound (the
    repair recomputes a 2x2 block neighbourhood).
    """
    assert 2 * radius <= block, (
        "blocked NMS repair covers a 2x2 block neighbourhood; "
        f"need 2*radius <= block (got radius={radius}, block={block})"
    )
    h, w = heatmap.shape
    neg = jnp.float32(-jnp.inf)

    # Pad to block multiples plus a `pad` apron so suppression windows and
    # block-repair reads never go out of bounds.
    pad = block
    hp = ((h + block - 1) // block) * block
    wp = ((w + block - 1) // block) * block
    work = jnp.full((hp + 2 * pad, wp + 2 * pad), neg, jnp.float32)
    work = jax.lax.dynamic_update_slice(
        work, heatmap.astype(jnp.float32), (pad, pad)
    )
    nby = (hp + 2 * pad) // block
    nbx = (wp + 2 * pad) // block

    def block_maxes(wk):
        return wk.reshape(nby, block, nbx, block).max(axis=(1, 3))

    bmax = block_maxes(work)

    win = 2 * radius + 1
    wr = jax.lax.broadcasted_iota(jnp.int32, (win, win), 0) - radius
    wc = jax.lax.broadcasted_iota(jnp.int32, (win, win), 1) - radius
    disk = (wr * wr + wc * wc) <= radius * radius

    # Repair region: suppression window spans at most 2 blocks per axis; we
    # recompute a 2x2 block neighbourhood of maxima.
    def cond(state):
        work, bmax, scores, coords, k = state
        return jnp.logical_and(k < max_peaks, jnp.max(bmax) > threshold)

    def body(state):
        work, bmax, scores, coords, k = state
        bidx = jnp.argmax(bmax)
        by = (bidx // nbx).astype(jnp.int32)
        bx = (bidx % nbx).astype(jnp.int32)
        tile = jax.lax.dynamic_slice(work, (by * block, bx * block), (block, block))
        tidx = jnp.argmax(tile)
        ty = (tidx // block).astype(jnp.int32)
        tx = (tidx % block).astype(jnp.int32)
        y = by * block + ty
        x = bx * block + tx
        val = tile.reshape(-1)[tidx]

        scores = scores.at[k].set(val)
        coords = coords.at[k, 0].set(x - pad)
        coords = coords.at[k, 1].set(y - pad)

        # Disk suppression in a (win, win) window.
        window = jax.lax.dynamic_slice(work, (y - radius, x - radius), (win, win))
        window = jnp.where(disk, neg, window)
        work = jax.lax.dynamic_update_slice(work, window, (y - radius, x - radius))

        # Repair the 2x2 block neighbourhood of maxima covering the window.
        by0 = (y - radius) // block
        bx0 = (x - radius) // block
        region = jax.lax.dynamic_slice(
            work, (by0 * block, bx0 * block), (2 * block, 2 * block)
        )
        rmax = region.reshape(2, block, 2, block).max(axis=(1, 3))
        bmax = jax.lax.dynamic_update_slice(bmax, rmax, (by0, bx0))
        return work, bmax, scores, coords, k + 1

    scores0 = jnp.zeros((max_peaks,), jnp.float32)
    coords0 = jnp.zeros((max_peaks, 2), jnp.int32)
    _, _, scores, coords, count = jax.lax.while_loop(
        cond, body, (work, bmax, scores0, coords0, jnp.int32(0))
    )
    return scores, coords, count


@partial(jax.jit, static_argnames=("radius", "threshold", "max_peaks", "wave_width"))
def non_maximum_suppression_multipeak(
    heatmap: jnp.ndarray,
    radius: int,
    threshold: float = -jnp.inf,
    max_peaks: int = 2048,
    wave_width: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS taking MANY mutually-safe picks per iteration.

    Hybrid of the blocked pyramid and the wave insight: tile the map into
    blocks of side b >= radius and keep per-block maxima.  A block maximum
    that beats the maxima of its 8 neighbouring blocks (lexicographic
    tie-break) is a guaranteed greedy pick — every unsuppressed pixel
    within `radius` of it lies in that 3x3 block neighbourhood — and two
    such winners sit in blocks >= 2 apart, i.e. > radius apart, so they
    cannot suppress each other.  Each wave therefore takes up to
    `wave_width` such picks at once: one batched scatter-min stamps all
    their suppression disks, one batched gather recomputes the affected
    3x3 block maxima from post-suppression memory.  The serial chain is
    O(#waves) (~tens) instead of O(#picks) (~thousands), and each wave
    touches only O(wave_width * (3b)^2) elements, not the full map.

    Greedy parity: the union of waves is exactly the greedy pick set
    (the current global maximum is always taken each wave), and greedy
    emits picks in descending score order, so the final top-k by score
    reproduces the capped greedy output.  Ties are broken exactly like
    the reference's ``argsort(flat)[::-1]``: among equal scores the
    higher flat pixel index is picked first — enforced in the
    within-block argmax, the between-block selection, and the final
    ordering, so even tied pick sets match bit-for-bit.
    """
    h, w = heatmap.shape
    neg = jnp.float32(-jnp.inf)
    # Picked pixels are marked IN the work map with a finite sentinel: a
    # pick is never inside another pick's suppression disk (same wave:
    # > radius apart by construction; later waves: a pick within radius of
    # an earlier one would itself have been suppressed), so the mark can
    # never be overwritten by the scatter-min.  This removes a whole
    # scatter per wave.  Scores <= -1e38 are treated as below any
    # threshold (MARK lives at -2e38).
    MARK = jnp.float32(-2e38)
    thr = max(float(threshold), -1e38)
    b = 16
    while b < radius:
        b += 8
    pad = b
    hp = ((h + b - 1) // b) * b
    wp = ((w + b - 1) // b) * b
    HP, WP = hp + 2 * pad, wp + 2 * pad
    nby, nbx = HP // b, WP // b
    nblocks = nby * nbx
    wave_width = min(wave_width, nblocks)
    win = 3 * b  # suppression/repair window: the 3x3 block neighbourhood

    work = jnp.full((HP, WP), neg, jnp.float32)
    work = jax.lax.dynamic_update_slice(
        work, heatmap.astype(jnp.float32), (pad, pad)
    )

    def argmax_hi(v):
        # argmax preferring the HIGHEST index among ties (greedy tie order)
        return (v.shape[-1] - 1) - v[..., ::-1].argmax(-1).astype(jnp.int32)

    def block_stats(wk):
        v = wk.reshape(nby, b, nbx, b).transpose(0, 2, 1, 3).reshape(
            nby, nbx, b * b
        )
        return v.max(-1), argmax_hi(v)

    bmax, barg = block_stats(work)

    # Suppression window: exactly the (2r+1)^2 disk bounding box.
    sup_win = 2 * radius + 1
    sy_rel = jax.lax.broadcasted_iota(jnp.int32, (sup_win, sup_win), 0) - radius
    sx_rel = jax.lax.broadcasted_iota(jnp.int32, (sup_win, sup_win), 1) - radius
    disk = (sy_rel ** 2 + sx_rel ** 2) <= radius * radius

    byg = jax.lax.broadcasted_iota(jnp.int32, (nby, nbx), 0)
    bxg = jax.lax.broadcasted_iota(jnp.int32, (nby, nbx), 1)

    def select(bmax_, barg_):
        # Tie-break on the pick's flat map position: greedy (argsort
        # reversed) takes the HIGHER flat index first among equal scores.
        pkey = (byg * b + barg_ // b) * WP + (bxg * b + barg_ % b)
        grid = jnp.pad(bmax_, 1, constant_values=neg)
        kgrid = jnp.pad(pkey, 1, constant_values=-1)
        sel = bmax_ > thr
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                nv = jax.lax.dynamic_slice(grid, (1 + dy, 1 + dx), (nby, nbx))
                nk = jax.lax.dynamic_slice(kgrid, (1 + dy, 1 + dx), (nby, nbx))
                sel &= (bmax_ > nv) | ((bmax_ == nv) & (pkey > nk))
        return sel

    def cond(state):
        work, bstats, k, min_s = state
        remaining = jnp.max(bstats[..., 0])
        # Exact early stop: once >= max_peaks picks are collected and every
        # remaining candidate scores strictly below every collected pick,
        # the final top-k cannot change (ties could still displace via the
        # flat-index order, hence strict <).
        done = (k >= max_peaks) & (remaining < min_s)
        return (remaining > thr) & ~done

    def body(state):
        work, bstats, k, min_s = state
        bmax = bstats[..., 0]
        barg = bstats[..., 1].astype(jnp.int32)
        sel = select(bmax, barg)
        cand = jnp.where(sel, bmax, neg).reshape(-1)
        vals, bidx = jax.lax.top_k(cand, wave_width)
        valid = vals > neg

        by = (bidx // nbx).astype(jnp.int32)
        bx = (bidx % nbx).astype(jnp.int32)
        t = barg.reshape(-1)[bidx]
        py = by * b + t // b
        px = bx * b + t % b

        k = k + jnp.sum(valid.astype(jnp.int32))
        min_s = jnp.minimum(min_s, jnp.min(jnp.where(valid, vals, jnp.inf)))

        # Batched disk suppression + pick marking: ONE scatter-min over all
        # picks' disk bounding boxes (the apron guarantees in-bounds
        # windows).  The window centre writes MARK instead of -inf,
        # permanently tagging the pick in place.
        wy = py[:, None, None] + sy_rel[None]
        wx = px[:, None, None] + sx_rel[None]
        centre = (sy_rel == 0) & (sx_rel == 0)
        sup_vals = jnp.where(
            disk[None] & valid[:, None, None],
            jnp.where(centre[None], MARK, neg),
            jnp.float32(jnp.inf),
        )
        sup_idx = jnp.where(valid[:, None, None], wy * WP + wx, 0)
        work_flat = work.reshape(-1).at[sup_idx.reshape(-1)].min(
            sup_vals.reshape(-1)
        )
        work = work_flat.reshape(HP, WP)
        oy = jnp.where(valid, (by - 1) * b, 0)
        ox = jnp.where(valid, (bx - 1) * b, 0)

        # Repair: recompute the 3x3 block stats around every pick from the
        # post-suppression map (reads depend on the scatter above, so no
        # stale values even when picks share affected blocks).
        def repair(o_y, o_x):
            tile = jax.lax.dynamic_slice(work, (o_y, o_x), (win, win))
            v = tile.reshape(3, b, 3, b).transpose(0, 2, 1, 3).reshape(9, b * b)
            return v.max(-1), argmax_hi(v)

        rmax, rarg = jax.vmap(repair)(oy, ox)  # (C, 9)
        di = jnp.arange(9, dtype=jnp.int32) // 3
        dj = jnp.arange(9, dtype=jnp.int32) % 3
        blk = (by[:, None] - 1 + di[None]) * nbx + (bx[:, None] - 1 + dj[None])
        blk = jnp.where(valid[:, None], blk, 0)
        rstats = jnp.stack(
            [
                jnp.where(valid[:, None], rmax, neg),
                jnp.where(valid[:, None], rarg, 0).astype(jnp.float32),
            ],
            axis=-1,
        )
        bstats = bstats.reshape(nblocks, 2).at[blk.reshape(-1)].set(
            rstats.reshape(-1, 2)
        ).reshape(nby, nbx, 2)
        return work, bstats, k, min_s

    bstats0 = jnp.stack([bmax, barg.astype(jnp.float32)], axis=-1)
    work, _, _, _ = jax.lax.while_loop(
        cond, body, (work, bstats0, jnp.int32(0), jnp.float32(jnp.inf))
    )

    picked2d = (work == MARK)[pad : pad + h, pad : pad + w]
    flat_scores = jnp.where(picked2d, heatmap.astype(jnp.float32), neg).reshape(-1)
    # Emit equal scores in descending flat-index order like the reference's
    # argsort(flat)[::-1] (top_k alone breaks ties the other way round).
    top_scores, flip_idx = jax.lax.top_k(flat_scores[::-1], max_peaks)
    top_idx = (h * w - 1) - flip_idx
    valid = top_scores > thr
    count = jnp.sum(valid.astype(jnp.int32))
    scores = jnp.where(valid, top_scores, 0.0)
    coords = jnp.stack(
        [
            jnp.where(valid, top_idx % w, 0).astype(jnp.int32),
            jnp.where(valid, top_idx // w, 0).astype(jnp.int32),
        ],
        axis=1,
    )
    return scores, coords, count


@lru_cache(maxsize=32)
def _batched_nms_fn(radius: int, threshold: float, max_peaks: int):
    # Cached module-level jit: building a fresh jit(vmap(...)) per call
    # would retrace + recompile the while_loop kernel on EVERY eval group.
    return jax.jit(
        jax.vmap(
            partial(
                non_maximum_suppression_multipeak,
                radius=radius,
                threshold=threshold,
                max_peaks=max_peaks,
            )
        )
    )


def nms_batch_device(
    heatmaps, radius: int, threshold: float = 0.02, max_peaks: int = 2048,
    suppressed=None,
):
    """Dispatch batched greedy NMS; return DEVICE (scores, coords, counts).

    Asynchronous: the caller can keep the results on device (e.g. the
    evaluator's software pipeline dispatches NMS for group i, then lets the
    host export group i-1's artifacts while the device works) and trim them
    later with :func:`nms_batch_trim`.  Accepts a device-resident heatmap
    batch directly — pass ``outputs[DETECT]`` sliced with jnp, NOT
    ``np.asarray(...)`` of it, to avoid a device->host->device round trip
    of the full maps over the host link.
    """
    heatmaps = jnp.asarray(heatmaps)
    if suppressed is not None:
        heatmaps = jnp.where(
            jnp.asarray(suppressed, bool), -jnp.inf, heatmaps
        )
    b, h, w = heatmaps.shape
    if _pallas_eligible(h, w):
        # Per-map pallas calls enqueue back-to-back (still asynchronous);
        # at ~30 ms/map the sub-ms dispatch gap is noise, and each map's
        # work buffer stays VMEM-resident for the whole greedy loop.
        outs = [
            _nms_device_single(heatmaps[i], radius, threshold, max_peaks)
            for i in range(b)
        ]
        if not _pallas_broken:
            return (
                jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]),
                jnp.stack([o[2] for o in outs]),
            )
    return _batched_nms_fn(radius, float(threshold), max_peaks)(heatmaps)


def nms_batch_trim(scores, coords, counts, heatmaps=None, radius=None,
                   threshold: float = 0.02, suppressed=None):
    """Pull batched-NMS device results and trim to per-map pick lists.

    When ``heatmaps`` (and ``radius``) are provided, any map whose pick
    list hit the static ``max_peaks`` buffer is automatically RE-RUN with
    a doubled buffer (bounded: up to ``_MAX_NMS_DOUBLINGS`` doublings =
    16x), restoring the reference's unbounded pick-list semantics
    (algorithms.py:59-103) without user intervention; a warning records
    each retry.  Without them the old drop-with-warning behaviour applies.
    """
    counts = np.asarray(counts)
    scores = np.asarray(scores)
    coords = np.asarray(coords)
    max_peaks = scores.shape[-1]
    results = [
        (scores[i, : counts[i]], coords[i, : counts[i]])
        for i in range(scores.shape[0])
    ]
    todo = np.flatnonzero(counts >= max_peaks)
    if todo.size == 0:
        return results
    if heatmaps is None or radius is None:
        _warn_if_capped(counts, max_peaks)
        return results

    hm = jnp.asarray(heatmaps)
    if suppressed is not None:
        hm = jnp.where(jnp.asarray(suppressed, bool), -jnp.inf, hm)
    cap = max_peaks
    for _ in range(_MAX_NMS_DOUBLINGS):
        prev, cap = cap, cap * 2
        logger.warning(
            "NMS pick list hit the max_peaks cap (%d) on %d of %d map(s); "
            "auto-retrying those maps with max_peaks=%d",
            prev, todo.size, len(counts), cap,
        )
        sub = jnp.take(hm, jnp.asarray(todo), axis=0)
        s2, c2, n2 = nms_batch_device(sub, radius, threshold, cap)
        s2, c2, n2 = np.asarray(s2), np.asarray(c2), np.asarray(n2)
        for k, i in enumerate(todo):
            results[i] = (s2[k, : n2[k]], c2[k, : n2[k]])
        todo = todo[n2 >= cap]
        if todo.size == 0:
            return results
    logger.warning(
        "NMS pick list still hit the cap (%d) on %d map(s) after %d "
        "automatic retries; picks beyond the cap were DROPPED — re-run "
        "with a larger --max_peaks to get the full list",
        cap, todo.size, _MAX_NMS_DOUBLINGS,
    )
    return results


def nms_batch_to_host(
    heatmaps, radius: int, threshold: float = 0.02, max_peaks: int = 2048,
    suppressed=None,
):
    """Greedy NMS over a (B, H, W) batch in ONE device program.

    vmap of the multipeak kernel: every wave processes all B maps at once,
    amortising the per-op dispatch cost across the batch (the while_loop
    runs until the slowest map converges; finished maps are carried
    unchanged).  Returns a list of (scores, coords) numpy pairs.  Order
    among exactly-equal scores may differ from the unbatched kernel (the
    batched top_k lowering breaks ties differently); the pick sets and
    scores are identical.

    ``suppressed``: optional (B, H, W) boolean mask of initially-suppressed
    pixels (the reference's `contam` set, algorithms.py:59-77); masked
    pixels can never be picked but do not block later picks near them —
    exactly the reference's seeded-set semantics.

    Maps that hit the ``max_peaks`` cap are automatically retried with a
    doubled buffer (see :func:`nms_batch_trim`).
    """
    return nms_batch_trim(
        *nms_batch_device(heatmaps, radius, threshold, max_peaks, suppressed),
        heatmaps=heatmaps, radius=radius, threshold=threshold,
        suppressed=suppressed,
    )


def nms_to_host(
    heatmap, radius: int, threshold: float = 0.02, max_peaks: int = 2048,
    suppressed=None,
):
    """Run device NMS and return trimmed numpy arrays.

    Dispatch: the pallas VMEM-resident kernel on TPU for maps within the
    VMEM gate, the multipeak XLA kernel otherwise — both reproduce the
    reference's exact argsort(flat)[::-1] greedy order including ties, so
    the dispatch never changes the pick set.

    ``suppressed``: optional (H, W) boolean mask of initially-suppressed
    pixels (reference `contam` seeding, algorithms.py:59-77): masked
    pixels are unpickable but don't suppress their neighbourhoods.

    A pick list that hits the ``max_peaks`` cap is automatically retried
    with a doubled buffer, up to ``_MAX_NMS_DOUBLINGS`` doublings (16x),
    matching the reference's unbounded host NMS (algorithms.py:59-103).
    """
    heatmap = jnp.asarray(heatmap)
    if suppressed is not None:
        heatmap = jnp.where(jnp.asarray(suppressed, bool), -jnp.inf, heatmap)
    cap = max_peaks
    for attempt in range(_MAX_NMS_DOUBLINGS + 1):
        scores, coords, count = _nms_device_single(
            heatmap, radius, threshold, cap
        )
        n = int(count)
        if n < cap:
            return np.asarray(scores[:n]), np.asarray(coords[:n])
        if attempt < _MAX_NMS_DOUBLINGS:
            logger.warning(
                "NMS pick list hit the max_peaks cap (%d); auto-retrying "
                "with max_peaks=%d", cap, cap * 2,
            )
            cap *= 2
    logger.warning(
        "NMS pick list still hit the cap (%d) after %d automatic retries; "
        "picks beyond the cap were DROPPED — re-run with a larger "
        "--max_peaks to get the full list",
        cap, _MAX_NMS_DOUBLINGS,
    )
    return np.asarray(scores[:n]), np.asarray(coords[:n])


def non_maximum_suppression_np(x: np.ndarray, r: int, threshold=-np.inf,
                               suppressed=None):
    """Reference-semantics host NMS (oracle for tests / CPU fallback).

    Greedy over descending scores with disk suppression — re-implemented
    with a vectorised disk mask rather than a python coordinate set.
    Tie order: the reference's `np.argsort(...)[::-1]` uses an UNSTABLE
    quicksort, so its order among equal scores is unspecified; here a
    stable sort is used, making ties deterministic (higher flat index
    first) and matching `non_maximum_suppression_multipeak` bit-for-bit
    even on quantised score maps.

    ``suppressed``: optional (H, W) boolean initial suppression mask (the
    reference's seeded `contam` set, algorithms.py:59-77).
    """
    h, w = x.shape
    flat = x.ravel()
    order = np.argsort(flat, kind="stable")[::-1]
    if suppressed is None:
        suppressed = np.zeros((h, w), dtype=bool)
    else:
        suppressed = np.asarray(suppressed, bool).copy()
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
