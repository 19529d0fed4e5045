"""Optimised dense inference for the blind-spot U-Net.

The dense (whole-micrograph) forward of `BlindspotUNet` is HBM-bandwidth
bound (docs/PERF.md).  `dense_blindspot_unet` re-expresses it as a lean
XLA program — direct lax convs with the blind-spot shifts folded into
asymmetric padding, the shift+pool pair fused into one reduce_window,
nearest-2x upsamples as repeats, and the 1x1 head chain as dot_generals —
which measures ~12% faster than the flax module graph at 1024^2 on the
dev chip while remaining numerically exact (tests/test_pallas_unet.py).

Two Pallas kernels are additionally provided and exactness-verified, OFF
by default:

* ``fused_enc1`` — the encode_1 block (ShiftConv(in->48) + lrelu +
  ShiftConv(48->48) + lrelu + shift-down + 2x2 maxpool) as full-width
  row strips with one pooled HBM write.
* ``fused_head`` — the three 1x1 head convs as one block-wise matmul
  chain.

On the throttled dev slice they LOSE to XLA (per-grid-step overheads
dominate, and VMEM lane padding of 48/384-channel f32 buffers to 128
lanes caps band sizes: fused_enc1 currently exceeds the 16 MB VMEM
budget at 1024^2); they are kept behind ``use_enc1_kernel`` /
``use_head_kernel`` for re-evaluation on unthrottled hardware.

Mosaic lessons encoded here (each cost a debugging round):
  * offset slices of FUSED (non-materialised) values mis-compute at the
    extreme columns — stage conv inputs through VMEM scratch refs and
    slice the refs (`_taps_matmul_ref`);
  * a 2-D value cannot gain a minor dim (``[:, :, None]``) and a
    broadcast of an offset-sliced slab also mis-computes — broadcast the
    whole strip at offset 0 into scratch first;
  * reshapes may only split/merge leading (untiled) dims — the 2x2 pool
    is expressed as leading-split maxes around transposes;
  * manual DMA slices must be tile-aligned per dim ((8, 128) for f32):
    pre-pad inputs in HBM so strip loads start on aligned rows.

Blind-spot geometry (parity: joint_network_v2.py:565-584): the reference
ShiftConv (pad top k//2, SAME conv, crop bottom) computes
``y[r] = sum_u W[u] x[r+u-2]`` for k=3 — vertical taps at (-2,-1,0) —
and every conv zero-pads its own INPUT, so values computed outside the
image must be re-zeroed before the next conv (the `inside` masks).

Square inputs take the reference's single rot4 batch fold; rectangular
inputs (H != W) take a two-lane fold (rot0/180 at H x W, rot90/270 at
W x H) through the same backbone — see ``dense_blindspot_unet``.  (The
reference's ``torch.cat`` of 90-degree rotations needs square maps and
would crash.)  On non-TPU backends the kernels run in interpret mode so
the same tests pass everywhere.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _leaky(x):
    return jnp.where(x >= 0, x, x * 0.1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _taps_bcast_ref(x3_ref, w, b, rows, cols, row0=0):
    """Single-input-channel conv taps read from a materialised broadcast.

    x3_ref: (R, C, Cout) VMEM ref holding the input strip broadcast over
    the channel dim; w: (3, 3, 1, Cout).  Slicing the 2-D strip value
    across lane tiles mis-computes (see _taps_matmul_ref), so the caller
    broadcasts once into scratch and taps load from the ref.
    """
    acc = jnp.zeros((rows, cols, w.shape[-1]), jnp.float32)
    for u in range(3):
        for v in range(3):
            tap = x3_ref[row0 + u : row0 + u + rows, v : v + cols, :].astype(
                jnp.float32
            )
            acc = acc + tap * w[u, v, 0][None, None, :].astype(jnp.float32)
    if b is not None:
        acc = acc + b[None, None, :].astype(jnp.float32)
    return acc


def _taps_matmul_ref(x_ref, w, b, rows, cols, row0=0, col0=0):
    """3x3 conv taps as dot_generals, slicing a VMEM *ref* per tap.

    Mosaic mis-computes offset slices of fused (non-materialised) values
    at the extreme columns; loads from a materialised scratch ref are
    exact, so conv inputs are staged through VMEM scratch.
    """
    cout = w.shape[-1]
    acc = jnp.zeros((rows, cols, cout), jnp.float32)
    for u in range(3):
        for v in range(3):
            tap = x_ref[row0 + u : row0 + u + rows, col0 + v : col0 + v + cols, :]
            acc = acc + jax.lax.dot_general(
                tap, w[u, v], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if b is not None:
        acc = acc + b[None, None, :].astype(jnp.float32)
    return acc


# ---------------------------------------------------------------------------
# fused encode_1 (full-width strips, manual DMA)
# ---------------------------------------------------------------------------
#
# Image-space geometry for a strip of t output rows starting at R0
# (pool rows [R0/2, R0/2 + t/2)):
#   c0[r] = lrelu(sum_u W0[u] x[r+u-2])   needed rows [R0-3, R0+t-2]
#   c1[r] = lrelu(sum_u W1[u] c0[r+u-2])  needed rows [R0-1, R0+t-2]
#   pool[p] = max(c1s[2p], c1s[2p+1]),    c1s[r] = c1[r-1] (zero r=0)
# x rows needed: [R0-5, R0+t-2].  The input is pre-padded with 8 zero rows
# on top (so DMA offsets stay 8-aligned: load rows [R0, R0+t+8) of the
# padded array = image rows [R0-8, R0+t)) and 2/2 zero cols widened to a
# 128-multiple on the right.


def _enc1_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref, *, t, s,
                 cdtype):
    n = pl.program_id(0)
    iy = pl.program_id(1)
    rows = t + 8

    def body(xbuf, x3buf, c0buf, accbuf, sem):
        cp = pltpu.make_async_copy(
            x_ref.at[n, pl.ds(iy * t, rows), :], xbuf, sem
        )
        cp.start()
        cp.wait()
        # buffer row i = image row R0 - 8 + i; x window [R0-5, R0+t-2]
        # starts at buffer row 3.  Broadcast the strip over the channel
        # extent into scratch (offset slices of fused broadcasts
        # mis-compute across lane tiles).
        f0 = w0_ref.shape[-1]
        x3buf[:] = jax.lax.broadcast_in_dim(
            xbuf[:], (rows, xbuf.shape[1], f0), (0, 1)
        ).astype(x3buf.dtype)

        # c0 rows [R0-3, R0+t-2] (t+2), cols [-1, s+7): staged through the
        # scratch ref (see _taps_matmul_ref).  Reference semantics: conv1
        # zero-pads its INPUT, so c0 positions outside the image (row < 0,
        # col -1, cols >= s) must be literal zeros, not the conv-0 output
        # computed there (bias + lrelu make those nonzero).
        c0 = _leaky(
            _taps_bcast_ref(x3buf, w0_ref[:], b0_ref[:], t + 2, s + 8, row0=3)
        )
        c0row = (
            iy * t - 3
            + jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0)
        )
        c0col = jax.lax.broadcasted_iota(jnp.int32, (1, s + 8, 1), 1)
        inside = (c0row >= 0) & (c0col >= 1) & (c0col <= s)
        c0buf[:] = jnp.where(inside, c0, 0.0).astype(cdtype)
        # c1 rows [R0-1, R0+t-2] (t), cols [0, s)
        c1 = _taps_matmul_ref(c0buf, w1_ref[:], b1_ref[:], t, s)
        c1 = _leaky(c1)
        # c1 buffer row i = image row R0-1+i: zero the shift-fill row
        # (image row -1, only in the first strip).
        row_img = (
            iy * t - 1
            + jax.lax.broadcasted_iota(jnp.int32, (t, 1, 1), 0)
        )
        # Stage through scratch: the pool's reshape/transpose on a fused
        # value mis-computes at the edge columns.  accbuf doubles as the
        # staging ref (its [0:t, 0:s] window).
        accbuf[0:t, 0:s, :] = jnp.where(row_img >= 0, c1, 0.0).astype(
            accbuf.dtype
        )
        c1v = accbuf[0:t, 0:s, :]
        f = c1v.shape[-1]
        # 2x2 maxpool via leading-dim-only reshapes (Mosaic rejects
        # sublane-splitting reshapes): pool rows, transpose, pool "rows"
        # (= original cols), transpose back.
        p1 = jnp.max(c1v.reshape(t // 2, 2, s, f), axis=1)
        p2 = jnp.swapaxes(p1, 0, 1)
        p3 = jnp.max(p2.reshape(s // 2, 2, t // 2, f), axis=1)
        pooled = jnp.swapaxes(p3, 0, 1)
        out_ref[:] = pooled.astype(out_ref.dtype)[None]

    pl.run_scoped(
        body,
        xbuf=pltpu.VMEM((rows, x_ref.shape[-1]), x_ref.dtype),
        x3buf=pltpu.VMEM(
            (rows, x_ref.shape[-1], w0_ref.shape[-1]), cdtype
        ),
        c0buf=pltpu.VMEM((t + 2, s + 8, w0_ref.shape[-1]), cdtype),
        accbuf=pltpu.VMEM((t + 2, s + 8, w0_ref.shape[-1]), cdtype),
        sem=pltpu.SemaphoreType.DMA,
    )


def fused_enc1(x: jnp.ndarray, w0, b0, w1, b1, t: int = 8,
               cdtype=jnp.bfloat16) -> jnp.ndarray:
    """Blind-spot encode_1 block.  x: (N, S, S, 1) -> (N, S/2, S/2, F)."""
    n, s, s2, cin = x.shape
    assert s == s2, "square inputs required (rot4 fold)"
    assert cin == 1
    assert s % t == 0 and t % 8 == 0, (s, t)
    f = w0.shape[-1]
    wpad = _round_up(s + 10, 128)
    # rows: 8 on top (alignment + 5-row halo), 8 below (tail strip load);
    # cols: 2 left + (wpad - s - 2) right.  VMEM note: every (r, c, ch)
    # buffer lane-pads ch to 128, so bands stay small (t = 8).
    xp = jnp.pad(
        x[..., 0].astype(jnp.float32),
        ((0, 0), (8, 8), (2, wpad - s - 2)),
    )
    grid = (n, s // t)
    return pl.pallas_call(
        partial(_enc1_kernel, t=t, s=s, cdtype=cdtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t // 2, s // 2, f), lambda n_, i: (n_, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, s // 2, s // 2, f), cdtype),
        interpret=_interpret(),
    )(
        xp,
        w0.astype(jnp.float32),
        b0.astype(jnp.float32),
        w1.astype(cdtype),
        b1.astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# fused 1x1 head chain
# ---------------------------------------------------------------------------


def _head_kernel(x_ref, wh0_ref, bh0_ref, wh1_ref, bh1_ref, wo_ref, bo_ref,
                 out_ref, *, cdtype):
    def mm(a, w, b):
        r = jax.lax.dot_general(
            a, w[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return r + b[:][None, None, :]

    h = _leaky(mm(x_ref[0], wh0_ref, bh0_ref)).astype(cdtype)
    h = _leaky(mm(h, wh1_ref, bh1_ref)).astype(cdtype)
    out_ref[:] = mm(h, wo_ref, bo_ref)[None]


def fused_head(x: jnp.ndarray, wh0, bh0, wh1, bh1, wo, bo, bt: int = 2,
               cdtype=jnp.bfloat16) -> jnp.ndarray:
    """1x1 conv chain (C -> C -> dec -> out) with lrelu between; one read
    of x, one write of the out_channels map.  x: (B, S, S, C)."""
    bsz, h, w, c = x.shape
    assert h % bt == 0
    oc = wo.shape[-1]
    grid = (bsz, h // bt)
    return pl.pallas_call(
        partial(_head_kernel, cdtype=cdtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, w, c), lambda b_, i: (b_, i, 0, 0)),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, bt, w, oc), lambda b_, i: (b_, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, oc), jnp.float32),
        interpret=_interpret(),
    )(
        x.astype(cdtype),
        wh0.astype(cdtype), bh0.astype(jnp.float32),
        wh1.astype(cdtype), bh1.astype(jnp.float32),
        wo.astype(cdtype), bo.astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# XLA mid-section + public dense forward
# ---------------------------------------------------------------------------


def _shift_conv_xla(x, w, b, blindspot=True, k=3, cdtype=jnp.bfloat16):
    half = k // 2
    padding = ((2 * half, 0), (half, half)) if blindspot else (
        (half, half), (half, half)
    )
    y = jax.lax.conv_general_dilated(
        x.astype(cdtype),
        w.astype(cdtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(cdtype)


def _pool_shifted(x):
    # shift_down(1) + 2x2 maxpool as one reduce_window with top pad /
    # bottom crop; the explicit shift zero-fill at row 0 is restored by
    # clamping (lrelu outputs can be negative, reduce_window pads -inf).
    y = jax.lax.reduce_window(
        x,
        jnp.array(-jnp.inf, x.dtype),
        jax.lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, -1), (0, 0), (0, 0)),
    )
    return y.at[:, 0].max(jnp.array(0.0, y.dtype))


def _shift_conv_packed(x, w, b, groups, blindspot=True, k=3,
                       cdtype=jnp.bfloat16):
    """ShiftConv over `groups` rotation lanes PACKED into the channel dim
    (lane-major blocks), weights shared across lanes via a grouped conv
    with the kernel tiled along the output axis.  Mathematically identical
    to running the per-lane conv on a `groups`-times-larger batch, but the
    fat channel dim amortises the TPU's 128-lane VMEM padding: C=48 lanes
    pad 2.7x, 4x48=192 pads only 1.33x."""
    half = k // 2
    padding = ((2 * half, 0), (half, half)) if blindspot else (
        (half, half), (half, half)
    )
    wt = jnp.concatenate([w.astype(cdtype)] * groups, axis=-1)
    y = jax.lax.conv_general_dilated(
        x.astype(cdtype),
        wt,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + jnp.tile(b.astype(cdtype), groups)


def _cat_lanes(a: jnp.ndarray, b_: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Channel-concat two lane-major packed tensors PER LANE (so grouped
    convs keep reading each lane's features contiguously)."""
    bb, h, w, ca = a.shape
    cb = b_.shape[-1]
    a = a.reshape(bb, h, w, groups, ca // groups)
    b_ = b_.reshape(bb, h, w, groups, cb // groups)
    return jnp.concatenate([a, b_], axis=-1).reshape(bb, h, w, ca + cb)


def _dense_backbone_packed(
    p: Dict,
    xpack: jnp.ndarray,
    groups: int,
    levels: int,
    cdtype,
) -> jnp.ndarray:
    """Channel-packed variant of :func:`_dense_backbone`: the rotation
    lanes ride the channel dim (lane-major) instead of the batch dim.
    Returns the shift-down-applied features, (B, H, W, groups*dec)."""

    def conv(h, name):
        return _leaky(
            _shift_conv_packed(
                h,
                p[name]["conv"]["kernel"],
                p[name]["conv"]["bias"],
                groups,
                cdtype=cdtype,
            )
        )

    h = conv(xpack, "enc1_conv0")
    h = conv(h, "enc1_conv1")
    h = _pool_shifted(h)
    skips = [h]
    for i in range(2, levels + 1):
        h = conv(h, f"enc{i}_conv0")
        h = _pool_shifted(h)
        skips.append(h)
    h = conv(h, "enc_bottom_conv0")

    def up2(t):
        return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)

    h = up2(h)
    for stage, skip in enumerate(reversed(skips[:-1])):
        h = _cat_lanes(h, skip, groups)
        h = conv(h, f"dec{stage}_conv0")
        h = conv(h, f"dec{stage}_conv1")
        if stage < levels - 2:
            h = up2(h)

    h = up2(h)
    h = _cat_lanes(h, xpack.astype(h.dtype), groups)
    h = conv(h, "dec_final_conv0")
    h = conv(h, "dec_final_conv1")
    return jnp.pad(h, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]


def _dense_backbone(
    p: Dict,
    x4: jnp.ndarray,
    levels: int,
    cdtype,
    enc1_band: int,
    use_enc1_kernel: bool,
) -> jnp.ndarray:
    """Everything between the rotation fold and the un-rotation: enc1 ..
    dec_final + final shift-down, on a stack of same-shape rotated lanes.
    Shared by the square (4B) and rectangular (2x 2B) folds — the convs
    are batch-independent, so weights are shared by construction."""
    if use_enc1_kernel:
        h = fused_enc1(
            x4,
            p["enc1_conv0"]["conv"]["kernel"],
            p["enc1_conv0"]["conv"]["bias"],
            p["enc1_conv1"]["conv"]["kernel"],
            p["enc1_conv1"]["conv"]["bias"],
            t=enc1_band,
            cdtype=cdtype,
        )
    else:
        h = _leaky(
            _shift_conv_xla(
                x4,
                p["enc1_conv0"]["conv"]["kernel"],
                p["enc1_conv0"]["conv"]["bias"],
                cdtype=cdtype,
            )
        )
        h = _leaky(
            _shift_conv_xla(
                h,
                p["enc1_conv1"]["conv"]["kernel"],
                p["enc1_conv1"]["conv"]["bias"],
                cdtype=cdtype,
            )
        )
        h = _pool_shifted(h)
    skips = [h]
    for i in range(2, levels + 1):
        h = _leaky(
            _shift_conv_xla(
                h,
                p[f"enc{i}_conv0"]["conv"]["kernel"],
                p[f"enc{i}_conv0"]["conv"]["bias"],
                cdtype=cdtype,
            )
        )
        h = _pool_shifted(h)
        skips.append(h)
    h = _leaky(
        _shift_conv_xla(
            h,
            p["enc_bottom_conv0"]["conv"]["kernel"],
            p["enc_bottom_conv0"]["conv"]["bias"],
            cdtype=cdtype,
        )
    )

    def up2(t):
        return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)

    h = up2(h)
    for stage, skip in enumerate(reversed(skips[:-1])):
        h = jnp.concatenate([h, skip], axis=-1)
        h = _leaky(
            _shift_conv_xla(
                h,
                p[f"dec{stage}_conv0"]["conv"]["kernel"],
                p[f"dec{stage}_conv0"]["conv"]["bias"],
                cdtype=cdtype,
            )
        )
        h = _leaky(
            _shift_conv_xla(
                h,
                p[f"dec{stage}_conv1"]["conv"]["kernel"],
                p[f"dec{stage}_conv1"]["conv"]["bias"],
                cdtype=cdtype,
            )
        )
        if stage < levels - 2:
            h = up2(h)

    # dec_final stays in XLA: the fused kernel (fused_dec_final) is exact
    # but its 96-channel VMEM buffers lane-pad to 128 and exceed VMEM at
    # 1024^2 band sizes; revisit with a packed-channel design.
    h = up2(h)
    h = jnp.concatenate([h, x4.astype(h.dtype)], axis=-1)
    h = _leaky(
        _shift_conv_xla(
            h,
            p["dec_final_conv0"]["conv"]["kernel"],
            p["dec_final_conv0"]["conv"]["bias"],
            cdtype=cdtype,
        )
    )
    h = _leaky(
        _shift_conv_xla(
            h,
            p["dec_final_conv1"]["conv"]["kernel"],
            p["dec_final_conv1"]["conv"]["bias"],
            cdtype=cdtype,
        )
    )
    hs = jnp.pad(h, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]
    return hs


def dense_blindspot_unet(
    params: Dict,
    x: jnp.ndarray,
    out_channels: int,
    levels: int = 5,
    cdtype=jnp.bfloat16,
    enc1_band: int = 8,
    head_band: int = 2,
    use_enc1_kernel: bool = False,
    use_head_kernel: bool = False,
    force_rect: bool = False,
    fold: str = "batch",
) -> jnp.ndarray:
    """Optimised equivalent of ``BlindspotUNet.apply`` (blindspot mode) for
    dense whole-image inference.  ``params`` is the module's param subtree;
    returns float32 (B, H, W, out_channels).  ``force_rect`` routes a
    square input through the two-lane fold (test hook: the folds must
    agree exactly).

    Square inputs use the reference's single rot4 batch fold (B -> 4B).
    RECTANGULAR inputs (H != W, each a multiple of 2^levels) use a
    two-lane fold: rot0/180 run as one (2B, H, W) batch and rot90/270 as a
    (2B, W, H) batch through the same backbone (weights shared by
    construction), un-rotated and channel-concatenated in the identical
    (0, 90, 180, 270) order.  This removes the square-padding tax the
    rot4 fold otherwise forces on rectangular micrographs: a 1024x1536
    image computes 2x(1024x1536) conv lanes instead of 2x(1536^2)
    (~1.5x fewer FLOPs; the reference itself would crash —
    image_wrapper.py:221-249 pads rectangles without squaring but its
    torch.cat of 90-degree rotations needs square maps).
    """
    from spr_pick_tpu.models.blindspot import rot4_stack, rot4_unstack, rotate

    p = params
    head_out = p["out_conv"]["conv"]["kernel"].shape[-1]
    assert head_out == out_channels, (
        f"out_channels={out_channels} but checkpoint head emits {head_out}"
    )

    square = x.shape[1] == x.shape[2] and not force_rect
    if fold == "channel" and x.shape[-1] == 1 and not use_enc1_kernel:
        # Rotation lanes packed into the CHANNEL dim (grouped convs with
        # weights tiled across lanes): identical math to the batch fold,
        # and 4x48=192 channels would amortise the 128-lane VMEM padding a
        # 48-channel lane pays 2.7x for.  MEASURED 2.4x SLOWER than the
        # batch fold on this backend (tools/bench_fold.py: 179 vs 73
        # ms/img at 1024^2 — XLA lowers feature_group_count convs poorly
        # here), so it stays an exactness-verified opt-in like the Pallas
        # kernels; re-evaluate on other toolchains.  Requires 1 input
        # channel (the production joint model).
        if square:
            xpack = jnp.concatenate(
                [rotate(x, r) for r in (0, 90, 180, 270)], axis=-1
            )
            chunks = jnp.split(
                _dense_backbone_packed(p, xpack, 4, levels, cdtype), 4, axis=-1
            )
            cat = jnp.concatenate(
                [rotate(c, r) for c, r in zip(chunks, (0, 270, 180, 90))],
                axis=-1,
            )
        else:
            pack_hw = jnp.concatenate([x, rotate(x, 180)], axis=-1)
            pack_wh = jnp.concatenate(
                [rotate(x, 90), rotate(x, 270)], axis=-1
            )
            c0, c180 = jnp.split(
                _dense_backbone_packed(p, pack_hw, 2, levels, cdtype), 2, axis=-1
            )
            c90, c270 = jnp.split(
                _dense_backbone_packed(p, pack_wh, 2, levels, cdtype), 2, axis=-1
            )
            cat = jnp.concatenate(
                [c0, rotate(c90, 270), rotate(c180, 180), rotate(c270, 90)],
                axis=-1,
            )
    else:
        bk = partial(
            _dense_backbone,
            p,
            levels=levels,
            cdtype=cdtype,
            enc1_band=enc1_band,
            use_enc1_kernel=use_enc1_kernel,
        )
        if square:
            cat = rot4_unstack(bk(rot4_stack(x)))
        else:
            lane_hw = jnp.concatenate([x, rotate(x, 180)], axis=0)
            lane_wh = jnp.concatenate([rotate(x, 90), rotate(x, 270)], axis=0)
            c0, c180 = jnp.split(bk(lane_hw), 2, axis=0)
            c90, c270 = jnp.split(bk(lane_wh), 2, axis=0)
            cat = jnp.concatenate(
                [c0, rotate(c90, 270), rotate(c180, 180), rotate(c270, 90)],
                axis=-1,
            )
    if not use_head_kernel:
        def conv1x1(t_, w, b):
            return jax.lax.dot_general(
                t_.astype(cdtype), w.astype(cdtype),
                (((3,), (0,)), ((), ())),
            ) + b.astype(cdtype)

        hh = _leaky(conv1x1(cat, p["out_block_conv0"]["conv"]["kernel"][0, 0],
                            p["out_block_conv0"]["conv"]["bias"]))
        hh = _leaky(conv1x1(hh, p["out_block_conv1"]["conv"]["kernel"][0, 0],
                            p["out_block_conv1"]["conv"]["bias"]))
        out = conv1x1(hh, p["out_conv"]["conv"]["kernel"][0, 0],
                      p["out_conv"]["conv"]["bias"])
        return out.astype(jnp.float32)
    return fused_head(
        cat,
        p["out_block_conv0"]["conv"]["kernel"][0, 0],
        p["out_block_conv0"]["conv"]["bias"],
        p["out_block_conv1"]["conv"]["kernel"][0, 0],
        p["out_block_conv1"]["conv"]["bias"],
        p["out_conv"]["conv"]["kernel"][0, 0],
        p["out_conv"]["conv"]["bias"],
        bt=head_band,
        cdtype=cdtype,
    )
