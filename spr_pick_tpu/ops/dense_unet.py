"""Optimised dense inference for the blind-spot U-Net.

The dense (whole-micrograph) forward of `BlindspotUNet` is HBM-bandwidth
bound (docs/PERF.md).  `dense_blindspot_unet` re-expresses it as a lean
XLA program — direct lax convs with the blind-spot shifts folded into
asymmetric padding, the shift+pool pair fused into one reduce_window,
nearest-2x upsamples as repeats, and the 1x1 head chain as dot_generals —
which measures ~12% faster than the flax module graph at 1024^2 on the
dev chip while remaining numerically exact (tests/test_dense_unet.py).

Kernel lifecycle (docs/PERF.md promote-or-delete criterion, executed
round 5 on an unthrottled chip — measured bf16 matmul peak 89% of the
v5e spec, precondition met): three exactness-verified alternatives that
lived here as opt-ins (this module was ops/pallas_unet.py then) each
LOST their A/B against this XLA program and were deleted per the
criterion (git history has the code):

* ``fused_enc1`` (Pallas encode_1 block as row strips): failed to lower
  at 1024^2 — its 48-channel f32 band buffers lane-pad to 128 and
  exceed the 16 MB scoped-VMEM stack limit.
* ``fused_head`` (Pallas 1x1 head chain): 0.95x — XLA already fuses the
  dot_general chain.
* ``fold="channel"`` (rotation lanes packed into the channel dim via
  grouped convs): 0.37x — XLA lowers feature_group_count convs poorly.

The one promoted kernel lives in ops/nms_pallas.py (VMEM-resident greedy
NMS, 2.3-3.4x over the XLA multipeak kernel, the default TPU dispatch in
ops/nms.py).

Blind-spot geometry (parity: joint_network_v2.py:565-584): the reference
ShiftConv (pad top k//2, SAME conv, crop bottom) computes
``y[r] = sum_u W[u] x[r+u-2]`` for k=3 — vertical taps at (-2,-1,0) —
and every conv zero-pads its own INPUT, so values computed outside the
image must be re-zeroed before the next conv (the `inside` masks).

Square inputs take the reference's single rot4 batch fold; rectangular
inputs (H != W) take a two-lane fold (rot0/180 at H x W, rot90/270 at
W x H) through the same backbone — see ``dense_blindspot_unet``.  (The
reference's ``torch.cat`` of 90-degree rotations needs square maps and
would crash.)
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp


def _leaky(x):
    return jnp.where(x >= 0, x, x * 0.1)


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


def _dense_backbone(
    p: Dict,
    x4: jnp.ndarray,
    levels: int,
    cdtype,
) -> jnp.ndarray:
    """Everything between the rotation fold and the un-rotation: enc1 ..
    dec_final + final shift-down, on a stack of same-shape rotated lanes.
    Shared by the square (4B) and rectangular (2x 2B) folds — the convs
    are batch-independent, so weights are shared by construction."""
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
    force_rect: bool = False,
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
    bk = partial(_dense_backbone, p, levels=levels, cdtype=cdtype)
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
