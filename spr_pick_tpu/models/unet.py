"""Laine-style blind-spot U-Net (the `DualNetwork` family).

Parity: `spr_pick/models/joint_network_v2.py:11-286` (DualNetwork, 5 levels),
`spr_pick/models/joint_network_v2_shallow.py` (DualNetworkShallow, 3 levels)
and `spr_pick/models/noise_network.py` (NoiseNetwork: same topology, single
head).  One parameterised module covers all three: ``levels`` selects the
pooling depth and ``blindspot`` toggles the shifted-conv / rot4 machinery.

Topology (per reference):
  encode_1: conv(in->48) conv(48->48) pool        (two convs only in block 1)
  encode_i: conv(48->48) pool          for i in 2..levels
  encode_bottom: conv(48->48)
  decode: upsample, then per skip (pool_{levels-1} .. pool_1):
      concat -> conv(->96) conv(96->96) -> upsample
      (first decode stage input is 48+48=96, later stages 96+48=144)
  final: concat(input) -> conv(96+in->96) conv(96->96)
  blindspot head: shift-down-1, un-rotate concat (4C=384),
      1x1 conv 384->384, 1x1 conv 384->96, 1x1 conv 96->out
  plain head: 1x1 conv 96->96, 1x1 conv 96->96, 1x1 conv 96->out
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from spr_pick_tpu.models.blindspot import (
    KAIMING_LEAKY_01,
    KAIMING_LINEAR,
    ShiftConv,
    leaky_relu,
    max_pool_2x2,
    rot4_stack,
    rot4_unstack,
    shift_down,
    upsample_nearest_2x,
)


class BlindspotUNet(nn.Module):
    """Blind-spot (or plain) U-Net backbone with 1x1-conv output head."""

    in_channels: int = 1
    out_channels: int = 1
    blindspot: bool = False
    levels: int = 5
    zero_output_weights: bool = False

    @property
    def input_wh_mul(self) -> int:
        """Input H/W must be a multiple of this (2^levels).

        Parity: joint_network_v2.py:276-286.
        """
        return 2 ** self.levels

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bs = self.blindspot

        if bs:
            x = rot4_stack(x)
        inp = x

        def conv(h, features, name):
            h = ShiftConv(features, 3, blindspot=bs, name=name)(h)
            return leaky_relu(h)

        def pool(h):
            if bs:
                h = shift_down(h, 1)
            return max_pool_2x2(h)

        # Encoder
        skips = []
        h = conv(x, 48, "enc1_conv0")
        h = conv(h, 48, "enc1_conv1")
        h = pool(h)
        skips.append(h)  # pool1
        for i in range(2, self.levels + 1):
            h = conv(h, 48, f"enc{i}_conv0")
            h = pool(h)
            skips.append(h)  # pool_i
        h = conv(h, 48, "enc_bottom_conv0")

        # Decoder: concat with pools levels-1 .. 1
        h = upsample_nearest_2x(h)
        for stage, skip in enumerate(reversed(skips[:-1])):
            h = jnp.concatenate([h, skip], axis=-1)
            h = conv(h, 96, f"dec{stage}_conv0")
            h = conv(h, 96, f"dec{stage}_conv1")
            h = upsample_nearest_2x(h)
        h = jnp.concatenate([h, inp], axis=-1)
        h = conv(h, 96, "dec_final_conv0")
        h = conv(h, 96, "dec_final_conv1")

        # Output head
        if bs:
            h = shift_down(h, 1)
            h = rot4_unstack(h)  # B,H,W,384
            nin = 384
        else:
            nin = 96
        h = ShiftConv(nin, 1, blindspot=bs, name="out_block_conv0")(h)
        h = leaky_relu(h)
        h = ShiftConv(96, 1, blindspot=bs, name="out_block_conv1")(h)
        h = leaky_relu(h)

        out_init = (
            nn.initializers.zeros if self.zero_output_weights else KAIMING_LINEAR
        )
        h = ShiftConv(
            self.out_channels, 1, blindspot=bs, kernel_init=out_init, name="out_conv"
        )(h)
        return h
