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
    # Channel widths: 48/96 for DualNetwork/NoiseNetwork; 16/32 reproduces
    # the thin NoiseEstNetwork (noise_estimation_network.py:34-143).
    enc_features: int = 48
    dec_features: int = 96
    # Computation dtype (params stay f32); bf16 recommended on TPU.
    dtype: jnp.dtype = None

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
            h = ShiftConv(features, 3, blindspot=bs, dtype=self.dtype, name=name)(h)
            return leaky_relu(h)

        def pool(h):
            if bs:
                h = shift_down(h, 1)
            return max_pool_2x2(h)

        enc = self.enc_features
        dec = self.dec_features

        # Encoder
        skips = []
        h = conv(x, enc, "enc1_conv0")
        h = conv(h, enc, "enc1_conv1")
        h = pool(h)
        skips.append(h)  # pool1
        for i in range(2, self.levels + 1):
            h = conv(h, enc, f"enc{i}_conv0")
            h = pool(h)
            skips.append(h)  # pool_i
        h = conv(h, enc, "enc_bottom_conv0")

        # Decoder: concat with pools levels-1 .. 1
        h = upsample_nearest_2x(h)
        for stage, skip in enumerate(reversed(skips[:-1])):
            h = jnp.concatenate([h, skip], axis=-1)
            h = conv(h, dec, f"dec{stage}_conv0")
            h = conv(h, dec, f"dec{stage}_conv1")
            h = upsample_nearest_2x(h)
        h = jnp.concatenate([h, inp], axis=-1)
        h = conv(h, dec, "dec_final_conv0")
        h = conv(h, dec, "dec_final_conv1")

        # Output head
        if bs:
            h = shift_down(h, 1)
            h = rot4_unstack(h)  # B,H,W,4*dec
            nin = 4 * dec
        else:
            nin = dec
        h = ShiftConv(nin, 1, blindspot=bs, dtype=self.dtype, name="out_block_conv0")(h)
        h = leaky_relu(h)
        h = ShiftConv(dec, 1, blindspot=bs, dtype=self.dtype, name="out_block_conv1")(h)
        h = leaky_relu(h)

        out_init = (
            nn.initializers.zeros if self.zero_output_weights else KAIMING_LINEAR
        )
        h = ShiftConv(
            self.out_channels, 1, blindspot=bs, kernel_init=out_init,
            dtype=self.dtype, name="out_conv",
        )(h)
        # Heads feed the NLL math: always hand back float32.
        return h.astype(jnp.float32)


def NoiseEstNetwork(in_channels: int = 1, out_channels: int = 1,
                    blindspot: bool = False) -> BlindspotUNet:
    """Thin (16/32-channel) sigma-estimation U-Net.

    Parity: spr_pick/models/noise_estimation_network.py (imported by the
    reference but never instantiated on the active path).
    """
    return BlindspotUNet(
        in_channels=in_channels,
        out_channels=out_channels,
        blindspot=blindspot,
        levels=5,
        enc_features=16,
        dec_features=32,
    )
