"""Blind-spot primitives: shifts, 90-degree rotations, shifted convolution.

TPU-native reformulation of the reference blind-spot machinery
(`spr_pick/models/utility.py:46-72`, `spr_pick/models/joint_network_v2.py:565-584`,
`spr_pick/utils/data.py:43-68`):

* ``Shift2d((1,0))`` (pad one side / crop the other) is a single asymmetric
  ``jnp.pad`` + slice.
* ``ShiftConv2d`` (pad top k//2, conv with SAME padding, crop bottom k//2) is
  expressed as ONE convolution with asymmetric padding
  ``((2*(k//2), 0), (k//2, k//2))`` — identical receptive field, but XLA sees
  a single fusable conv instead of pad/conv/slice, which keeps the op on the
  MXU with no extra HBM round-trips.
* The 4-rotation trick is a batch-axis fold (B -> 4B), exactly as the
  reference (`joint_network_v2.py:198-239`), so weights are shared by
  construction.

All code is NHWC (TPU-native layout).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

# Kaiming-normal (He) initialisation with leaky-relu slope a=0.1, matching
# `nn.init.kaiming_normal_(w, a=0.1)` at joint_network_v2.py:180.
# gain^2 = 2 / (1 + a^2)
KAIMING_LEAKY_01 = nn.initializers.variance_scaling(
    2.0 / (1.0 + 0.1 ** 2), "fan_in", "normal"
)
# `nn.init.kaiming_normal_(w, nonlinearity="linear")` (gain = 1).
KAIMING_LINEAR = nn.initializers.variance_scaling(1.0, "fan_in", "normal")
# torch default Conv2d init: kaiming_uniform(a=sqrt(5)) -> U(+-1/sqrt(fan_in)).
TORCH_CONV_DEFAULT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def shift_down(x: jnp.ndarray, rows: int = 1) -> jnp.ndarray:
    """Shift image content down by `rows` (zero-fill at top).  NHWC.

    Parity: Shift2d((rows, 0)) — spr_pick/models/utility.py:46-72.
    """
    if rows == 0:
        return x
    return jnp.pad(x, ((0, 0), (rows, 0), (0, 0), (0, 0)))[:, :-rows, :, :]


def rotate(x: jnp.ndarray, angle: int) -> jnp.ndarray:
    """Rotate NHWC images clockwise by multiples of 90 degrees.

    Parity: spr_pick/utils/data.py:43-68 (h_dim=1, w_dim=2 for NHWC).
    """
    if angle == 0:
        return x
    elif angle == 90:
        return jnp.swapaxes(jnp.flip(x, 2), 1, 2)
    elif angle == 180:
        return jnp.flip(jnp.flip(x, 2), 1)
    elif angle == 270:
        return jnp.swapaxes(jnp.flip(x, 1), 1, 2)
    else:
        raise NotImplementedError("Must be rotation divisible by 90 degrees")


def rot4_stack(x: jnp.ndarray) -> jnp.ndarray:
    """B,H,W,C -> 4B,H,W,C with rotations (0, 90, 180, 270)."""
    return jnp.concatenate([rotate(x, r) for r in (0, 90, 180, 270)], axis=0)


def rot4_unstack(x: jnp.ndarray) -> jnp.ndarray:
    """4B,H,W,C -> B,H,W,4C; un-rotates chunks with (0, 270, 180, 90).

    Parity: joint_network_v2.py:234-239.
    """
    chunks = jnp.split(x, 4, axis=0)
    aligned = [rotate(c, r) for c, r in zip(chunks, (0, 270, 180, 90))]
    return jnp.concatenate(aligned, axis=-1)


class ShiftConv(nn.Module):
    """Convolution whose receptive field is strictly above the current row.

    Fused equivalent of the reference's pad-top / SAME-conv / crop-bottom
    (`ShiftConv2d`, joint_network_v2.py:565-584): a single conv with
    asymmetric vertical padding (2*(k//2) on top, 0 on bottom).

    `dtype` selects the computation dtype (params stay float32); bfloat16
    halves HBM traffic and doubles MXU rate on TPU.
    """

    features: int
    kernel_size: int = 3
    blindspot: bool = True
    kernel_init: nn.initializers.Initializer = KAIMING_LEAKY_01
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        half = k // 2
        if self.blindspot:
            padding = ((2 * half, 0), (half, half))
        else:
            padding = ((half, half), (half, half))
        return nn.Conv(
            self.features,
            (k, k),
            strides=(1, 1),
            padding=padding,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pool (NHWC), floor semantics like torch MaxPool2d(2)."""
    h = (x.shape[1] // 2) * 2
    w = (x.shape[2] // 2) * 2
    x = x[:, :h, :w, :]
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample (NHWC)."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.1) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=negative_slope)
