"""Learning-rate schedule and conv-stack geometry helpers.

Parity: `spr_pick/utils/utils.py:18-69`.
"""

from __future__ import annotations

import numpy as np


def compute_ramped_lrate(
    i: int,
    iteration_count: int,
    ramp_up_fraction: float,
    ramp_down_fraction: float,
    learning_rate: float,
) -> float:
    """Cosine ramp-up / ramp-down schedule (Laine et al.).

    Parity: spr_pick/utils/utils.py:50-69.  NOTE the reference trainer calls
    this with (rampdown, rampup) swapped relative to the signature
    (train.py:433-441) — we preserve the *call-site* behaviour in the trainer,
    and keep this function's signature faithful to the reference.
    """
    if ramp_up_fraction > 0.0:
        ramp_up_end_iter = iteration_count * ramp_up_fraction
        if i <= ramp_up_end_iter:
            t = (i / ramp_up_fraction) / iteration_count
            learning_rate = learning_rate * (0.5 - np.cos(t * np.pi) / 2)

    if ramp_down_fraction > 0.0:
        ramp_down_start_iter = iteration_count * (1 - ramp_down_fraction)
        if i >= ramp_down_start_iter:
            t = ((i - ramp_down_start_iter) / ramp_down_fraction) / iteration_count
            learning_rate = learning_rate * (0.5 + np.cos(t * np.pi) / 2) ** 2

    return learning_rate


def insize_from_outsize(layers, outsize: int) -> int:
    """Input size of a conv stack producing `outsize` outputs.

    `layers` is a sequence of objects (or dicts) carrying kernel_size /
    stride / padding / dilation.  Parity: spr_pick/utils/utils.py:18-47.
    """

    def _get(layer, name, default):
        if isinstance(layer, dict):
            v = layer.get(name, default)
        else:
            v = getattr(layer, name, default)
        if isinstance(v, tuple):
            v = v[0]
        return v

    for layer in layers[::-1]:
        kernel_size = _get(layer, "kernel_size", 1)
        stride = _get(layer, "stride", 1)
        pad = _get(layer, "padding", 0)
        dilation = _get(layer, "dilation", 1)
        outsize = (outsize - 1) * stride + 1 + (kernel_size - 1) * dilation - 2 * pad
    return outsize
