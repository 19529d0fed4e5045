"""spr_pick_tpu — TPU-native joint cryo-EM denoising + particle picking.

A ground-up JAX/XLA/Pallas re-design of the capabilities of nextpyp/spr_pick
(blind-spot U-Net self-supervised denoising + Topaz-style PU particle
detection, trained jointly), built for TPU: NHWC layouts, pure-functional
models with explicit dense/"fill" plans instead of module mutation, jitted
train/eval steps, device-resident data plane, on-device NMS, and
data-parallel scaling over a `jax.sharding.Mesh`.
"""

from spr_pick_tpu import cfg, params
from spr_pick_tpu.params import (
    ConfigValue,
    DatasetType,
    NoiseAlgorithm,
    NoiseValue,
    Pipeline,
    PipelineOutput,
)

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: `from spr_pick_tpu import Picker` without importing jax/pandas
    # at package-import time.
    if name == "Picker":
        from spr_pick_tpu.api import Picker

        return Picker
    raise AttributeError(f"module 'spr_pick_tpu' has no attribute {name!r}")
