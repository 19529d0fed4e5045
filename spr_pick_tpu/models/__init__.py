from spr_pick_tpu.models.blindspot import (
    ShiftConv,
    rot4_stack,
    rot4_unstack,
    rotate,
    shift_down,
)
from spr_pick_tpu.models.unet import BlindspotUNet, NoiseEstNetwork
from spr_pick_tpu.models.resnet import (
    BasicConv2d,
    LinearClassifier,
    MaxPoolLayer,
    ResidA,
    ResNet6,
    ResNet8,
    ResNet16,
)
from spr_pick_tpu.models.joint import Detector, JointNetwork

__all__ = [
    "ShiftConv",
    "rot4_stack",
    "rot4_unstack",
    "rotate",
    "shift_down",
    "BlindspotUNet",
    "NoiseEstNetwork",
    "BasicConv2d",
    "LinearClassifier",
    "MaxPoolLayer",
    "ResidA",
    "ResNet6",
    "ResNet8",
    "ResNet16",
    "Detector",
    "JointNetwork",
]
