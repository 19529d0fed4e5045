"""Numerical parity against the actual PyTorch reference implementation.

Loads reference-initialised weights through the checkpoint importer
(spr_pick_tpu/compat.py) and checks that this framework's forward passes
reproduce the reference bit-for-bit (to float32 tolerance):

  * blind-spot DualNetwork (shift/rot4 choreography + heads),
  * Detector (BatchNorm + ResNet8 + classifier), strided and dense/filled.

Skipped when /root/reference or torch is unavailable.
"""

import jax
import numpy as np
import pytest

from tests.reference_compat import import_reference, reference_available

# The TPU MXU computes f32 convs in bf16x3 by default (the production mode);
# parity against torch f32 is checked at highest precision.

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference or torch unavailable"
)


@pytest.fixture(scope="module")
def ref():
    return import_reference()


def _ref_joint():
    from spr_pick.models.joint_network_v2 import JointNetwork

    return JointNetwork


@pytest.fixture(scope="module")
def torch():
    import torch

    torch.manual_seed(0)
    return torch


@pytest.mark.slow
def test_blindspot_unet_parity(ref, torch, rng):
    from spr_pick_tpu.compat import trainable_static_from_reference
    from spr_pick_tpu.models import BlindspotUNet

    ref_model = _ref_joint()(
        in_channels=1, out_channels=2, blindspot=True, detect=True
    )
    ref_model.eval()

    # Wrap in the Denoiser state_dict layout the importer expects.
    sd = {f"models.denoiser_model.{k}": v for k, v in ref_model.state_dict().items()}
    trainable, static = trainable_static_from_reference(sd)

    x = rng.rand(1, 64, 64, 1).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        ref_out, _ = ref_model.denoise_branch(xt)
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))

    unet = BlindspotUNet(in_channels=1, out_channels=2, blindspot=True)
    with jax.default_matmul_precision("highest"):
        mine = unet.apply({"params": trainable["model"]["denoise_branch"]}, x)
    np.testing.assert_allclose(np.asarray(mine), ref_out, rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_detector_parity_strided_and_dense(ref, torch, rng):
    from spr_pick_tpu.compat import trainable_static_from_reference
    from spr_pick_tpu.models import Detector

    ref_model = _ref_joint()(
        in_channels=1, out_channels=2, blindspot=True, detect=True
    )
    ref_model.eval()
    sd = {f"models.denoiser_model.{k}": v for k, v in ref_model.state_dict().items()}
    trainable, static = trainable_static_from_reference(sd)

    z = rng.rand(1, 96, 96, 1).astype(np.float32) * 2 - 1
    zt = torch.from_numpy(np.transpose(z, (0, 3, 1, 2)))

    variables = {
        "params": trainable["model"]["detector"],
        "batch_stats": static["model"]["detector"],
    }

    # Strided (train-geometry) detector, eval statistics.
    ref_model.detector.unfill()
    with torch.no_grad():
        ref_det = ref_model.detector(zt).numpy()
    with jax.default_matmul_precision("highest"):
        mine = Detector(dense=False).apply(variables, z, False)
    np.testing.assert_allclose(
        np.asarray(mine)[..., 0], ref_det[:, 0], rtol=1e-4, atol=1e-4
    )

    # Dense (filled) detector == reference fill() path.
    ref_model.detector.fill()
    with torch.no_grad():
        ref_dense = ref_model.detector(zt).numpy()
    ref_model.detector.unfill()
    with jax.default_matmul_precision("highest"):
        mine_dense = Detector(dense=True).apply(variables, z, False)
    np.testing.assert_allclose(
        np.asarray(mine_dense)[..., 0], ref_dense[:, 0], rtol=1e-4, atol=1e-4
    )
