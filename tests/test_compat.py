"""Checkpoint importer unit tests (torch-free parts + cfg mapping)."""

import numpy as np
import pytest

from spr_pick_tpu.compat import (
    _UNET3,
    _UNET5,
    convert_reference_state_dict,
    trainable_static_from_reference,
)


def _fake_conv(o, i, k):
    return np.random.RandomState(o + i + k).randn(o, i, k, k).astype(np.float32)


def test_unet_name_map_covers_all_blocks():
    # 5-level: enc 1..5 + bottom, dec0..3 + final, head
    assert len(_UNET5) == 20
    assert len(_UNET3) == 14


def test_convert_minimal_unet():
    sd = {}
    mp = "models.denoiser_model.denoise_branch."
    for ref_name in _UNET5:
        o = 2 if ref_name == "output_conv" else 48
        sd[mp + ref_name + ".weight"] = _fake_conv(o, 16, 3)
        sd[mp + ref_name + ".bias"] = np.zeros(o, np.float32)
    params, stats, sigma, _, est = convert_reference_state_dict(sd)
    db = params["denoise_branch"]
    assert set(db.keys()) == set(_UNET5.values())
    # OIHW -> HWIO
    assert db["enc1_conv0"]["conv"]["kernel"].shape == (3, 3, 16, 48)
    assert sigma is None and est is None


def test_convert_with_sigma_and_lparam():
    sd = {}
    sp = "models.sigma_estimation_model."
    for ref_name in _UNET3:
        sd[sp + ref_name + ".weight"] = _fake_conv(16, 8, 3)
        sd[sp + ref_name + ".bias"] = np.zeros(16, np.float32)
    sd["l_params.estimated_sigma"] = np.ones((1, 1, 1, 1), np.float32)
    trainable, static = trainable_static_from_reference(sd)
    assert "sigma" in trainable
    assert trainable["l_params"]["estimated_sigma"].shape == (1, 1, 1, 1)


def test_cfg_conversion():
    try:
        from tests.reference_compat import import_reference, reference_available
    except ImportError:
        pytest.skip("reference helpers unavailable")
    if not reference_available():
        pytest.skip("reference unavailable")
    import_reference()
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from import_reference_checkpoint import convert_cfg

    import spr_pick.cfg as ref_cfg_mod
    from spr_pick.params import ConfigValue as RefCV
    from spr_pick.params import NoiseAlgorithm as RefNA

    ref_cfg = ref_cfg_mod.base()
    ref_cfg[RefCV.ALGORITHM] = RefNA.SELFSUPERVISED_DENOISING
    ref_cfg[RefCV.ITERATIONS] = 12345

    from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm

    out = convert_cfg(ref_cfg)
    assert out[ConfigValue.ITERATIONS] == 12345
    assert out[ConfigValue.ALGORITHM] == NoiseAlgorithm.SELFSUPERVISED_DENOISING
    assert out[ConfigValue.BB] == 24
