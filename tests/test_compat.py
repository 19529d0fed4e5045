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
    from spr_pick_tpu.compat import convert_cfg

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


def test_evaluator_loads_reference_checkpoint_directly(tmp_path):
    """A raw torch .wt from the reference loads with NO conversion step:
    ckpt.load sniffs the torch zip magic and converts in-process."""
    try:
        from tests.reference_compat import import_reference, reference_available
    except ImportError:
        pytest.skip("reference helpers unavailable")
    if not reference_available():
        pytest.skip("reference or torch unavailable")
    import_reference()
    import torch

    import spr_pick.cfg as ref_cfg_mod
    from spr_pick.models.joint_network_v2 import JointNetwork as RefJoint
    from spr_pick.params import ConfigValue as RefCV
    from spr_pick.params import NoiseAlgorithm as RefNA
    from spr_pick.params import NoiseValue as RefNV

    torch.manual_seed(0)
    ref_model = RefJoint(in_channels=1, out_channels=2, blindspot=True, detect=True)
    ref_cfg = ref_cfg_mod.base()
    ref_cfg[RefCV.ALGORITHM] = RefNA.SELFSUPERVISED_DENOISING
    ref_cfg[RefCV.NOISE_VALUE] = RefNV.UNKNOWN_CONSTANT
    ref_cfg[RefCV.NOISE_STYLE] = "gauss"
    sd = {
        f"models.denoiser_model.{k}": v for k, v in ref_model.state_dict().items()
    }
    sd["l_params.estimated_sigma"] = torch.zeros((1, 1, 1, 1))
    sd["cfg"] = ref_cfg
    wt_path = str(tmp_path / "final-ref.wt")
    torch.save(sd, wt_path)  # torch>=1.6 zip archive

    from spr_pick_tpu.utils import checkpoint as ckpt

    state = ckpt.load(wt_path)
    assert state["format"] == "spr_pick_tpu.wt.v1"

    from spr_pick_tpu.eval import DenoiserEvaluator
    from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm

    ev = DenoiserEvaluator(wt_path, runs_dir=str(tmp_path / "runs"))
    assert ev.cfg[ConfigValue.ALGORITHM] == NoiseAlgorithm.SELFSUPERVISED_DENOISING
    k = np.asarray(
        ev.train_state.trainable["model"]["denoise_branch"]["enc1_conv0"][
            "conv"]["kernel"]
    )
    ref_k = sd[
        "models.denoiser_model.denoise_branch.encode_block_1.0.weight"
    ].numpy()
    np.testing.assert_array_equal(k, np.transpose(ref_k, (2, 3, 1, 0)))


def test_load_rejects_garbage_with_clear_error(tmp_path):
    bad = str(tmp_path / "junk.training")
    with open(bad, "wb") as f:
        f.write(b"\x00\x01not a checkpoint at all")
    from spr_pick_tpu.utils import checkpoint as ckpt

    with pytest.raises(ValueError, match="not a spr_pick_tpu"):
        ckpt.load(bad)


def test_import_reference_leaves_no_stub_modules():
    """_import_reference_package must not poison sys.modules: any stub it
    installs for the reference's optional deps is removed again once the
    import attempt finishes (ADVICE r3: a lingering empty `h5py`/`cv2` stub
    degrades later real imports in the same process)."""
    import sys

    from spr_pick_tpu.compat import _import_reference_package

    candidates = [
        "cv2", "imagesize", "h5py", "colorlog", "colored_traceback",
        "torchvision", "torchvision.transforms",
        "torchvision.transforms.functional", "torchvision.datasets",
        "torchvision.datasets.folder", "torchvision.utils",
    ]
    before = {n: sys.modules.get(n) for n in candidates}
    _import_reference_package()
    for n in candidates:
        after = sys.modules.get(n)
        if before[n] is not None:
            continue  # was already (really) imported; not ours to touch
        assert after is None or getattr(after, "__file__", None), (
            f"stub module {n!r} left behind in sys.modules"
        )


def test_import_reference_keep_stubs_defers_cleanup():
    """With keep_stubs, stub removal is DEFERRED to the caller: the
    unpickler lazily imports reference submodules during torch.load, so
    load_reference_checkpoint needs the stubs to outlive the import
    attempt itself — and then must still leave sys.modules clean."""
    import sys

    from spr_pick_tpu.compat import _import_reference_package

    stubbed: list = []
    _import_reference_package(keep_stubs=stubbed)
    try:
        for n in stubbed:
            mod = sys.modules.get(n)
            assert mod is not None and not getattr(mod, "__file__", None), (
                f"recorded stub {n!r} not alive for the caller's unpickle"
            )
    finally:
        for n in stubbed:
            sys.modules.pop(n, None)
    for n in stubbed:
        assert n not in sys.modules


def test_denoise_only_reference_checkpoint_infers_denoise_mode(tmp_path):
    """A reference checkpoint with NO detector weights must not load as
    mode='joint' (it would fail confusingly at apply time); the loader
    downgrades to 'denoise' and warns (ADVICE r3)."""
    torch = pytest.importorskip("torch")

    from spr_pick_tpu.compat import _UNET5, load_reference_checkpoint

    sd = {}
    mp = "models.denoiser_model.denoise_branch."
    for ref_name in _UNET5:
        o = 2 if ref_name == "output_conv" else 48
        sd[mp + ref_name + ".weight"] = torch.zeros(o, 16, 3, 3)
        sd[mp + ref_name + ".bias"] = torch.zeros(o)
    sd["cfg"] = {}
    wt_path = str(tmp_path / "denoise-only.wt")
    torch.save(sd, wt_path)

    state = load_reference_checkpoint(wt_path)  # default mode="joint"
    assert state["mode"] == "denoise"
    assert "detector" not in state["trainable"]["model"]


def test_checkpoint_load_error_chains_reference_failure(tmp_path):
    """The displayed exception chain must carry the reference-load failure
    (it holds the actionable guidance), not only the native-pickle error."""
    bad = str(tmp_path / "junk2.training")
    with open(bad, "wb") as f:
        f.write(b"\x00\x01not a checkpoint at all")
    from spr_pick_tpu.utils import checkpoint as ckpt

    try:
        ckpt.load(bad)
        raise AssertionError("expected ValueError")
    except ValueError as exc:
        # __cause__ is the reference-load failure; the native error's text
        # is folded into the message.
        assert exc.__cause__ is not None
        assert "not a spr_pick_tpu pickle (" in str(exc)
