"""Reference (PyTorch) checkpoint import.

Converts `nextpyp/spr_pick` checkpoints (`.training` / `.wt` torch pickles,
train.py:963-982 / denoiser_v2.py:851-855) into this framework's variable
trees, so users can bring trained reference models across.

Name mapping (reference module path -> flax tree path):

  models.denoiser_model.denoise_branch.encode_block_1.{0,2} -> enc1_conv{0,1}
  ...encode_block_i.0 (i=2..5)                              -> enc{i}_conv0
  ...encode_block_6.0                                       -> enc_bottom_conv0
  ...decode_block_5.{0,2}                                   -> dec0_conv{0,1}
  ...decode_block_4.{0,2}                                   -> dec1_conv{0,1}
  ...decode_block_3.{0,2}                                   -> dec2_conv{0,1}
  ...decode_block_2.{0,2}                                   -> dec3_conv{0,1}
  ...decode_block_1.{0,2}                                   -> dec_final_conv{0,1}
  ...output_block.{0,2}                                     -> out_block_conv{0,1}
  ...output_conv                                            -> out_conv
  models.denoiser_model.detector.m                          -> detector/input_bn
  models.denoiser_model.detector.detector.features.features.{0..4}
        -> detector/classifier/features/layer{0..4}
  models.denoiser_model.detector.detector.classifier        -> detector/classifier/classifier
  models.sigma_estimation_model.* (DualNetworkShallow)      -> sigma tree
  l_params.estimated_sigma                                  -> l_params/estimated_sigma

Weights transpose torch OIHW -> flax HWIO; BatchNorm weight/bias ->
scale/bias with running_mean/var into the batch_stats collection.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import numpy as np

# UNet conv-name maps per depth (levels=5 full, levels=3 shallow).
_UNET5 = {
    "encode_block_1.0": "enc1_conv0",
    "encode_block_1.2": "enc1_conv1",
    "encode_block_2.0": "enc2_conv0",
    "encode_block_3.0": "enc3_conv0",
    "encode_block_4.0": "enc4_conv0",
    "encode_block_5.0": "enc5_conv0",
    "encode_block_6.0": "enc_bottom_conv0",
    "decode_block_5.0": "dec0_conv0",
    "decode_block_5.2": "dec0_conv1",
    "decode_block_4.0": "dec1_conv0",
    "decode_block_4.2": "dec1_conv1",
    "decode_block_3.0": "dec2_conv0",
    "decode_block_3.2": "dec2_conv1",
    "decode_block_2.0": "dec3_conv0",
    "decode_block_2.2": "dec3_conv1",
    "decode_block_1.0": "dec_final_conv0",
    "decode_block_1.2": "dec_final_conv1",
    "output_block.0": "out_block_conv0",
    "output_block.2": "out_block_conv1",
    "output_conv": "out_conv",
}
# Shallow (3-level) sigma estimator: decode uses blocks 5 then 2 then 1
# (joint_network_v2_shallow.py forward; decode_block_3 exists but is dead).
_UNET3 = {
    "encode_block_1.0": "enc1_conv0",
    "encode_block_1.2": "enc1_conv1",
    "encode_block_2.0": "enc2_conv0",
    "encode_block_3.0": "enc3_conv0",
    "encode_block_6.0": "enc_bottom_conv0",
    "decode_block_5.0": "dec0_conv0",
    "decode_block_5.2": "dec0_conv1",
    "decode_block_2.0": "dec1_conv0",
    "decode_block_2.2": "dec1_conv1",
    "decode_block_1.0": "dec_final_conv0",
    "decode_block_1.2": "dec_final_conv1",
    "output_block.0": "out_block_conv0",
    "output_block.2": "out_block_conv1",
    "output_conv": "out_conv",
}

_RESNET_LAYER = ["layer0", "layer1", "layer2", "layer3", "layer4"]


def _t(w: np.ndarray) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: Dict, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = np.asarray(value)


def _convert_unet(sd: Dict[str, Any], prefix: str, name_map: Dict[str, str],
                  params: Dict):
    for ref_name, our_name in name_map.items():
        w = sd.get(prefix + ref_name + ".weight")
        if w is None:
            continue
        _set(params, (our_name, "conv", "kernel"), _t(np.asarray(w)))
        b = sd.get(prefix + ref_name + ".bias")
        if b is not None:
            _set(params, (our_name, "conv", "bias"), np.asarray(b))


def _convert_bn(sd, prefix, params, stats, path):
    _set(params, path + ("scale",), np.asarray(sd[prefix + ".weight"]))
    _set(params, path + ("bias",), np.asarray(sd[prefix + ".bias"]))
    _set(stats, path + ("mean",), np.asarray(sd[prefix + ".running_mean"]))
    _set(stats, path + ("var",), np.asarray(sd[prefix + ".running_var"]))


def _convert_resnet8(sd, prefix, params, stats, base):
    """prefix ends at '...features.features.'"""
    for i, layer in enumerate(_RESNET_LAYER):
        lp = f"{prefix}{i}."
        if i in (0, 4):  # BasicConv2d
            _set(params, base + (layer, "conv", "kernel"), _t(np.asarray(sd[lp + "conv.weight"])))
            if lp + "conv.bias" in sd:
                _set(params, base + (layer, "conv", "bias"), np.asarray(sd[lp + "conv.bias"]))
            if lp + "bn.weight" in sd:
                _convert_bn(sd, lp + "bn", params, stats, base + (layer, "bn"))
        else:  # ResidA
            _set(params, base + (layer, "conv0", "kernel"), _t(np.asarray(sd[lp + "conv0.weight"])))
            _set(params, base + (layer, "conv1", "kernel"), _t(np.asarray(sd[lp + "conv1.weight"])))
            if lp + "conv0.bias" in sd:
                _set(params, base + (layer, "conv0", "bias"), np.asarray(sd[lp + "conv0.bias"]))
            if lp + "conv1.bias" in sd:
                _set(params, base + (layer, "conv1", "bias"), np.asarray(sd[lp + "conv1.bias"]))
            if lp + "proj.weight" in sd:
                _set(params, base + (layer, "proj", "kernel"), _t(np.asarray(sd[lp + "proj.weight"])))
            if lp + "bn0.weight" in sd:
                _convert_bn(sd, lp + "bn0", params, stats, base + (layer, "bn0"))
            if lp + "bn1.weight" in sd:
                _convert_bn(sd, lp + "bn1", params, stats, base + (layer, "bn1"))


def convert_reference_state_dict(
    sd: Dict[str, Any],
) -> Tuple[Dict, Dict, Optional[Dict], Optional[Dict], Optional[np.ndarray]]:
    """Reference Denoiser.state_dict() -> (model_params, model_stats,
    sigma_params, sigma_stats, estimated_sigma).

    `sd` values may be torch tensors or numpy arrays.
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items() if hasattr(v, "__len__") or np.ndim(v) >= 0}

    model_params: Dict = {}
    model_stats: Dict = {}

    mp = "models.denoiser_model."
    # denoise branch (5-level blind-spot UNet)
    unet_params: Dict = {}
    _convert_unet(sd, mp + "denoise_branch.", _UNET5, unet_params)
    model_params["denoise_branch"] = unet_params

    # detector: BatchNorm2d(1) + LinearClassifier(ResNet8)
    det_params: Dict = {}
    det_stats: Dict = {}
    if mp + "detector.m.weight" in sd:
        _convert_bn(sd, mp + "detector.m", det_params, det_stats, ("input_bn",))
        # Note: flax adopts the ResNet8 instance at the Detector scope root
        # (named "features"); the 1x1 head lives at classifier/classifier.
        _convert_resnet8(
            sd, mp + "detector.detector.features.features.",
            det_params, det_stats, ("features",),
        )
        _set(det_params, ("classifier", "classifier", "kernel"),
             _t(np.asarray(sd[mp + "detector.detector.classifier.weight"])))
        _set(det_params, ("classifier", "classifier", "bias"),
             np.asarray(sd[mp + "detector.detector.classifier.bias"]))
        model_params["detector"] = det_params
        model_stats["detector"] = det_stats

    # sigma estimator (shallow UNet), optional
    sigma_params: Optional[Dict] = None
    sp = "models.sigma_estimation_model."
    if sp + "encode_block_1.0.weight" in sd:
        sigma_params = {}
        _convert_unet(sd, sp, _UNET3, sigma_params)

    est_sigma = sd.get("l_params.estimated_sigma")

    return model_params, model_stats, sigma_params, None, est_sigma


def trainable_static_from_reference(sd: Dict) -> Tuple[Dict, Dict]:
    """Full (trainable, static) trees in this framework's layout."""
    mp, ms, sp, _, est = convert_reference_state_dict(sd)
    trainable: Dict = {"model": mp}
    static: Dict = {"model": ms}
    if sp is not None:
        trainable["sigma"] = sp
    if est is not None:
        trainable["l_params"] = {"estimated_sigma": np.asarray(est)}
    return trainable, static


def convert_cfg(ref_cfg) -> Dict:
    """Reference enum-keyed cfg -> this framework's cfg (matched by member
    name; unknown keys dropped, enum values remapped by name)."""
    from spr_pick_tpu import cfg as cfg_mod
    from spr_pick_tpu import params as p

    out = cfg_mod.base()
    enum_types = {
        "NoiseAlgorithm": p.NoiseAlgorithm,
        "NoiseValue": p.NoiseValue,
        "Pipeline": p.Pipeline,
        "DatasetType": p.DatasetType,
    }
    for key, value in ref_cfg.items():
        key_name = getattr(key, "name", str(key))
        try:
            our_key = p.ConfigValue[key_name]
        except KeyError:
            continue
        tname = type(value).__name__
        if tname in enum_types:
            value = enum_types[tname][value.name]
        if our_key == p.ConfigValue.LEARNING_RATE and value == 1e-5:
            # The reference stores its dead 1e-5 default but TRAINS at the
            # hardcoded 1e-4 (spr_pick/train.py:441); map to what the
            # checkpoint was actually trained with, since this framework
            # reads the cfg value for real.
            value = 1e-4
        out[our_key] = value
    return out


def _import_reference_package(keep_stubs: Optional[list] = None) -> bool:
    """Best-effort import of the reference `spr_pick` package, needed only
    to unpickle its enum/cfg classes from torch checkpoints.

    Plain ``import spr_pick`` first (the normal case in an environment
    migrating from the reference).  On failure, retry with the reference's
    optional runtime deps stubbed (colorlog/torchvision/... are imported by
    its package ``__init__`` but irrelevant to unpickling) and, if set,
    ``$SPR_PICK_REFERENCE_PATH`` (a directory containing the ``spr_pick``
    package, e.g. a git checkout) prepended to ``sys.path``.

    When ``keep_stubs`` is given, installed stubs are NOT removed here;
    their names are appended to it and the CALLER must pop them from
    ``sys.modules`` once its unpickle finishes — the unpickler lazily
    ``__import__``s reference submodules on demand, and one not imported
    by the package ``__init__`` may itself import a stubbed dep, so the
    stubs have to outlive ``torch.load``, not just ``import spr_pick``.
    """
    import importlib
    import os
    import sys
    import types

    try:
        import spr_pick  # noqa: F401

        return True
    except Exception:
        pass

    # Every stub we install is recorded and deleted from sys.modules when
    # we are done with it (finally block below, or the caller's unpickle
    # via `keep_stubs`): the process namespace must end clean — a later
    # real `import h5py`/`import cv2` in this process must not silently
    # get an empty module.
    stubbed: list = [] if keep_stubs is None else keep_stubs

    def ensure(name: str):
        # Never stub a module that is really installed.
        if name in sys.modules:
            return sys.modules[name]
        try:
            return importlib.import_module(name)
        except ImportError:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
            stubbed.append(name)
            return mod

    try:
        for name in ("cv2", "imagesize", "h5py"):
            ensure(name)
        colorlog = ensure("colorlog")
        if not getattr(colorlog, "__file__", None):
            colorlog.ColoredFormatter = object
        ct = ensure("colored_traceback")
        if not getattr(ct, "__file__", None):
            ct.Colorizer = object
        tv = ensure("torchvision")
        if not getattr(tv, "__file__", None):
            for sub in ("transforms", "utils", "datasets"):
                mod = types.ModuleType(f"torchvision.{sub}")
                setattr(tv, sub, mod)
                sys.modules[f"torchvision.{sub}"] = mod
                stubbed.append(f"torchvision.{sub}")
            tf = types.ModuleType("torchvision.transforms.functional")
            tv.transforms.functional = tf
            sys.modules["torchvision.transforms.functional"] = tf
            stubbed.append("torchvision.transforms.functional")
            folder = types.ModuleType("torchvision.datasets.folder")
            folder.default_loader = None
            folder.IMG_EXTENSIONS = []
            tv.datasets.folder = folder
            sys.modules["torchvision.datasets.folder"] = folder
            stubbed.append("torchvision.datasets.folder")

        ref_path = os.environ.get("SPR_PICK_REFERENCE_PATH")
        if (
            ref_path
            and os.path.isdir(os.path.join(ref_path, "spr_pick"))
            and ref_path not in sys.path
        ):
            sys.path.insert(0, ref_path)
        try:
            import spr_pick  # noqa: F401

            return True
        except Exception:
            return False
    finally:
        if keep_stubs is None:
            for name in stubbed:
                sys.modules.pop(name, None)


def load_reference_checkpoint(path: str, mode: str = "joint") -> Dict:
    """Load a reference (PyTorch) `.training`/`.wt` checkpoint and return it
    converted to this framework's checkpoint-dict schema (the same dicts
    `utils.checkpoint.save_training/save_weights` pickle), so the evaluator,
    Picker and `joint eval`/`joint pick` can consume reference checkpoints
    directly — no separate conversion step.

    Unpickling needs `torch` plus the reference `spr_pick` package (its cfg
    is keyed by the reference's own enum classes, train.py:963-982).  Both
    are present in any environment migrating *from* the reference; when they
    are not, a RuntimeError points at tools/import_reference_checkpoint.py,
    which can stub the reference's optional deps for a one-off offline
    conversion.
    """
    try:
        import torch
    except ImportError as exc:  # pragma: no cover - torch is baked in here
        raise RuntimeError(
            f"{path!r} looks like a reference (PyTorch) checkpoint but torch "
            "is not importable; install torch (CPU is enough) or convert "
            "offline with tools/import_reference_checkpoint.py"
        ) from exc
    import sys

    # The stubs must span torch.load too: the unpickler lazily imports
    # reference submodules (e.g. spr_pick.params) on demand, and one of
    # them may import a stubbed dep.  They are removed right after.
    stubbed: list = []
    try:
        _import_reference_package(keep_stubs=stubbed)
        try:
            state = torch.load(path, map_location="cpu", weights_only=False)
        except ModuleNotFoundError as exc:
            raise RuntimeError(
                f"{path!r} is a reference (PyTorch) checkpoint whose pickle "
                f"references the module {exc.name!r} (the reference package "
                "or one of its deps); install it, point "
                "SPR_PICK_REFERENCE_PATH at a checkout containing the "
                "spr_pick package, or convert offline with "
                "tools/import_reference_checkpoint.py"
            ) from exc
    finally:
        for name in stubbed:
            sys.modules.pop(name, None)

    def _resolve_mode(trainable: Dict) -> str:
        # A checkpoint with no detector weights cannot run joint mode; a
        # directly-loaded denoise-only reference checkpoint would otherwise
        # inherit the caller's default mode="joint" and fail confusingly at
        # apply time.  (The offline converter exposes --mode for overrides.)
        if mode == "joint" and "detector" not in trainable.get("model", {}):
            logging.getLogger("compat").warning(
                "%s has no detector weights; loading in 'denoise' mode "
                "instead of 'joint'", path,
            )
            return "denoise"
        return mode

    if isinstance(state, dict) and "denoiser" in state:
        # .training format (train.py:963-982).  Optimizer state and torch
        # RNG are not carried over (the reference itself skips optimizer
        # restore on resume, train.py:998-1000).
        sd = state["denoiser"]
        cfg = convert_cfg(sd.get("cfg", {}))
        iteration = 0
        for k, v in state.get("state", {}).items():
            if getattr(k, "name", "") == "ITERATION":
                iteration = int(v)
        trainable, static = trainable_static_from_reference(sd)
        return {
            "format": "spr_pick_tpu.training.v1",
            "cfg": cfg,
            "mode": _resolve_mode(trainable),
            "iteration": iteration,
            "trainable": trainable,
            "static": static,
            "opt_state": None,
            "rng_key": None,
            "extra": {},
        }
    # .wt: flat state_dict with embedded cfg (denoiser_v2.py:851-855).
    cfg = convert_cfg(state.get("cfg", {}))
    trainable, static = trainable_static_from_reference(state)
    return {
        "format": "spr_pick_tpu.wt.v1",
        "cfg": cfg,
        "mode": _resolve_mode(trainable),
        "trainable": trainable,
        "static": static,
    }
