#!/usr/bin/env python
"""Convert a reference (PyTorch) spr_pick checkpoint to spr_pick_tpu format.

    python tools/import_reference_checkpoint.py model_00080000.training \
        -o converted.training --mode joint

Handles both `.training` (train.py:963-982: {"denoiser": state_dict+cfg,
"state", "optimizer", "rng"}) and `.wt` (weights+cfg) torch pickles.  The
reference package (for unpickling its enum classes) is expected at
/root/reference or importable as `spr_pick`; missing optional deps are
stubbed.  Optimizer state and torch RNG are not carried over (the reference
itself skips optimizer restore on resume, train.py:998-1000).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from reference_compat import import_reference  # noqa: E402


def convert_cfg(ref_cfg) -> dict:
    """Map reference enum-keyed cfg -> spr_pick_tpu cfg (by member name)."""
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
            # The reference stores its dead 1e-5 default but TRAINS at
            # the hardcoded 1e-4 (spr_pick/train.py:441); map to what the
            # checkpoint was actually trained with, since this framework
            # reads the cfg value for real.
            value = 1e-4
        out[our_key] = value
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="reference .training or .wt file")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--mode", default="joint", choices=["joint", "denoise"])
    args = ap.parse_args()

    import_reference()
    import torch

    from spr_pick_tpu.compat import trainable_static_from_reference
    from spr_pick_tpu.utils import checkpoint as ckpt

    state = torch.load(args.checkpoint, map_location="cpu", weights_only=False)

    if "denoiser" in state:  # .training format
        sd = state["denoiser"]
        cfg = convert_cfg(sd.get("cfg", {}))
        iteration = 0
        ref_state = state.get("state", {})
        for k, v in ref_state.items():
            if getattr(k, "name", "") == "ITERATION":
                iteration = int(v)
        trainable, static = trainable_static_from_reference(sd)
        ckpt.save_training(
            args.output, trainable, static, None, cfg, args.mode, iteration
        )
        print(f"converted .training (iteration {iteration}) -> {args.output}")
    else:  # .wt: state_dict with embedded cfg
        cfg = convert_cfg(state.get("cfg", {}))
        trainable, static = trainable_static_from_reference(state)
        ckpt.save_weights(args.output, trainable, static, cfg, args.mode)
        print(f"converted .wt weights -> {args.output}")


if __name__ == "__main__":
    main()
