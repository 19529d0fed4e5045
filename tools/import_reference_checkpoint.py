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

Offline conversion is OPTIONAL: the evaluator / Picker / `joint eval|pick`
auto-detect reference checkpoints and convert in-process
(`spr_pick_tpu.compat.load_reference_checkpoint`) whenever `torch` and the
reference package are importable.  This tool remains useful to (a) produce a
torch-free artifact once and drop the reference dependency, and (b) convert
in environments where the reference's optional deps are missing (stubbed
here via tests/reference_compat.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from reference_compat import import_reference  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="reference .training or .wt file")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--mode", default="joint", choices=["joint", "denoise"])
    args = ap.parse_args()

    import_reference()

    from spr_pick_tpu.compat import load_reference_checkpoint
    from spr_pick_tpu.utils import checkpoint as ckpt

    state = load_reference_checkpoint(args.checkpoint, mode=args.mode)
    if "training" in state["format"]:
        ckpt.save_training(
            args.output, state["trainable"], state["static"], None,
            state["cfg"], args.mode, state["iteration"],
        )
        print(
            f"converted .training (iteration {state['iteration']}) "
            f"-> {args.output}"
        )
    else:
        ckpt.save_weights(
            args.output, state["trainable"], state["static"],
            state["cfg"], args.mode,
        )
        print(f"converted .wt weights -> {args.output}")


if __name__ == "__main__":
    main()
