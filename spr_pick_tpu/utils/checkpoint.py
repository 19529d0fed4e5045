"""Checkpoint save/load: the `.training` / `.wt` logical formats.

Parity: `spr_pick/train.py:603-636,963-1016` and
`spr_pick/denoiser_v2.py:851-861` — two formats:

  * ``model_{iter:08d}.training`` — full resumable state: model variables,
    optimizer state, iteration/history, RNG key, embedded cfg;
  * ``final-{config}.wt`` / ``model_{iter:08d}.wt`` — weights + cfg only.

Stored as pickled pure-numpy pytrees (no torch, no flax runtime objects), so
checkpoints are portable across jax versions and loadable without a device.
The cfg dict (enum-keyed) is embedded exactly like the reference embeds
`state_dict["cfg"]` so eval can reconstruct the model.
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_training(
    path: str,
    trainable,
    static,
    opt_state,
    cfg: Dict,
    mode: str,
    iteration: int,
    rng_key=None,
    extra: Optional[Dict] = None,
):
    state = {
        "format": "spr_pick_tpu.training.v1",
        "cfg": cfg,
        "mode": mode,
        "iteration": int(iteration),
        "trainable": _to_numpy_tree(trainable),
        "static": _to_numpy_tree(static),
        "opt_state": _to_numpy_tree(opt_state),
        "rng_key": None if rng_key is None else np.asarray(rng_key),
        "extra": extra or {},
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(state, f, protocol=4)


def save_weights(path: str, trainable, static, cfg: Dict, mode: str):
    state = {
        "format": "spr_pick_tpu.wt.v1",
        "cfg": cfg,
        "mode": mode,
        "trainable": _to_numpy_tree(trainable),
        "static": _to_numpy_tree(static),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(state, f, protocol=4)


_TORCH_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C  # torch legacy save, first pickle


def load(path: str, mode: str = "joint") -> Dict[str, Any]:
    """Load a checkpoint, auto-detecting reference (PyTorch) files.

    Native `.training`/`.wt` files are plain numpy-pytree pickles.  A
    reference checkpoint (torch>=1.6 zip archive, or the legacy torch
    multi-pickle stream) is detected by its magic and converted in-process
    via `compat.load_reference_checkpoint`, so `joint eval --model`,
    `joint pick` and `Picker(...)` accept reference checkpoints directly.
    ``mode`` is only used for converted reference files (they do not record
    a train mode; parity with tools/import_reference_checkpoint.py --mode).
    """
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK":  # zipfile: torch>=1.6 serialization
        from spr_pick_tpu.compat import load_reference_checkpoint

        return load_reference_checkpoint(path, mode=mode)
    try:
        with open(path, "rb") as f:
            state = pickle.load(f)
    except Exception as exc:
        # Not our pickle; the torch legacy format needs torch's unpickler.
        try:
            from spr_pick_tpu.compat import load_reference_checkpoint

            return load_reference_checkpoint(path, mode=mode)
        except Exception as ref_exc:
            # Chain from the reference-load failure: it carries the
            # actionable message (missing module name, the
            # SPR_PICK_REFERENCE_PATH / offline-converter guidance).  The
            # native-pickle error is summarized inline so neither is lost.
            raise ValueError(
                f"Could not load checkpoint {path!r}: not a spr_pick_tpu "
                f"pickle ({type(exc).__name__}: {exc}), and loading it as "
                "a reference torch checkpoint also failed (see exception "
                "chain)"
            ) from ref_exc
    if state == _TORCH_LEGACY_MAGIC:
        from spr_pick_tpu.compat import load_reference_checkpoint

        return load_reference_checkpoint(path, mode=mode)
    return state


def find_latest_training(run_dir: str, subdir: str = "training_jt") -> str:
    """Pick the max-iteration *.training file.  Parity: train.py:1220-1230."""
    iterations = {}
    for path in glob.glob(os.path.join(run_dir, subdir, "*.training")):
        try:
            iterations[int(re.findall(r"\d+", os.path.basename(path))[0])] = path
        except Exception:
            continue
    if not iterations:
        raise ValueError("Run directory contains no training files.")
    return iterations[max(iterations.keys())]
