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


def load(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


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
