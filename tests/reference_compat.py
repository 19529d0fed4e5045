"""Helper: import the reference PyTorch package with optional deps stubbed.

Only used by parity tests; guarded by the presence of /root/reference.
"""

import os
import sys
import types

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    if not os.path.isdir(os.path.join(REFERENCE_PATH, "spr_pick")):
        return False
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


def _ensure_module(name: str):
    """Import `name` if it is really installed; otherwise register an
    empty stub.  Returns (module, is_stub).  Stubbing an AVAILABLE module
    would poison sys.modules for every later test in the process (a bare
    `h5py` stub once broke the real HDF5 dataset tests that ran after a
    parity test)."""
    if name in sys.modules:
        mod = sys.modules[name]
        return mod, not getattr(mod, "__file__", None)
    try:
        import importlib

        return importlib.import_module(name), False
    except ImportError:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        return mod, True


def import_reference():
    """Returns the reference spr_pick package (stubbing missing deps)."""
    for name in ("cv2", "imagesize", "h5py"):
        _ensure_module(name)
    colorlog, stub = _ensure_module("colorlog")
    if stub:
        colorlog.ColoredFormatter = object
    ct, stub = _ensure_module("colored_traceback")
    if stub:
        ct.Colorizer = object
    tv, stub = _ensure_module("torchvision")
    if stub:
        for sub in ("transforms", "utils", "datasets"):
            mod = types.ModuleType(f"torchvision.{sub}")
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        tf = types.ModuleType("torchvision.transforms.functional")
        tv.transforms.functional = tf
        sys.modules["torchvision.transforms.functional"] = tf
        folder = types.ModuleType("torchvision.datasets.folder")
        folder.default_loader = None
        folder.IMG_EXTENSIONS = []
        tv.datasets.folder = folder
        sys.modules["torchvision.datasets.folder"] = folder

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import spr_pick  # noqa: F401

    return spr_pick
