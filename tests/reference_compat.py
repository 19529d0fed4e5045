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


def import_reference():
    """Returns the reference spr_pick package (stubbing missing deps)."""
    for name in ("cv2", "torchvision", "imagesize", "colorlog",
                 "colored_traceback", "h5py"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["colorlog"].ColoredFormatter = object
    sys.modules["colored_traceback"].Colorizer = object
    tv = sys.modules["torchvision"]
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
