"""Data-format (axis-order) descriptors and permutation helpers.

Parity: `spr_pick/utils/data_format.py:10-112`.  The framework's native
layout is NHWC (TPU-friendly); these helpers translate to/from the
reference's BCHW world at the I/O boundary (checkpoint import, artifact
dumps).
"""

from __future__ import annotations

from enum import Enum, auto
from typing import Dict, Tuple


class DataDim(Enum):
    BATCH = auto()
    CHANNEL = auto()
    HEIGHT = auto()
    WIDTH = auto()


_DIM_CHARS = {
    "B": DataDim.BATCH,
    "C": DataDim.CHANNEL,
    "H": DataDim.HEIGHT,
    "W": DataDim.WIDTH,
}


class DataFormat:
    BCHW = "BCHW"
    BHWC = "BHWC"
    BWHC = "BWHC"
    BCWH = "BCWH"
    CHW = "CHW"
    HWC = "HWC"
    CWH = "CWH"
    WHC = "WHC"
    HW = "HW"
    WH = "WH"


def dim_index(fmt: str) -> Dict[DataDim, int]:
    """Map each DataDim present in the format string to its axis index."""
    return {_DIM_CHARS[ch]: i for i, ch in enumerate(fmt)}


DATA_FORMAT_DIM_INDEX = {
    fmt: dim_index(fmt)
    for fmt in (
        DataFormat.BCHW, DataFormat.BHWC, DataFormat.BWHC, DataFormat.BCWH,
        DataFormat.CHW, DataFormat.HWC, DataFormat.CWH, DataFormat.WHC,
        DataFormat.HW, DataFormat.WH,
    )
}


def permute_tuple(src: str, dst: str) -> Tuple[int, ...]:
    """Axis permutation taking an array in `src` format to `dst` format."""
    if sorted(src) != sorted(dst):
        raise ValueError(f"incompatible formats: {src} -> {dst}")
    return tuple(src.index(ch) for ch in dst)


def batch(fmt: str) -> str:
    return "B" + fmt if "B" not in fmt else fmt


def unbatch(fmt: str) -> str:
    return fmt.replace("B", "")
