"""Image artifact output + scalar logging.

Parity: `spr_pick/utils/data.py:71-153` (tensor2image min-max -> PNG,
PSNR helpers) and the tensorboard SummaryWriter usage at train.py:819-835.
The scalar writer prefers tensorboard (via torch, which is in the image) and
falls back to a JSONL scalars file so headless runs always record metrics.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def _png_compress_level() -> int:
    """zlib level for artifact PNGs.  Default 1: micrograph maps are
    noise-like and barely compress at any level, while level 6 (PIL's
    default) costs ~4x the encode CPU — at 5-6 maps per micrograph the
    encode was the largest single e2e eval phase (docs/PERF.md round 5).
    Lossless at every level; SPR_PNG_COMPRESS_LEVEL overrides (0-9)."""
    try:
        return int(os.environ.get("SPR_PNG_COMPRESS_LEVEL", "1"))
    except ValueError:
        return 1


def array2image(img: np.ndarray):
    """Min-max normalise to [0,1] and convert to a PIL 'L' image.

    Parity: tensor2image (utils/data.py:71-93) for single grayscale images.
    Accepts (H, W), (H, W, 1) or (1, H, W, 1).
    """
    from PIL import Image

    x = np.asarray(img, dtype=np.float32)
    x = np.squeeze(x)
    if x.ndim != 2:
        raise NotImplementedError(f"cannot convert shape {img.shape} to image")
    lo, hi = float(x.min()), float(x.max())
    if hi > lo:
        x = (x - lo) / (hi - lo)
    else:
        x = np.zeros_like(x)
    return Image.fromarray(np.uint8(x * 255), mode="L")


def save_array_image(img: np.ndarray, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    array2image(img).save(path, compress_level=_png_compress_level())


def quantize_u8_device(arr, shape) -> np.ndarray:
    """Unpad + min-max quantise to uint8 ON DEVICE; fetch (H, W) u8.

    Same math as :func:`array2image` — XLA's truncating f32->u8 cast is
    bit-identical to numpy's (verified over random sweeps), and min/max
    reductions are order-independent, so the PNG bytes match the host
    path exactly.  The crop to ``shape`` happens BEFORE the min-max so
    pad pixels can't skew the range (same as unpad-then-normalise).

    Why: the artifact-export path used to pull every full f32 map to the
    host (4 bytes/px x up to 5 maps per micrograph); shipping the final
    u8 instead cuts that device->host traffic 4x — on narrow device
    links the export D2H is the end-to-end eval bottleneck (docs/PERF.md).
    """
    import jax.numpy as jnp

    x = arr[0, : shape[0], : shape[1], 0].astype(jnp.float32)
    lo, hi = x.min(), x.max()
    y = jnp.where(hi > lo, (x - lo) / jnp.maximum(hi - lo, 1e-38), 0.0)
    return np.asarray((y * 255.0).astype(jnp.uint8))


def save_u8_image(u8: np.ndarray, path: str):
    """Write an already-quantised (H, W) uint8 array as a PNG."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(u8, mode="L").save(
        path, compress_level=_png_compress_level()
    )


def save_array_image_filtered(img: np.ndarray, path: str, kernel_size: int = 9):
    """Median-filtered variant (utils/data.py:95-118)."""
    from scipy.signal import medfilt

    x = np.squeeze(np.asarray(img, dtype=np.float32))
    x = medfilt(x, kernel_size=kernel_size)
    save_array_image(x, path)


class ScalarWriter:
    """TensorBoard + JSONL scalar writer with purge-on-resume semantics.

    Always writes real tfevents records (pure-Python writer, no torch
    needed — `utils/tfevents.py`) so any run dir is TensorBoard-readable,
    matching the reference's always-on SummaryWriter (train.py:819-835);
    a `scalars.jsonl` sink is kept alongside for grep-ability.
    """

    def __init__(self, log_dir: str, purge_step: Optional[int] = None):
        from spr_pick_tpu.utils.tfevents import TFEventWriter

        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._tb = TFEventWriter(log_dir, purge_step=purge_step)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value, step: int):
        value = float(np.asarray(value))
        self._tb.add_scalar(tag, value, step)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": step}) + "\n"
        )
        self._jsonl.flush()

    def close(self):
        self._tb.close()
        self._jsonl.close()
