"""ctypes bindings for the native host kernels (native/spr_native.cpp).

Compiles the shared library on first use (g++ is part of the toolchain);
every binding has a pure-numpy fallback so the framework works without a
compiler.  The native NMS is ~1000x the reference's python-loop NMS on a
1024^2 map and serves the CPU post-processing / oracle path (the production
path runs NMS on device, spr_pick_tpu/ops/nms.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "spr_native.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_LIB_DIR, "libspr_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

        lib.nms_2d.restype = ctypes.c_int
        lib.nms_2d.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_int, f32p, i32p,
        ]
        lib.nms_3d.restype = ctypes.c_int
        lib.nms_3d.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_int, f32p, i32p,
        ]
        lib.minmax_quantize_u8.restype = None
        lib.minmax_quantize_u8.argtypes = [f32p, ctypes.c_long, u8p]
        lib.draw_gaussians.restype = None
        lib.draw_gaussians.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def nms_2d(x: np.ndarray, r: int, threshold: float = -np.inf,
           max_out: int = 65536) -> Tuple[np.ndarray, np.ndarray]:
    """Native greedy NMS; falls back to the numpy oracle if unavailable."""
    lib = get_lib()
    if lib is None:
        from spr_pick_tpu.ops.nms import non_maximum_suppression_np

        return non_maximum_suppression_np(x, r, threshold)
    x = np.ascontiguousarray(x, np.float32)
    h, w = x.shape
    scores = np.empty(max_out, np.float32)
    coords = np.empty((max_out, 2), np.int32)
    n = lib.nms_2d(x, h, w, int(r), float(threshold), max_out,
                   scores, coords.reshape(-1))
    return scores[:n].copy(), coords[:n].copy()


def nms_3d(x: np.ndarray, d: float, scale: float = 1.0,
           threshold: float = -np.inf, max_out: int = 65536):
    lib = get_lib()
    if lib is None:
        from spr_pick_tpu.ops.nms import non_maximum_suppression_3d_np

        return non_maximum_suppression_3d_np(x, d, scale, threshold)
    x = np.ascontiguousarray(x, np.float32)
    nz, ny, nx = x.shape
    scores = np.empty(max_out, np.float32)
    coords = np.empty((max_out, 3), np.int32)
    n = lib.nms_3d(x, nz, ny, nx, float(scale * d / 2), float(threshold),
                   max_out, scores, coords.reshape(-1))
    return scores[:n].copy(), coords[:n].copy()


def minmax_quantize_u8(image: np.ndarray) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from spr_pick_tpu.data.loader import minmax_quantize_u8 as np_fn

        return np_fn(image)
    x = np.ascontiguousarray(image, np.float32)
    out = np.empty(x.shape, np.uint8)
    lib.minmax_quantize_u8(x.reshape(-1), x.size, out.reshape(-1))
    return out


def draw_gaussians(heatmap: np.ndarray, centers: np.ndarray, radius: int,
                   k: float = 1.0) -> np.ndarray:
    """Max-compose bumps into `heatmap` in place (native) or via numpy."""
    lib = get_lib()
    if lib is None:
        from spr_pick_tpu.ops.heatmap import draw_gaussian

        for cx, cy in centers:
            draw_gaussian(heatmap, (cx, cy), radius, k)
        return heatmap
    heatmap = np.ascontiguousarray(heatmap, np.float32)
    centers = np.ascontiguousarray(centers, np.int32)
    h, w = heatmap.shape
    lib.draw_gaussians(heatmap, h, w, centers.reshape(-1), len(centers),
                       int(radius), float(k))
    return heatmap
