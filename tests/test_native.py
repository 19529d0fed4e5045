"""Native C++ kernel tests: parity with the numpy oracles."""

import numpy as np
import pytest

from spr_pick_tpu import native
from spr_pick_tpu.data.loader import minmax_quantize_u8 as np_quantize
from spr_pick_tpu.ops.heatmap import as_gaussian, gaussian_radius
from spr_pick_tpu.ops.nms import (
    non_maximum_suppression_3d_np,
    non_maximum_suppression_np,
)


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")
    return native.get_lib()


def test_native_nms_matches_oracle(lib, rng):
    x = rng.rand(128, 128).astype(np.float32)
    s_ref, c_ref = non_maximum_suppression_np(x, 5, threshold=0.3)
    s_nat, c_nat = native.nms_2d(x, 5, threshold=0.3)
    assert len(s_ref) == len(s_nat)
    np.testing.assert_allclose(s_ref, s_nat)
    np.testing.assert_array_equal(c_ref, c_nat)


def test_native_nms_3d_matches_oracle(lib, rng):
    x = rng.rand(24, 24, 24).astype(np.float32)
    s_ref, c_ref = non_maximum_suppression_3d_np(x, 6, threshold=0.5)
    s_nat, c_nat = native.nms_3d(x, 6, threshold=0.5)
    assert len(s_ref) == len(s_nat)
    np.testing.assert_allclose(s_ref, s_nat)
    np.testing.assert_array_equal(c_ref, c_nat)


def test_native_quantize_matches(lib, rng):
    x = rng.randn(64, 64).astype(np.float32)
    np.testing.assert_array_equal(native.minmax_quantize_u8(x), np_quantize(x))


def test_native_draw_gaussians(lib):
    radius = max(0, int(gaussian_radius((24, 24))))
    ref = as_gaussian((96, 96), [40, 70], [30, 60], bb=24)
    hm = np.full((96, 96), -1.0, np.float32)
    native.draw_gaussians(hm, np.array([[40, 30], [70, 60]]), radius)
    np.testing.assert_allclose(hm, ref, atol=1e-6)


def test_native_nms_speed(lib, rng):
    """Native NMS must chew a 1024^2 map in well under a second."""
    import time

    x = rng.rand(1024, 1024).astype(np.float32)
    t0 = time.time()
    s, c = native.nms_2d(x, 15, threshold=0.9, max_out=4096)
    dt = time.time() - t0
    assert dt < 2.0
    assert len(s) > 0
