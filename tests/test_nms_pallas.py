"""Pallas VMEM-resident NMS kernel vs the greedy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spr_pick_tpu.ops.nms import non_maximum_suppression_np
from spr_pick_tpu.ops.nms_pallas import non_maximum_suppression_pallas


def _interpret() -> bool:
    # Compile on real TPU; interpret everywhere else.
    return jax.default_backend() != "tpu"


def test_pallas_nms_matches_oracle(rng):
    x = rng.rand(128, 128).astype(np.float32)
    s_ref, c_ref = non_maximum_suppression_np(x, 5, threshold=0.3)
    s, c, n = non_maximum_suppression_pallas(
        jnp.asarray(x), 5, 0.3, 512, interpret=_interpret()
    )
    n = int(n)
    assert n == len(s_ref)
    np.testing.assert_allclose(s_ref, np.asarray(s[:n]), rtol=1e-6)
    np.testing.assert_array_equal(c_ref, np.asarray(c[:n]))


def test_pallas_nms_cap_and_threshold(rng):
    x = np.zeros((64, 64), np.float32)
    x[10, 10] = 1.0
    x[40, 40] = 0.5
    x[50, 20] = 0.01
    s, c, n = non_maximum_suppression_pallas(
        jnp.asarray(x), 5, 0.02, 8, interpret=_interpret()
    )
    assert int(n) == 2
    np.testing.assert_allclose(np.asarray(s[:2]), [1.0, 0.5])
