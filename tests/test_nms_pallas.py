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


def test_pallas_nms_tie_plateaus_match_oracle(rng):
    """Quantised scores force large equal-value plateaus; the greedy pick
    SET then depends on tie order.  The kernel must reproduce the
    reference's argsort(flat)[::-1] order (highest flat index first) —
    production maps saturate at clamped_sigmoid's 1-eps, so this is the
    realistic regime, not a corner case."""
    x = (rng.rand(96, 96) * 4).astype(np.int32).astype(np.float32) / 4.0
    s_ref, c_ref = non_maximum_suppression_np(x, 5, threshold=0.2)
    s, c, n = non_maximum_suppression_pallas(
        jnp.asarray(x), 5, 0.2, 512, interpret=_interpret()
    )
    n = int(n)
    assert n == len(s_ref)
    np.testing.assert_array_equal(s_ref, np.asarray(s[:n]))
    np.testing.assert_array_equal(c_ref, np.asarray(c[:n]))


def test_pallas_nms_constant_plateau(rng):
    """Fully saturated map (every pixel equal): picks must walk from the
    bottom-right corner in descending flat order, exactly like the oracle."""
    x = np.full((64, 64), 0.5, np.float32)
    s_ref, c_ref = non_maximum_suppression_np(x, 9, threshold=0.1)
    s, c, n = non_maximum_suppression_pallas(
        jnp.asarray(x), 9, 0.1, 128, interpret=_interpret()
    )
    n = int(n)
    assert n == len(s_ref)
    np.testing.assert_array_equal(c_ref, np.asarray(c[:n]))
