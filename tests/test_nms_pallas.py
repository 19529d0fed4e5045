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


# ---------------------------------------------------------------------------
# Dispatch: pallas is the default TPU kernel inside the VMEM gate
# ---------------------------------------------------------------------------


def test_pallas_eligibility_gate(monkeypatch):
    from spr_pick_tpu.ops import nms as nms_mod

    monkeypatch.setattr(nms_mod, "_pallas_broken", False)
    monkeypatch.setattr(nms_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("SPR_NMS_IMPL", raising=False)
    assert nms_mod._pallas_eligible(1024, 1024)
    assert nms_mod._pallas_eligible(4096, 4096)  # 67 MB padded, measured ok
    assert not nms_mod._pallas_eligible(8192, 8192)  # 268 MB > VMEM
    monkeypatch.setenv("SPR_NMS_IMPL", "multipeak")
    assert not nms_mod._pallas_eligible(1024, 1024)
    monkeypatch.setenv("SPR_NMS_IMPL", "pallas")
    assert nms_mod._pallas_eligible(8192, 8192)  # forced
    monkeypatch.delenv("SPR_NMS_IMPL")
    monkeypatch.setattr(nms_mod.jax, "default_backend", lambda: "cpu")
    assert not nms_mod._pallas_eligible(1024, 1024)
    monkeypatch.setattr(nms_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(nms_mod, "_pallas_broken", True)
    assert not nms_mod._pallas_eligible(1024, 1024)


def _sparse_map(rng, h, w, n_peaks):
    """Map with ~n_peaks isolated peaks over a sub-threshold floor (keeps
    pick counts — and therefore retry depth and multipeak compile count —
    deterministic and small)."""
    x = (rng.rand(h, w) * 0.01).astype(np.float32)
    ys = rng.randint(2, h - 2, n_peaks)
    xs = rng.randint(2, w - 2, n_peaks)
    x[ys, xs] = 0.5 + 0.5 * rng.rand(n_peaks).astype(np.float32)
    return x


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas dispatch compiles on TPU"
)
def test_nms_to_host_dispatch_equality(rng, monkeypatch):
    """The production entry point must return the identical pick list under
    either kernel (the dispatch may never change results)."""
    from spr_pick_tpu.ops.nms import nms_to_host

    x = _sparse_map(rng, 384, 384, 300)
    monkeypatch.setenv("SPR_NMS_IMPL", "pallas")
    s_p, c_p = nms_to_host(x, radius=7, threshold=0.02, max_peaks=512)
    monkeypatch.setenv("SPR_NMS_IMPL", "multipeak")
    s_m, c_m = nms_to_host(x, radius=7, threshold=0.02, max_peaks=512)
    assert len(s_p) > 100
    np.testing.assert_array_equal(s_p, s_m)
    np.testing.assert_array_equal(c_p, c_m)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas dispatch compiles on TPU"
)
def test_nms_batch_dispatch_equality_and_retry(rng, monkeypatch):
    """Batched entry point: pallas route == multipeak route per map, and the
    capped-map auto-retry works through the pallas dispatch too.  Peak
    counts are kept under one doubling so the (slow-compiling) multipeak
    kernel builds at exactly two cap values."""
    from spr_pick_tpu.ops.nms import nms_batch_to_host

    hm = np.stack([_sparse_map(rng, 256, 256, 180) for _ in range(3)])
    monkeypatch.setenv("SPR_NMS_IMPL", "pallas")
    # max_peaks=128 forces ONE doubling retry (full lists are 150-180).
    picks_p = nms_batch_to_host(hm, radius=5, threshold=0.02, max_peaks=128)
    monkeypatch.setenv("SPR_NMS_IMPL", "multipeak")
    picks_m = nms_batch_to_host(hm, radius=5, threshold=0.02, max_peaks=128)
    lifted = 0
    for (s_p, c_p), (s_m, c_m) in zip(picks_p, picks_m):
        lifted += len(s_p) > 128
        np.testing.assert_array_equal(s_p, s_m)
        np.testing.assert_array_equal(c_p, c_m)
    assert lifted, "retry should lift at least one map past the cap"
