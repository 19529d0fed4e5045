"""Stratified PU sampler tests: packed index ABI, stratification, margins."""

import numpy as np
import pytest

from spr_pick_tpu.data.sampler import (
    FixedLengthSampler,
    SamplingOrder,
    StratifiedCoordinateSampler,
    enumerate_pu_coordinates,
    pack_index,
    unpack_index,
)


def test_pack_unpack():
    h = pack_index(3, 17, 123456)
    g, i, c = unpack_index(h)
    assert (int(g), int(i), int(c)) == (3, 17, 123456)
    hs = np.array([pack_index(0, 1, 2), pack_index(2, 0, 9)])
    g, i, c = unpack_index(hs)
    np.testing.assert_array_equal(g, [0, 2])
    np.testing.assert_array_equal(i, [1, 0])
    np.testing.assert_array_equal(c, [2, 9])


def test_enumerate_margins():
    y = np.zeros((300, 300), np.uint8)
    y[100, 100] = 1  # inside margins
    y[10, 10] = 1    # outside (margin_lo=72)
    P, U = enumerate_pu_coordinates([y])
    assert len(P) == 1
    assert P[0]["coord"] == 100 * 300 + 100
    # U covers the interior box only: rows 73..159 x cols 73..159
    rows = np.arange(300)
    inside = (rows > 72) & (rows < 300 - 140)
    assert len(U) == inside.sum() ** 2


def test_stratified_sampler_balance():
    rng = np.random.RandomState(0)
    y = np.zeros((300, 300), np.uint8)
    pos = [(100, 100), (120, 140), (80, 130)]
    for r, c in pos:
        y[r, c] = 1
    sampler = StratifiedCoordinateSampler(
        [[y]], balance=0.5, size=2000, random=rng
    )
    picks = [next(sampler) for _ in range(2000)]
    g, i, coords = unpack_index(np.array(picks))
    assert set(np.asarray(g)) == {0}
    pos_coords = {r * 300 + c for r, c in pos}
    n_pos = sum(1 for c in np.asarray(coords) if int(c) in pos_coords)
    # balance=0.5: ~half the draws from the P list
    assert 800 < n_pos < 1300


def test_fixed_length_sampler_sequential():
    s = FixedLengthSampler(3, num_samples=7, shuffled=False)
    order = list(iter(s))
    assert order == [0, 1, 2, 0, 1, 2, 0]


def test_sampling_order_resume():
    order = SamplingOrder([5, 4, 3], index=1)
    sd = order.state_dict()
    restored = SamplingOrder.from_state_dict(sd)
    assert list(restored) == [4, 3]


def _make_labels(rng):
    labels = []
    for _ in range(2):
        y = np.zeros((400, 400), np.float32)
        pos = rng.randint(80, 260, size=(30, 2))
        y[pos[:, 0], pos[:, 1]] = 1.0
        labels.append(y)
    return [labels]


def test_stratified_sampler_resume_draws_identical_batches():
    """Kill-and-resume parity: state_dict/load_state_dict reproduce the
    exact continuation stream (master RNG + history debt + every group's
    replayed shuffle position)."""
    labels = _make_labels(np.random.RandomState(7))

    def fresh():
        return StratifiedCoordinateSampler(
            labels, balance=0.1, size=10 ** 6,
            random=np.random.RandomState(0),
        )

    s1 = fresh()
    s1.sample_batch(333)  # advance past at least one small-group reshuffle
    saved = s1.state_dict()
    expected = s1.sample_batch(200)

    s2 = fresh()
    s2.load_state_dict(saved)
    np.testing.assert_array_equal(s2.sample_batch(200), expected)


def test_device_pipeline_flip_rng_resumes():
    from spr_pick_tpu.data.micrograph import DevicePatchPipeline

    class _FakeDataset:
        pass

    rng = np.random.RandomState(1)
    ds = _FakeDataset()
    ds.images = [[rng.rand(256, 256).astype(np.float32)]]
    ds.hms = [[np.zeros((256, 256), np.float32)]]
    pipe = DevicePatchPipeline(ds, crop=64, augment=True)
    packed = np.array([pack_index(0, 0, 128 * 256 + 128)] * 8, np.int64)
    pipe.batch(packed)
    saved = pipe.state_dict()
    expected = np.asarray(pipe.batch(packed)["inp"])

    pipe2 = DevicePatchPipeline(ds, crop=64, augment=True)
    pipe2.batch(packed)  # advance, then overwrite with the saved state
    pipe2.load_state_dict(saved)
    np.testing.assert_array_equal(np.asarray(pipe2.batch(packed)["inp"]), expected)


def test_sampler_state_roundtrips_through_pickle(tmp_path):
    import pickle

    labels = _make_labels(np.random.RandomState(3))
    s = StratifiedCoordinateSampler(
        labels, balance=0.1, size=10 ** 6, random=np.random.RandomState(0)
    )
    s.sample_batch(50)
    blob = pickle.dumps(s.state_dict(), protocol=4)
    s2 = StratifiedCoordinateSampler(
        labels, balance=0.1, size=10 ** 6, random=np.random.RandomState(0)
    )
    s2.load_state_dict(pickle.loads(blob))
    np.testing.assert_array_equal(s2.sample_batch(64), s.sample_batch(64))


def test_stratified_sampler_empty_p_stratum_never_drawn():
    """Micrographs whose labelled particles ALL fall inside the border
    margins produce an empty P stratum; it must be reweighted away, not
    indexed (the reference crashes with IndexError here)."""
    h, w = 300, 300
    lab = np.zeros((h, w), np.float32)
    lab[10, 10] = 1  # inside margin_lo=72 -> excluded from P
    s = StratifiedCoordinateSampler([[lab]], balance=0.5, size=64, random=np.random.RandomState(0))
    drawn = [next(s) for _ in range(64)]
    assert len(drawn) == 64  # no crash; only the U stratum is drawn
    assert s.weights[0] == 0.0 and s.weights[1] > 0


def test_stratified_sampler_all_empty_raises():
    lab = np.zeros((40, 40), np.float32)  # smaller than the margin frame
    with pytest.raises(ValueError, match="no usable coordinates"):
        StratifiedCoordinateSampler([[lab]], balance=0.5, size=8, random=np.random.RandomState(0))
