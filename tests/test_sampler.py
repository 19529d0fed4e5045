"""Stratified PU sampler tests: packed index ABI, stratification, margins."""

import numpy as np

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
