"""Device patch gather parity with the host crop path."""

import numpy as np
import pytest

from spr_pick_tpu.data.micrograph import DevicePatchPipeline, MicrographDataset
from spr_pick_tpu.data.sampler import StratifiedCoordinateSampler, pack_index
from tests.test_e2e import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    rng = np.random.RandomState(3)
    tmp = tmp_path_factory.mktemp("patches")
    images_txt, coords_txt = make_synthetic_dataset(tmp, rng, n_images=2)
    return MicrographDataset(
        images_txt, coords_txt, radius=3, train=True, crop=64, bb=24,
        verbose=False,
    )


def test_device_gather_matches_host_crop(dataset):
    pipeline = DevicePatchPipeline(dataset, crop=64, augment=False)
    # Pick a few coordinates inside the sampler margins.
    w = dataset.images[0][0].shape[1]
    packed = np.array(
        [pack_index(0, 0, 100 * w + 120), pack_index(0, 1, 150 * w + 90)],
        np.int64,
    )
    batch = pipeline.batch(packed)
    inp = np.asarray(batch["inp"])
    target = np.asarray(batch["target"])
    for b, h in enumerate(packed):
        patch, label, _ = dataset.train_item(int(h))
        np.testing.assert_allclose(inp[b, :, :, 0], patch, rtol=1e-6)
        assert target[b] == pytest.approx(label, rel=1e-6)


def test_sampler_feeds_valid_coords(dataset):
    sampler = StratifiedCoordinateSampler(
        [g for g in dataset.targets], balance=0.5, size=10 ** 6,
        random=np.random.RandomState(0),
    )
    pipeline = DevicePatchPipeline(dataset, crop=64, augment=False)
    packed = sampler.sample_batch(32)
    flat, ys, xs = pipeline.decode(packed)
    h, w = dataset.images[0][0].shape
    # margins guarantee full in-bounds 64-crops
    assert (ys - 32 >= 0).all() and (ys + 32 <= h).all()
    assert (xs - 32 >= 0).all() and (xs + 32 <= w).all()
    batch = pipeline.batch(packed)
    assert np.asarray(batch["inp"]).shape == (32, 64, 64, 1)
    # positive draws get heatmap labels > -1
    assert (np.asarray(batch["target"]) > -1).any()


def test_edge_adjacent_coordinate_raises(dataset):
    """An out-of-margin coordinate must raise, not silently clamp: the
    device gather's dynamic_slice would otherwise decouple the label from
    the patch centre (different semantics from the host zero-pad crop)."""
    pipeline = DevicePatchPipeline(dataset, crop=64, augment=False)
    w = dataset.images[0][0].shape[1]
    edge = np.array([pack_index(0, 0, 5 * w + 5)], np.int64)  # y=5 < crop/2
    with pytest.raises(ValueError, match="out of bounds"):
        pipeline.batch(edge)
    # far edge too: y within crop/2 of the image bottom
    h = dataset.images[0][0].shape[0]
    far = np.array([pack_index(0, 0, (h - 4) * w + 100)], np.int64)
    with pytest.raises(ValueError, match="out of bounds"):
        pipeline.batch(far)
