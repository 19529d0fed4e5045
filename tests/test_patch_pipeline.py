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


def test_budget_gate_raises(dataset):
    from spr_pick_tpu.data.micrograph import DevicePatchPipeline

    with pytest.raises(ValueError, match="data-plane budget"):
        DevicePatchPipeline(dataset, crop=64, augment=False, max_bytes=1024)


def test_host_pipeline_matches_device(dataset):
    """The out-of-core host fallback produces bit-identical batches to the
    device gather (augment off) — capacity changes, semantics don't."""
    from spr_pick_tpu.data.micrograph import HostPatchPipeline

    dev = DevicePatchPipeline(dataset, crop=64, augment=False)
    host = HostPatchPipeline(dataset, crop=64, augment=False)
    w = dataset.images[0][0].shape[1]
    packed = np.array(
        [pack_index(0, 0, 100 * w + 120), pack_index(0, 1, 150 * w + 90)],
        np.int64,
    )
    bd = dev.batch(packed)
    bh = host.batch(packed)
    np.testing.assert_array_equal(np.asarray(bd["inp"]), np.asarray(bh["inp"]))
    np.testing.assert_array_equal(
        np.asarray(bd["target"]), np.asarray(bh["target"])
    )


def test_no_device_heatmap_stack(dataset):
    """Labels come from host point-reads; the pipeline must not hold a
    device-resident heatmap stack (VERDICT r3: it doubled the HBM cost for
    data that is only ever read at hm[n, y, x])."""
    pipeline = DevicePatchPipeline(dataset, crop=64, augment=False)
    assert not hasattr(pipeline, "hms_dev")
    flat, ys, xs = pipeline.decode(
        np.array([pack_index(0, 0, 100 * dataset.images[0][0].shape[1] + 120)])
    )
    labels = pipeline.labels_for(flat, ys, xs)
    assert labels.dtype == np.float32
    assert labels[0] == dataset.hms[0][0][int(ys[0]), int(xs[0])]


def test_trainer_falls_back_to_host_pipeline(tmp_path, monkeypatch):
    """A joint TXT training run whose padded stack exceeds the device
    budget trains via the host fallback (VERDICT r3 item 1 'done' bar)."""
    from spr_pick_tpu.cfg import base, infer
    from spr_pick_tpu.data.micrograph import HostPatchPipeline
    from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue
    from spr_pick_tpu.train import DenoiserTrainer

    rng = np.random.RandomState(7)
    images_txt, coords_txt = make_synthetic_dataset(tmp_path, rng, n_images=2)
    monkeypatch.setenv("SPR_DEVICE_DATA_BUDGET", "1024")  # 1 KiB: force it

    c = base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.TRAIN_DATA_PATH] = images_txt
    c[ConfigValue.TRAIN_LABEL_PATH] = coords_txt
    c[ConfigValue.ITERATIONS] = 4
    c[ConfigValue.TRAIN_MINIBATCH_SIZE] = 2
    c[ConfigValue.EVAL_INTERVAL] = 0
    c[ConfigValue.PRINT_INTERVAL] = 4
    c[ConfigValue.SNAPSHOT_INTERVAL] = 4
    infer(c)
    trainer = DenoiserTrainer(
        c, mode="joint", alpha=0.75, tau=0.01, runs_dir=str(tmp_path / "runs")
    )
    trainer.train()
    assert isinstance(trainer.patch_pipeline, HostPatchPipeline)
    assert trainer.iteration >= 4
