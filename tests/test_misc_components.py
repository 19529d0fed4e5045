"""Tests for secondary components: matching, contamination, noisy prep,
crop, folder dataset, data formats, noise DSL, n2v UPS."""

import numpy as np
import pytest

from spr_pick_tpu.data.crop import random_crop
from spr_pick_tpu.data.data_format import DataFormat, permute_tuple
from spr_pick_tpu.data.n2v import manipulate
from spr_pick_tpu.data.noise import add_style
from spr_pick_tpu.data.noisy import prepare_batch
from spr_pick_tpu.ops.algorithms import (
    find_contamination,
    match_coordinates,
    precision_recall_f1,
)
from spr_pick_tpu.params import NoiseAlgorithm


def test_match_coordinates():
    targets = np.array([[10, 10], [50, 50]])
    preds = np.array([[11, 10], [49, 52], [100, 100]])
    assignment, dist = match_coordinates(targets, preds, radius=5)
    np.testing.assert_array_equal(assignment, [1, 1, 0])
    assert dist[0] == pytest.approx(1.0)
    p, r, f1 = precision_recall_f1(targets, preds, radius=5)
    assert p == pytest.approx(2 / 3)
    assert r == pytest.approx(1.0)


def test_find_contamination():
    rng = np.random.RandomState(0)
    img = rng.randn(64, 64).astype(np.float32) * 0.1
    img[20:30, 20:30] = -30.0  # dark blob
    mask = find_contamination(img, radius=5)
    assert mask[25, 25] == 1
    assert mask[5, 55] == 0


def test_noise_dsl_gauss(rng):
    imgs = rng.rand(2, 32, 32).astype(np.float32)
    noisy, sd = add_style(imgs, "gauss25", rng=rng)
    assert sd == pytest.approx(25 / 255)
    assert noisy.min() >= 0 and noisy.max() <= 1
    noisy_nc, _ = add_style(imgs, "gauss25_nc", rng=rng)
    assert noisy_nc.min() < 0 or noisy_nc.max() > 1
    # range draws per-item sd
    _, sds = add_style(imgs, "gauss5_50", rng=rng)
    assert sds.shape == (2, 1, 1)


def test_noise_dsl_poisson(rng):
    imgs = rng.rand(2, 16, 16).astype(np.float32) + 0.5
    noisy, lam = add_style(imgs, "poisson30", rng=rng)
    assert lam == 30
    assert np.isfinite(noisy).all()


def test_n2v_manipulate(rng):
    img = rng.rand(64, 64).astype(np.float32)
    out, mask = manipulate(img, 5, rng=rng)
    changed = out != img
    # mask marks exactly the replaced coordinates (values may coincide, so
    # changed <= mask)
    assert mask.sum() > 20
    assert (changed & (mask == 0)).sum() == 0
    # ~1.5% of pixels manipulated
    frac = mask.mean()
    assert 0.005 < frac < 0.03


def test_prepare_batch_algorithms(rng):
    imgs = rng.rand(2, 32, 32).astype(np.float32)
    b = prepare_batch(imgs, NoiseAlgorithm.NOISE_TO_CLEAN, "gauss25", rng)
    np.testing.assert_array_equal(b["ref"][..., 0], imgs)
    b = prepare_batch(imgs, NoiseAlgorithm.NOISE_TO_NOISE, "gauss25", rng)
    assert not np.allclose(b["ref"][..., 0], imgs)
    b = prepare_batch(imgs, NoiseAlgorithm.NOISE_TO_VOID, "gauss25", rng)
    assert "mask" in b and b["mask"].sum() > 0
    b = prepare_batch(imgs, NoiseAlgorithm.SELFSUPERVISED_DENOISING, "gauss25", rng)
    assert "ref" not in b
    b = prepare_batch(
        imgs, NoiseAlgorithm.SELFSUPERVISED_DENOISING_MEAN_ONLY, "gauss25", rng
    )
    np.testing.assert_array_equal(b["ref"], b["inp"])


def test_random_crop_labeled(rng):
    img = rng.rand(100, 100).astype(np.float32)
    hm = np.full((100, 100), -1.0, np.float32)
    hm[40:60, 40:60] = 1.0
    ic, hc, label = random_crop(img, hm, 32, rng, labeled_only=True)
    assert ic.shape == (32, 32)
    assert (hc > 0).any()


def test_random_crop_pad(rng):
    img = rng.rand(16, 16).astype(np.float32)
    ic, hc, label = random_crop(img, None, 32, rng)
    assert ic.shape == (32, 32)


def test_permute_tuple():
    assert permute_tuple(DataFormat.BCHW, DataFormat.BHWC) == (0, 2, 3, 1)
    x = np.zeros((2, 3, 4, 5))
    y = x.transpose(permute_tuple(DataFormat.BCHW, DataFormat.BHWC))
    assert y.shape == (2, 4, 5, 3)


def test_folder_dataset(tmp_path, rng):
    from spr_pick_tpu.data import mrc
    from spr_pick_tpu.data.folder import UnlabelledImageFolderDataset

    sub = tmp_path / "nested"
    sub.mkdir()
    mrc.write(str(tmp_path / "a.mrc"), rng.randn(16, 24).astype(np.float32))
    mrc.write(str(sub / "b.mrc"), rng.randn(8, 8).astype(np.float32))
    ds = UnlabelledImageFolderDataset(str(tmp_path))
    assert len(ds) == 2
    assert ds[0].shape == (16, 24)
    assert ds.image_size(0) == (16, 24)
    names = {ds.name(i) for i in range(2)}
    assert names == {"a", "b"}


def test_quantize_u8_device_matches_host(rng, tmp_path):
    """Device-side u8 quantisation (export D2H saver) must produce PNG
    bytes identical to the host array2image path: same unpad-then-minmax
    order, same truncating f32->u8 cast.  Covers negative values, a
    constant map (hi == lo -> zeros), and pad pixels outside `shape`
    that must NOT skew the range."""
    import jax.numpy as jnp

    from spr_pick_tpu.data.micrograph import unpad
    from spr_pick_tpu.utils.image_io import (
        array2image,
        quantize_u8_device,
        save_array_image,
        save_u8_image,
    )

    shape = (37, 53)
    padded = np.full((1, 64, 64, 1), 1e6, np.float32)  # poisonous padding
    padded[0, : shape[0], : shape[1], 0] = (
        rng.randn(*shape).astype(np.float32) * 3 - 1
    )

    host = np.asarray(array2image(unpad(padded[0, :, :, 0], shape)))
    dev = quantize_u8_device(jnp.asarray(padded), shape)
    np.testing.assert_array_equal(host, dev)

    # Constant map: array2image maps hi == lo to zeros.
    const = np.full((1, 16, 16, 1), 2.5, np.float32)
    np.testing.assert_array_equal(
        quantize_u8_device(jnp.asarray(const), (16, 16)), np.zeros((16, 16))
    )

    # Written files byte-identical.
    p1, p2 = str(tmp_path / "host.png"), str(tmp_path / "dev.png")
    save_array_image(unpad(padded[0, :, :, 0], shape), p1)
    save_u8_image(dev, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()
