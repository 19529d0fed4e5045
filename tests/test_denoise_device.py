"""Device-resident denoise data plane: jax noise DSL, jax n2v UPS,
DeviceDenoisePipeline and the fused denoise train scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.data import n2v as n2v_mod
from spr_pick_tpu.data.noise import add_style, add_style_jax
from spr_pick_tpu.data.noisy import prepare_batch, prepare_batch_jax
from spr_pick_tpu.data.patches import DenoisePatchPipeline, DeviceDenoisePipeline
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm
from spr_pick_tpu.steps import init_state, make_denoise_scan


class _ArrayDataset:
    def __init__(self, imgs):
        self.imgs = imgs

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, i):
        return self.imgs[i]

    def name(self, i):
        return f"img{i}"


# ---------------------------------------------------------------------------
# add_style_jax
# ---------------------------------------------------------------------------


def test_add_style_jax_gauss_fixed():
    imgs = jnp.zeros((4, 64, 64))
    out, coeff = add_style_jax(imgs, "gauss25_nc", jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(coeff), 25 / 255, rtol=1e-6)
    assert abs(float(jnp.std(out)) - 25 / 255) < 0.005
    assert abs(float(jnp.mean(out))) < 0.005
    # default style clips to [0, 1] like the host path (noise.py:48-49)
    clipped, _ = add_style_jax(imgs, "gauss25", jax.random.PRNGKey(0))
    assert float(jnp.min(clipped)) == 0.0 and float(jnp.max(clipped)) <= 1.0


def test_add_style_jax_gauss_range():
    imgs = jnp.zeros((8, 32, 32))
    out, coeff = add_style_jax(imgs, "gauss5_50", jax.random.PRNGKey(1))
    c = np.asarray(coeff).reshape(-1)
    assert (c >= 5 / 255 - 1e-6).all() and (c <= 50 / 255 + 1e-6).all()
    assert np.unique(np.round(c, 6)).size > 1  # varies per item


def test_add_style_jax_poisson_matches_host_semantics(rng):
    imgs = jnp.full((4, 64, 64), 0.5)
    out, coeff = add_style_jax(imgs, "poisson30", jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(coeff), 30.0, rtol=1e-6)
    host_out, _ = add_style(np.full((4, 64, 64), 0.5, np.float32), "poisson30",
                            rng=rng)
    # Same shift-by-Poisson(1)/lam semantics: mean offset 1/30, std 1/30.
    assert abs(float(jnp.mean(out)) - np.mean(host_out)) < 0.003
    assert abs(float(jnp.std(out)) - np.std(host_out)) < 0.003


# ---------------------------------------------------------------------------
# manipulate_jax (n2v UPS)
# ---------------------------------------------------------------------------


def test_manipulate_jax_semantics():
    h = w = 64
    img = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w)
    out, mask = n2v_mod.manipulate_jax(img, jax.random.PRNGKey(0), 5)
    out, mask = np.asarray(out[0]), np.asarray(mask[0])
    src = np.arange(h * w, dtype=np.float32).reshape(h, w)

    # One target per 8x8 grid cell: exactly 64 for a 64x64 image.
    assert mask.sum() == 64
    # Untouched pixels unchanged; masked pixels replaced by a DIFFERENT pixel
    # of their 5x5 window (values are unique -> positional check).
    np.testing.assert_array_equal(out[mask == 0], src[mask == 0])
    ys, xs = np.nonzero(mask)
    for y, x in zip(ys, xs):
        v = int(out[y, x])
        dy, dx = v // w, v % w
        assert (dy, dx) != (y, x)
        assert abs(dy - y) <= 2 and abs(dx - x) <= 2

    # Stratified: one target in each 8x8 box.
    boxes = np.zeros((8, 8))
    for y, x in zip(ys, xs):
        boxes[y // 8, x // 8] += 1
    assert (boxes == 1).all()


def test_manipulate_jax_non_multiple_size():
    img = jnp.asarray(np.random.RandomState(0).rand(2, 60, 52), jnp.float32)
    out, mask = n2v_mod.manipulate_jax(img, jax.random.PRNGKey(3), 5)
    assert out.shape == (2, 60, 52) and mask.shape == (2, 60, 52)
    assert np.isfinite(np.asarray(out)).all()
    # ceil(60/8)*ceil(52/8) = 8*7 = 56 grid cells; out-of-range draws drop.
    counts = np.asarray(mask).reshape(2, -1).sum(axis=1)
    assert (counts <= 56).all() and (counts >= 40).all()


def test_manipulate_jax_density_matches_host(rng):
    img = rng.rand(128, 128).astype(np.float32)
    _, mask_host = n2v_mod.manipulate(img, 5, rng=rng)
    _, mask_dev = n2v_mod.manipulate_jax(
        jnp.asarray(img)[None], jax.random.PRNGKey(4), 5
    )
    assert mask_host.sum() == float(np.asarray(mask_dev).sum())


# ---------------------------------------------------------------------------
# prepare_batch_jax: same key/shape surface as the host path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "algorithm",
    [
        NoiseAlgorithm.NOISE_TO_CLEAN,
        NoiseAlgorithm.NOISE_TO_NOISE,
        NoiseAlgorithm.NOISE_TO_VOID,
        NoiseAlgorithm.SELFSUPERVISED_DENOISING,
        NoiseAlgorithm.SELFSUPERVISED_DENOISING_MEAN_ONLY,
    ],
)
def test_prepare_batch_jax_matches_host_surface(algorithm, rng):
    crops = rng.rand(2, 32, 32).astype(np.float32)
    host = prepare_batch(crops, algorithm, "gauss25", rng, training=True)
    dev = prepare_batch_jax(
        jnp.asarray(crops), algorithm, "gauss25", jax.random.PRNGKey(0),
        training=True,
    )
    assert set(dev.keys()) == set(host.keys())
    for k in host:
        assert dev[k].shape == host[k].shape, k

    if algorithm == NoiseAlgorithm.NOISE_TO_CLEAN:
        np.testing.assert_array_equal(np.asarray(dev["inp"])[..., 0], crops)
    if algorithm == NoiseAlgorithm.NOISE_TO_VOID:
        mask = np.asarray(dev["mask"])[..., 0]
        inp = np.asarray(dev["inp"])[..., 0]
        np.testing.assert_array_equal(inp[mask == 0], crops[mask == 0])
        assert (inp[mask == 1] != crops[mask == 1]).mean() > 0.95


def test_prepare_batch_jax_noise_input():
    crops = jnp.zeros((2, 32, 32))
    dev = prepare_batch_jax(
        crops, NoiseAlgorithm.SELFSUPERVISED_DENOISING, "gauss25",
        jax.random.PRNGKey(0), noise_input=True,
    )
    assert dev["noise_std"].shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(dev["noise_std"]), 25 / 255, rtol=1e-6)
    assert float(jnp.std(dev["inp"])) > 0.05


# ---------------------------------------------------------------------------
# DeviceDenoisePipeline
# ---------------------------------------------------------------------------


def _dataset(rng, sizes=((96, 80), (72, 88), (64, 64))):
    return _ArrayDataset([rng.rand(*s).astype(np.float32) for s in sizes])


def test_device_pipeline_crops_come_from_images(rng):
    ds = _dataset(rng)
    pipe = DeviceDenoisePipeline(
        ds, patch=64, algorithm=NoiseAlgorithm.NOISE_TO_CLEAN,
        noise_style="gauss25", seed=0,
    )
    batch = pipe.batch(6)
    assert batch["inp"].shape == (6, 64, 64, 1)
    # n2c keeps inp == the clean crop: every crop must be an exact window of
    # one of the source images.
    crops = np.asarray(batch["inp"])[..., 0]
    for crop in crops:
        found = False
        for img in ds.imgs:
            h, w = img.shape
            for y0 in range(h - 63):
                row = img[y0 : y0 + 64]
                for x0 in range(w - 63):
                    if np.array_equal(row[:, x0 : x0 + 64], crop):
                        found = True
                        break
                if found:
                    break
            if found:
                break
        assert found


def test_device_pipeline_reflect_pads_undersized(rng):
    ds = _ArrayDataset([rng.rand(40, 40).astype(np.float32)])
    pipe = DeviceDenoisePipeline(
        ds, patch=64, algorithm=NoiseAlgorithm.NOISE_TO_CLEAN,
        noise_style="gauss25", seed=0,
    )
    batch = pipe.batch(2)
    assert batch["inp"].shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(batch["inp"])).all()


def test_device_pipeline_size_gate(rng):
    ds = _dataset(rng)
    with pytest.raises(ValueError):
        DeviceDenoisePipeline(
            ds, patch=64, algorithm=NoiseAlgorithm.NOISE_TO_CLEAN,
            noise_style="gauss25", max_bytes=1024,
        )


def test_device_pipeline_resume(rng):
    ds = _dataset(rng)

    def mk():
        return DeviceDenoisePipeline(
            ds, patch=64, algorithm=NoiseAlgorithm.NOISE_TO_NOISE,
            noise_style="gauss25", seed=0,
        )

    a = mk()
    a.batch(4)
    sd = a.state_dict()
    want = a.batch(4)

    b = mk()
    b.load_state_dict(sd)
    got = b.batch(4)
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]), np.asarray(got[k]))


def test_budget_gate_rejects_before_full_decode():
    """The max_bytes gate must fire DURING the decode loop (lower bound on
    the final padded stack), not after the whole dataset sits in host RAM."""
    decoded = []

    class CountingDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            decoded.append(i)
            return np.zeros((256, 256), np.float32)

        def name(self, i):
            return f"img{i}"

    with pytest.raises(ValueError):
        DeviceDenoisePipeline(
            CountingDataset(), patch=64,
            algorithm=NoiseAlgorithm.NOISE_TO_CLEAN, noise_style="gauss25",
            max_bytes=1 << 20,  # 64*256*256*4 = 16 MiB padded
        )
    # 64 * 256 * 256 * 4 already exceeds 1 MiB at the FIRST image.
    assert decoded == [0]


def test_trainer_scan_recipe_matches_pipeline(tmp_path, rng, monkeypatch):
    """The trainer's fused K-step scan must be built from the PIPELINE's
    batch recipe (algorithm/noise_style/noise_input), so the scan fast path
    and the pipeline.batch() fallback construct identical batches."""
    from spr_pick_tpu import steps as steps_mod
    from spr_pick_tpu.data import mrc
    from spr_pick_tpu.train import DenoiserTrainer

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    mrc.write(str(img_dir / "img0.mrc"), rng.randn(96, 96).astype(np.float32))

    captured = {}
    real = steps_mod.make_denoise_scan
    real_sharded = steps_mod.make_denoise_scan_sharded

    def recording(*args, **kwargs):
        captured.update(kwargs)
        return real(*args, **kwargs)

    def recording_sharded(*args, **kwargs):
        # Under >1 visible devices the trainer auto-meshes and builds the
        # sharded variant; the recipe contract is the same.
        captured.update({k: v for k, v in kwargs.items() if k != "mesh"})
        return real_sharded(*args, **kwargs)

    monkeypatch.setattr(steps_mod, "make_denoise_scan", recording)
    monkeypatch.setattr(
        steps_mod, "make_denoise_scan_sharded", recording_sharded
    )

    cfg = cfg_mod.base()
    cfg[ConfigValue.ALGORITHM] = NoiseAlgorithm.NOISE_TO_CLEAN
    cfg[ConfigValue.NOISE_STYLE] = "gauss25"
    cfg[ConfigValue.NOISE_INPUT] = True
    trainer = DenoiserTrainer(cfg, mode="denoise", runs_dir=str(tmp_path / "runs"))
    trainer.set_train_data(str(img_dir))
    trainer.new_target()
    _, _, pipeline = trainer.train_data()
    trainer.patch_pipeline = pipeline

    assert pipeline.noise_input is True  # cfg reached the pipeline
    trainer._build_denoise_scan()
    assert captured["noise_input"] is True
    assert captured["algorithm"] == pipeline.algorithm
    assert captured["noise_style"] == pipeline.noise_style


def test_sample_coords_in_bounds(rng):
    ds = _dataset(rng)
    pipe = DeviceDenoisePipeline(
        ds, patch=64, algorithm=NoiseAlgorithm.NOISE_TO_CLEAN,
        noise_style="gauss25", seed=1,
    )
    flat, ys, xs = pipe.sample_coords((5, 8))
    assert flat.shape == (5, 8)
    assert (ys >= 0).all() and (xs >= 0).all()
    assert (ys + 64 <= pipe.heights[flat]).all()
    assert (xs + 64 <= pipe.widths[flat]).all()


# ---------------------------------------------------------------------------
# make_denoise_scan
# ---------------------------------------------------------------------------


def _n2c_cfg():
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.NOISE_TO_CLEAN
    c[ConfigValue.NOISE_STYLE] = "gauss25"
    cfg_mod.infer(c, model_only=True)
    return c


@pytest.mark.slow
def test_denoise_scan_runs_and_updates(rng):
    den = Denoiser(_n2c_cfg(), mode="denoise")
    state = init_state(den, seed=0, patch=32)
    scan = make_denoise_scan(
        den, alpha=0.0, tau=0.0, patch=32,
        algorithm=NoiseAlgorithm.NOISE_TO_CLEAN, noise_style="gauss25",
    )
    ds = _dataset(rng)
    pipe = DeviceDenoisePipeline(
        ds, patch=32, algorithm=NoiseAlgorithm.NOISE_TO_CLEAN,
        noise_style="gauss25", seed=0,
    )
    k, b = 3, 2
    flat, ys, xs = pipe.sample_coords((k, b))
    lrs = jnp.full((k,), 1e-4, jnp.float32)
    leaf0 = np.asarray(jax.tree_util.tree_leaves(state.trainable)[0]).copy()
    step0 = int(state.step)  # read before the donated call invalidates it
    state2, metrics = scan(
        state, pipe.images_dev,
        jnp.asarray(flat), jnp.asarray(ys), jnp.asarray(xs),
        lrs, jax.random.PRNGKey(0),
    )
    assert np.asarray(metrics["loss"]).shape == (k,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert int(state2.step) == step0 + k
    leaf1 = np.asarray(jax.tree_util.tree_leaves(state2.trainable)[0])
    assert not np.allclose(leaf0, leaf1)


def test_prepare_batch_host_noise_input_fixed_style(rng):
    """Fixed-parameter styles ("gauss25") return ONE scalar coefficient;
    the host plane must broadcast it per-item like prepare_batch_jax
    instead of crashing on the (B,1,1,1) reshape (B > 1)."""
    crops = rng.rand(4, 32, 32).astype(np.float32)
    host = prepare_batch(
        crops, NoiseAlgorithm.NOISE_TO_NOISE, "gauss25", rng,
        noise_input=True,
    )
    assert host["noise_std"].shape == (4, 1, 1, 1)
    np.testing.assert_allclose(host["noise_std"], 25 / 255, rtol=1e-6)
    assert float(np.std(host["inp"] - crops[..., None])) > 0.05

    # Range styles keep their per-item draws.
    ranged = prepare_batch(
        crops, NoiseAlgorithm.NOISE_TO_NOISE, "gauss10_50", rng,
        noise_input=True,
    )
    assert ranged["noise_std"].shape == (4, 1, 1, 1)
    assert len(np.unique(ranged["noise_std"])) > 1

    # Fixed poisson styles return a Python-int lam — that is a REAL
    # coefficient, not the no-noise sentinel; noise_std must be present
    # (noise_value=known depends on it) exactly like prepare_batch_jax.
    pois = prepare_batch(
        crops, NoiseAlgorithm.NOISE_TO_NOISE, "poisson30", rng,
        noise_input=True,
    )
    assert pois["noise_std"].shape == (4, 1, 1, 1)
    np.testing.assert_allclose(pois["noise_std"], 30.0)

    # No noise_input -> no noise_std key at all.
    off = prepare_batch(
        crops, NoiseAlgorithm.NOISE_TO_NOISE, "gauss25", rng,
        noise_input=False,
    )
    assert "noise_std" not in off
