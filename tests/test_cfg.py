"""Config inference parity tests (vs reference spr_pick/cfg.py:146-202)."""

import pytest

from spr_pick_tpu import cfg
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, Pipeline


@pytest.mark.parametrize(
    "algo,pipeline,blindspot",
    [
        (NoiseAlgorithm.SELFSUPERVISED_DENOISING, Pipeline.SSDN, True),
        (NoiseAlgorithm.SELFSUPERVISED_DENOISING_MEAN_ONLY, Pipeline.MSE, True),
        (NoiseAlgorithm.NOISE_TO_NOISE, Pipeline.MSE, False),
        (NoiseAlgorithm.NOISE_TO_CLEAN, Pipeline.MSE, False),
        (NoiseAlgorithm.NOISE_TO_VOID, Pipeline.MASK_MSE, False),
    ],
)
def test_infer_pipeline_blindspot(algo, pipeline, blindspot):
    assert cfg.infer_pipeline(algo) == pipeline
    assert cfg.infer_blindspot(algo) == blindspot


def test_base_defaults():
    c = cfg.base()
    assert c[ConfigValue.ITERATIONS] == 200000
    assert c[ConfigValue.TRAIN_MINIBATCH_SIZE] == 16
    assert c[ConfigValue.TRAIN_PATCH_SIZE] == 64
    assert c[ConfigValue.ALPHA] == 0.8
    assert c[ConfigValue.TAU] == 0.01
    assert c[ConfigValue.BB] == 24
    assert c[ConfigValue.NMS] == 15
    assert c[ConfigValue.EVAL_INTERVAL] == 3200
    assert c[ConfigValue.PRINT_INTERVAL] == 1280


def test_config_name():
    c = cfg.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss25"
    assert cfg.config_name(c) == "ssdn-gauss25"

    c = cfg.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.NOISE_TO_CLEAN
    c[ConfigValue.NOISE_STYLE] = "gauss25"
    c[ConfigValue.PIPELINE] = Pipeline.SSDN
    assert cfg.config_name(c) == "n2c-ssdn_pipeline-gauss25"


def test_infer_dataset_type(tmp_path):
    c = cfg.base()
    manifest = tmp_path / "train_images.txt"
    manifest.write_text("image_name\tpath\n")
    c[ConfigValue.TRAIN_DATA_PATH] = str(manifest)
    c[ConfigValue.TEST_DATA_PATH] = str(tmp_path)
    cfg.infer_datasets(c)
    from spr_pick_tpu.params import DatasetType

    assert c[ConfigValue.TRAIN_DATASET_TYPE] == DatasetType.TXT
    assert c[ConfigValue.TEST_DATASET_TYPE] == DatasetType.FOLDER


def test_lr_schedule():
    from spr_pick_tpu.utils.schedule import compute_ramped_lrate

    # Trainer call-site behaviour (train.py:433-441): args are
    # (i, iters, rampdown_frac, rampup_frac, 1e-4) — note the swap.
    iters = 1000
    # Between ramp-up end (0.7 * iters) and ramp-down start (0.8 * iters):
    # full rate.
    assert compute_ramped_lrate(750, iters, 0.7, 0.2, 1e-4) == pytest.approx(1e-4)
    # Start: ~0
    assert compute_ramped_lrate(0, iters, 0.7, 0.2, 1e-4) == pytest.approx(0.0)
    # End: ~0
    assert compute_ramped_lrate(1000, iters, 0.7, 0.2, 1e-4) == pytest.approx(
        0.0, abs=1e-12
    )
