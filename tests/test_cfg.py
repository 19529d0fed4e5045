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


def test_lr_flag_is_live():
    """--lr must change the trained LR (the reference parses it into cfg
    and then ignores it, hardcoding 1e-4 — a documented quirk we fix).
    The cfg default carries the reference's EFFECTIVE base LR."""
    from spr_pick_tpu.params import StateValue
    from spr_pick_tpu.train import DenoiserTrainer

    c = cfg.base()
    assert c[ConfigValue.LEARNING_RATE] == pytest.approx(1e-4)
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    cfg.infer(c, model_only=True)

    c2 = dict(c)
    c2[ConfigValue.LEARNING_RATE] = 5e-5

    t1 = DenoiserTrainer(c, mode="joint")
    t2 = DenoiserTrainer(c2, mode="joint")
    assert t1.base_learning_rate == pytest.approx(1e-4)
    assert t2.base_learning_rate == pytest.approx(5e-5)
    # The whole schedule scales linearly with the base LR.
    it = c[ConfigValue.ITERATIONS] // 2
    t1.state[StateValue.ITERATION] = it
    t2.state[StateValue.ITERATION] = it
    assert t2.learning_rate == pytest.approx(t1.learning_rate * 0.5)
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(t2._scan_lrs(it, 3, 4)),
        np.asarray(t1._scan_lrs(it, 3, 4)) * 0.5, rtol=1e-6,
    )


def test_importer_maps_dead_reference_lr():
    """Reference checkpoints store cfg LEARNING_RATE=1e-5 but were
    TRAINED at the hardcoded 1e-4; the importer maps the dead default to
    the effective value (an explicit non-default value passes through)."""
    from spr_pick_tpu.compat import convert_cfg

    out = convert_cfg({ConfigValue.LEARNING_RATE: 1e-5})
    assert out[ConfigValue.LEARNING_RATE] == pytest.approx(1e-4)
    out = convert_cfg({ConfigValue.LEARNING_RATE: 3e-5})
    assert out[ConfigValue.LEARNING_RATE] == pytest.approx(3e-5)
