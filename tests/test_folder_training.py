"""Denoise-only training on folder datasets (n2c path, no coordinates)."""

import os

import numpy as np
import pytest

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.data import mrc
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm


@pytest.mark.slow
def test_folder_n2c_training(tmp_path, rng):
    from spr_pick_tpu.train import DenoiserTrainer

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        mrc.write(str(img_dir / f"img{i}.mrc"), rng.randn(128, 128).astype(np.float32))

    cfg = cfg_mod.base()
    cfg[ConfigValue.ALGORITHM] = NoiseAlgorithm.NOISE_TO_CLEAN
    cfg[ConfigValue.NOISE_STYLE] = "gauss25"
    cfg[ConfigValue.ITERATIONS] = 16
    cfg[ConfigValue.TRAIN_MINIBATCH_SIZE] = 4
    cfg[ConfigValue.TRAIN_PATCH_SIZE] = 64
    cfg[ConfigValue.EVAL_INTERVAL] = 1000
    cfg[ConfigValue.PRINT_INTERVAL] = 8
    cfg[ConfigValue.SNAPSHOT_INTERVAL] = 16

    trainer = DenoiserTrainer(cfg, mode="denoise", runs_dir=str(tmp_path / "runs"))
    trainer.set_train_data(str(img_dir))
    trainer.set_test_data(str(img_dir))
    trainer.train()

    run_dir = trainer.run_dir_path
    assert os.path.isdir(os.path.join(run_dir, "training_dn"))
    assert any(f.endswith(".wt") for f in os.listdir(run_dir))
    # eval artifacts from the unlabeled eval dataset
    val_dir = os.path.join(run_dir, "val_imgs_denoise")
    assert any(f.endswith(".png") for f in os.listdir(val_dir))

    # CLI-style resume of a --dn_only run: mode is auto-detected from the
    # run dir (training_dn/), no flag needed (reference train.py:1204-1242
    # could only resume joint runs).
    from spr_pick_tpu.train import resume_run

    trainer2 = resume_run(run_dir)
    assert trainer2.mode == "denoise"
    assert trainer2.iteration == 16


@pytest.mark.slow
def test_interval_work_fires_on_crossings(tmp_path, rng):
    """A batch size that does not divide the snapshot/print intervals must
    still fire them at each boundary CROSSING (the reference's
    `iteration % interval == 0` pattern silently skips to the lcm)."""
    from spr_pick_tpu.train import DenoiserTrainer

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    mrc.write(str(img_dir / "img0.mrc"), rng.randn(128, 128).astype(np.float32))

    cfg = cfg_mod.base()
    cfg[ConfigValue.ALGORITHM] = NoiseAlgorithm.NOISE_TO_CLEAN
    cfg[ConfigValue.NOISE_STYLE] = "gauss25"
    cfg[ConfigValue.ITERATIONS] = 21
    cfg[ConfigValue.TRAIN_MINIBATCH_SIZE] = 3  # does not divide 8
    cfg[ConfigValue.TRAIN_PATCH_SIZE] = 64
    cfg[ConfigValue.EVAL_INTERVAL] = 1000
    cfg[ConfigValue.PRINT_INTERVAL] = 8
    cfg[ConfigValue.SNAPSHOT_INTERVAL] = 8

    trainer = DenoiserTrainer(cfg, mode="denoise", runs_dir=str(tmp_path / "runs"))
    trainer.set_train_data(str(img_dir))
    trainer.train()

    snap_dir = os.path.join(trainer.run_dir_path, "training_dn")
    iters = sorted(
        int(f.split("_")[1].split(".")[0])
        for f in os.listdir(snap_dir)
        if f.startswith("model_")
    )
    # Crossings of 8 with step 3: fires at 9 and 18 (plus 0 and the final
    # snapshot at 21); the % pattern would have fired at 0 only.
    assert 9 in iters and 18 in iters, iters
