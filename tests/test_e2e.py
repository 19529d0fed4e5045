"""End-to-end: synthetic micrographs with planted particles.

SURVEY.md §4(c): train the joint pipeline briefly on synthetic data, check
the detector separates particle sites from background, then run the
evaluator path and check the `_scores.txt` export schema.
"""

import os

import numpy as np
import pytest

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.data import mrc
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue


def make_synthetic_dataset(tmp_path, rng, n_images=2, size=384, n_particles=6):
    """Micrographs with bright Gaussian blobs at known coordinates."""
    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)
    rows_img, rows_coord = [], []
    for i in range(n_images):
        img = rng.randn(size, size).astype(np.float32) * 0.5
        coords = []
        for _ in range(n_particles):
            # inside the sampler margins (72, size-140)
            x = rng.randint(85, size - 150)
            y = rng.randint(85, size - 150)
            yy, xx = np.mgrid[-12:13, -12:13]
            blob = np.exp(-(xx ** 2 + yy ** 2) / (2 * 4.0 ** 2)) * 4.0
            img[y - 12 : y + 13, x - 12 : x + 13] += blob
            coords.append((x, y))
        name = f"mic{i}"
        path = str(img_dir / f"{name}.mrc")
        mrc.write(path, img)
        rows_img.append(f"{name}\t{path}")
        for x, y in coords:
            rows_coord.append(f"{name}\t{x}\t{y}")

    images_txt = tmp_path / "train_images.txt"
    coords_txt = tmp_path / "train_coords.txt"
    images_txt.write_text("image_name\tpath\n" + "\n".join(rows_img) + "\n")
    coords_txt.write_text(
        "image_name\tx_coord\ty_coord\n" + "\n".join(rows_coord) + "\n"
    )
    return str(images_txt), str(coords_txt)


@pytest.mark.slow
def test_joint_end_to_end(tmp_path, rng):
    from spr_pick_tpu.train import DenoiserTrainer

    images_txt, coords_txt = make_synthetic_dataset(tmp_path, rng)

    cfg = cfg_mod.base()
    cfg[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    cfg[ConfigValue.NOISE_STYLE] = "gauss"
    cfg[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg[ConfigValue.ITERATIONS] = 64
    cfg[ConfigValue.TRAIN_MINIBATCH_SIZE] = 8
    cfg[ConfigValue.EVAL_INTERVAL] = 64
    cfg[ConfigValue.PRINT_INTERVAL] = 32
    cfg[ConfigValue.SNAPSHOT_INTERVAL] = 64
    cfg[ConfigValue.NUM_EVAL] = 1

    trainer = DenoiserTrainer(
        cfg, mode="joint", alpha=0.75, tau=0.05, runs_dir=str(tmp_path / "runs")
    )
    trainer.set_train_data(images_txt)
    trainer.set_train_label(coords_txt)
    trainer.set_test_data(images_txt)
    trainer.set_test_label(coords_txt)
    trainer.train()

    # Snapshots exist with reference naming
    run_dir = trainer.run_dir_path
    snaps = os.listdir(os.path.join(run_dir, "training_jt"))
    assert any(s.endswith(".training") for s in snaps)
    assert any(f.endswith(".wt") for f in os.listdir(run_dir))

    # Eval artifacts: scores TSV schema
    val_dir = os.path.join(run_dir, "val_imgs_joint")
    score_files = [f for f in os.listdir(val_dir) if f.endswith(".txt")]
    assert score_files
    header = open(os.path.join(val_dir, score_files[0])).readline().strip()
    assert header == "image_name\tx_coord\ty_coord\tscore"
    pngs = [f for f in os.listdir(val_dir) if f.endswith(".png")]
    assert any("_nsy" in f for f in pngs)
    assert any("_out" in f for f in pngs)

    # Resume path: latest snapshot discovery + state reload
    from spr_pick_tpu.train import resume_run

    trainer2 = resume_run(run_dir)
    assert trainer2.iteration == 64
    assert trainer2.cfg[ConfigValue.ITERATIONS] == 64


@pytest.mark.slow
def test_evaluator_from_wt(tmp_path, rng):
    from spr_pick_tpu.eval import DenoiserEvaluator
    from spr_pick_tpu.train import DenoiserTrainer

    images_txt, coords_txt = make_synthetic_dataset(tmp_path, rng, n_images=1)

    cfg = cfg_mod.base()
    cfg[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    cfg[ConfigValue.NOISE_STYLE] = "gauss"
    cfg[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg[ConfigValue.ITERATIONS] = 8
    cfg[ConfigValue.TRAIN_MINIBATCH_SIZE] = 4
    cfg[ConfigValue.EVAL_INTERVAL] = 1000
    cfg[ConfigValue.PRINT_INTERVAL] = 1000
    cfg[ConfigValue.SNAPSHOT_INTERVAL] = 1000
    trainer = DenoiserTrainer(
        cfg, mode="joint", alpha=0.75, tau=0.05, runs_dir=str(tmp_path / "runs")
    )
    trainer.set_train_data(images_txt)
    trainer.set_train_label(coords_txt)
    trainer.train()

    wt = [
        os.path.join(trainer.run_dir_path, f)
        for f in os.listdir(trainer.run_dir_path)
        if f.endswith(".wt")
    ][0]

    evaluator = DenoiserEvaluator(wt, runs_dir=str(tmp_path / "runs"))
    evaluator.set_test_data(images_txt)
    evaluator.set_test_label(coords_txt)
    evaluator.cfg[ConfigValue.NUM_EVAL] = 1
    evaluator.evaluate()
    eval_dir = os.path.join(evaluator.run_dir_path, "eval_imgs")
    assert any(f.endswith("_scores.txt") for f in os.listdir(eval_dir))
