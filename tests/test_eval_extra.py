"""Eval-path extras: PSNR vs ground truth, known-noise ssdn branch."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue
from spr_pick_tpu.steps import init_state, make_train_step


@pytest.mark.slow  # XLA compile dominates (>30 s even cached)
def test_known_noise_ssdn(rng):
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss25"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.KNOWN
    cfg_mod.infer(c, model_only=True)
    den = Denoiser(c, mode="denoise")
    state = init_state(den, seed=0)
    step = make_train_step(den, alpha=0.0, tau=0.0)
    batch = {
        "inp": jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32),
        "noise_std": jnp.full((2, 1, 1, 1), 25 / 255, jnp.float32),
    }
    state2, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.float32(1e-4))
    assert np.isfinite(float(np.mean(metrics["loss"])))
    # No learnable sigma / sigma net in known mode.
    assert "l_params" not in state2.trainable
    assert "sigma" not in state2.trainable


def test_known_noise_requires_std(rng):
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss25"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.KNOWN
    cfg_mod.infer(c, model_only=True)
    den = Denoiser(c, mode="denoise")
    state = init_state(den, seed=0)
    step = make_train_step(den, alpha=0.0, tau=0.0)
    batch = {"inp": jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)}
    with pytest.raises(ValueError, match="noise_std"):
        step(state, batch, jax.random.PRNGKey(0), jnp.float32(1e-4))


@pytest.mark.slow
def test_eval_psnr_with_gt(tmp_path, rng):
    """Ground-truth dataset wired through eval produces psnr_* metrics."""
    from spr_pick_tpu.data import mrc
    from spr_pick_tpu.params import HistoryValue, StateValue
    from spr_pick_tpu.train import DenoiserTrainer
    from tests.test_e2e import make_synthetic_dataset

    images_txt, coords_txt = make_synthetic_dataset(tmp_path, rng, n_images=1)
    # Ground truth = (smoothed) clean-ish copies with matching names.
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    import pandas as pd

    table = pd.read_csv(images_txt, sep="\t")
    rows = []
    for _, row in table.iterrows():
        img, _, _ = mrc.read(row["path"])
        mrc.write(str(gt_dir / f"{row.image_name}.mrc"), np.asarray(img))
        rows.append(f"{row.image_name}\t{gt_dir / (row.image_name + '.mrc')}")
    gt_txt = tmp_path / "gt_images.txt"
    gt_txt.write_text("image_name\tpath\n" + "\n".join(rows) + "\n")

    cfg = cfg_mod.base()
    cfg[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    cfg[ConfigValue.NOISE_STYLE] = "gauss"
    cfg[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg[ConfigValue.ITERATIONS] = 8
    cfg[ConfigValue.TRAIN_MINIBATCH_SIZE] = 4
    cfg[ConfigValue.EVAL_INTERVAL] = 8
    cfg[ConfigValue.PRINT_INTERVAL] = 8
    cfg[ConfigValue.SNAPSHOT_INTERVAL] = 8
    trainer = DenoiserTrainer(
        cfg, mode="joint", alpha=0.75, tau=0.05, runs_dir=str(tmp_path / "runs")
    )
    trainer.set_train_data(images_txt)
    trainer.set_train_label(coords_txt)
    trainer.set_test_data(images_txt)
    trainer.set_test_label(coords_txt)
    trainer.set_test_gt_data(str(gt_txt))
    trainer.train()
    eval_hist = trainer.state[StateValue.HISTORY][HistoryValue.EVAL]
    assert "psnr_out" in eval_hist


@pytest.mark.slow
def test_batched_group_nms_wiring(tmp_path, rng):
    """Eval groups of same-size micrographs NMS in ONE vmapped program
    (batched/single equality is proven at the ops level); this exercises
    the trainer wiring end-to-end."""
    from spr_pick_tpu.eval import DenoiserEvaluator
    from spr_pick_tpu.train import DenoiserTrainer
    from tests.test_e2e import make_synthetic_dataset

    images_txt, coords_txt = make_synthetic_dataset(
        tmp_path, rng, n_images=2, size=256
    )
    cfg = cfg_mod.base()
    cfg[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    cfg[ConfigValue.NOISE_STYLE] = "gauss"
    cfg[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg[ConfigValue.ITERATIONS] = 4
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

    ev = DenoiserEvaluator(wt, runs_dir=str(tmp_path / "runs"))
    ev.set_test_data(images_txt)
    ev.set_test_label(coords_txt)
    ev.cfg[ConfigValue.NUM_EVAL] = 2
    ev.cfg[ConfigValue.TEST_MINIBATCH_SIZE] = 2  # group of 2 -> batched NMS
    ev.evaluate()
    eval_dir = os.path.join(ev.run_dir_path, "eval_imgs")
    score_files = sorted(
        f for f in os.listdir(eval_dir) if f.endswith("_scores.txt")
    )
    assert len(score_files) == 2

    # Batched-vs-single NMS equality is proven at the ops level
    # (test_ops.test_nms_batch_matches_single); here assert the wiring:
    # both micrographs exported schema-valid, border-filtered picks.
    for fname in score_files:
        rows = open(os.path.join(eval_dir, fname)).read().strip().splitlines()
        assert rows[0] == "image_name\tx_coord\ty_coord\tscore"
        assert len(rows) > 1, "batched path exported no picks"
        for line in rows[1:]:
            _, x, y, s = line.split("\t")
            assert 30 < int(x) < 226 and 30 < int(y) < 226
            assert 0.02 < float(s) <= 1.0


@pytest.mark.slow
def test_non_square_micrograph_eval(tmp_path, rng):
    """Non-square micrographs run the RECT dense route (two-lane rotation
    fold, no square-padding tax — the reference's torch.cat of rotations
    would crash here); artifacts and scores come back unpadded."""
    from spr_pick_tpu.data import mrc
    from spr_pick_tpu.train import DenoiserTrainer

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img = rng.rand(224, 288).astype(np.float32)  # H != W
    mrc.write(str(img_dir / "wide.mrc"), img)
    (tmp_path / "imgs.txt").write_text(
        f"image_name\tpath\nwide\t{img_dir / 'wide.mrc'}\n"
    )
    (tmp_path / "coords.txt").write_text(
        "image_name\tx_coord\ty_coord\nwide\t150\t120\nwide\t90\t80\n"
    )
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    c[ConfigValue.ITERATIONS] = 4
    c[ConfigValue.TRAIN_MINIBATCH_SIZE] = 4
    c[ConfigValue.EVAL_INTERVAL] = 4
    c[ConfigValue.PRINT_INTERVAL] = 1000
    c[ConfigValue.SNAPSHOT_INTERVAL] = 1000
    c[ConfigValue.NUM_EVAL] = 1
    trainer = DenoiserTrainer(
        c, mode="joint", alpha=0.75, tau=0.05, runs_dir=str(tmp_path / "runs")
    )
    trainer.set_train_data(str(tmp_path / "imgs.txt"))
    trainer.set_train_label(str(tmp_path / "coords.txt"))
    trainer.set_test_data(str(tmp_path / "imgs.txt"))
    trainer.set_test_label(str(tmp_path / "coords.txt"))
    trainer.train()

    # The rect route (no square padding) must be active for this model.
    assert trainer.denoiser.supports_rect_dense
    item = trainer.testset.test_item(0, pad_multiple=32, square=False)
    assert item["inp"].shape[1] != item["inp"].shape[2]  # stays rectangular

    val_dir = os.path.join(trainer.run_dir_path, "val_imgs_joint")
    score_files = [f for f in os.listdir(val_dir) if f.endswith("_scores.txt")]
    assert score_files
    rows = open(os.path.join(val_dir, score_files[0])).read().strip().splitlines()
    for line in rows[1:]:
        _, x, y, _ = line.split("\t")
        # coords inside the ORIGINAL (unpadded) image, border-filtered
        assert 30 < int(x) < 224 - 30 and 30 < int(y) < 288 - 30


def test_eval_pipeline_mode_matches_sync(tmp_path, rng, monkeypatch):
    """SPR_EVAL_PIPELINE=1 (host export deferred one group behind the
    device dispatch) must produce byte-identical artifacts and metrics to
    the default serial order.  `_eval_step` is faked with deterministic
    outputs so this exercises the grouping / batched-device-NMS / pipeline
    wiring in `_evaluate`, not the model."""
    from spr_pick_tpu.data import mrc
    from spr_pick_tpu.params import HistoryValue, PipelineOutput, StateValue
    from spr_pick_tpu.train import DenoiserTrainer

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    # Two shape groups (96x96 x3, 96x128 x2) with batch 2: exercises a
    # full batched group, a singleton tail, and a shape-change break.
    shapes = [(96, 96), (96, 96), (96, 96), (96, 128), (96, 128)]
    rows = []
    for i, (h, w) in enumerate(shapes):
        img = rng.rand(h, w).astype(np.float32)
        mrc.write(str(img_dir / f"m{i}.mrc"), img)
        rows.append(f"m{i}\t{img_dir / f'm{i}.mrc'}")
    images_txt = tmp_path / "imgs.txt"
    images_txt.write_text("image_name\tpath\n" + "\n".join(rows) + "\n")

    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    c[ConfigValue.TEST_MINIBATCH_SIZE] = 2
    c[ConfigValue.NUM_EVAL] = len(shapes)
    trainer = DenoiserTrainer(
        c, mode="joint", alpha=0.75, tau=0.05, runs_dir=str(tmp_path / "runs")
    )
    trainer.new_target()
    trainer.set_test_data(str(images_txt))
    trainer.testset, trainer.test_sampler = trainer.test_data()

    def fake_eval_step(state, batch, rng_key):
        inp = jnp.asarray(batch["inp"])
        return {
            PipelineOutput.DETECT: inp,
            PipelineOutput.IMG_DENOISED: inp * 0.5,
        }

    trainer._eval_step = fake_eval_step

    def run(mode_dir, pipelined):
        monkeypatch.setenv("SPR_EVAL_PIPELINE", "1" if pipelined else "0")
        trainer.reset_metrics(train=False)

        def callback(idx, outputs, item):
            trainer.save_image_outputs(
                outputs, item, str(mode_dir), "{name}_{desc}.png",
                "{name}_{desc}.txt",
            )

        trainer._evaluate(output_callback=callback, picks_for_all=True)
        return trainer.state[StateValue.HISTORY][HistoryValue.EVAL]["n"]

    n_sync = run(tmp_path / "sync", False)
    n_pipe = run(tmp_path / "pipe", True)
    assert n_sync == n_pipe == len(shapes)

    sync_files = sorted(os.listdir(tmp_path / "sync"))
    pipe_files = sorted(os.listdir(tmp_path / "pipe"))
    assert sync_files == pipe_files
    assert any(f.endswith("_scores.txt") for f in sync_files)
    for f in sync_files:
        a = (tmp_path / "sync" / f).read_bytes()
        b = (tmp_path / "pipe" / f).read_bytes()
        assert a == b, f"artifact {f} differs between pipeline modes"


def test_threaded_export_matches_inline(tmp_path, rng, monkeypatch):
    """The export thread pool (SPR_EXPORT_THREADS, r4) must produce
    byte-identical artifacts to inline writes, and _evaluate must join the
    pool before returning (every file on disk at return)."""
    from spr_pick_tpu.data import mrc
    from spr_pick_tpu.params import PipelineOutput
    from spr_pick_tpu.train import DenoiserTrainer

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(4):
        img = rng.rand(96, 96).astype(np.float32)
        mrc.write(str(img_dir / f"m{i}.mrc"), img)
        rows.append(f"m{i}\t{img_dir / f'm{i}.mrc'}")
    images_txt = tmp_path / "imgs.txt"
    images_txt.write_text("image_name\tpath\n" + "\n".join(rows) + "\n")

    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    c[ConfigValue.TEST_MINIBATCH_SIZE] = 2
    c[ConfigValue.NUM_EVAL] = 4
    trainer = DenoiserTrainer(
        c, mode="joint", alpha=0.75, tau=0.05, runs_dir=str(tmp_path / "runs")
    )
    trainer.new_target()
    trainer.set_test_data(str(images_txt))
    trainer.testset, trainer.test_sampler = trainer.test_data()

    def fake_eval_step(state, batch, rng_key):
        inp = jnp.asarray(batch["inp"])
        return {
            PipelineOutput.DETECT: inp,
            PipelineOutput.IMG_DENOISED: inp * 0.5,
        }

    trainer._eval_step = fake_eval_step

    def run(out_dir, threads):
        monkeypatch.setenv("SPR_EXPORT_THREADS", str(threads))
        trainer.reset_metrics(train=False)

        def callback(idx, outputs, item):
            trainer.save_image_outputs(
                outputs, item, str(out_dir), "{name}_{desc}.png",
                "{name}_{desc}.txt",
            )

        trainer._evaluate(output_callback=callback, picks_for_all=True)

    run(tmp_path / "inline", 0)
    run(tmp_path / "pooled", 4)
    inline_files = sorted(os.listdir(tmp_path / "inline"))
    pooled_files = sorted(os.listdir(tmp_path / "pooled"))
    assert inline_files == pooled_files and len(inline_files) > 0
    for f in inline_files:
        a = (tmp_path / "inline" / f).read_bytes()
        b = (tmp_path / "pooled" / f).read_bytes()
        assert a == b, f"artifact {f} differs between export modes"


def test_export_pool_backpressure(monkeypatch):
    """_submit_export must bound its pending queue (each pending u8 future
    pins a device-resident array, so an unbounded queue accumulates memory
    whenever the device outruns the disk) while still completing every
    write and propagating failures."""
    import threading
    import time

    from spr_pick_tpu.train import DenoiserTrainer

    monkeypatch.setenv("SPR_EXPORT_THREADS", "2")
    trainer = DenoiserTrainer.__new__(DenoiserTrainer)

    done = []
    lock = threading.Lock()

    def slow_write(i):
        time.sleep(0.005)
        with lock:
            done.append(i)

    max_pending = 0
    for i in range(60):
        trainer._submit_export(slow_write, i)
        max_pending = max(max_pending, len(trainer._pending_exports))
    assert max_pending <= 2 * 4, f"queue grew to {max_pending}"
    trainer._flush_exports()
    assert sorted(done) == list(range(60))

    # Failures surface (eagerly at a later submit, or at flush).
    def boom():
        raise RuntimeError("disk full")

    with pytest.raises(RuntimeError, match="disk full"):
        for _ in range(60):
            trainer._submit_export(boom)
        trainer._flush_exports()


def test_ssdn_three_channel_full_covariance(rng):
    """3-channel ssdn denoise-only path (full triangular-A covariance)."""
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss25"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    c[ConfigValue.IMAGE_CHANNELS] = 3
    cfg_mod.infer(c, model_only=True)
    den = Denoiser(c, mode="denoise")
    assert den.out_channels == 9  # 3 means + 6 triangular A
    state = init_state(den, seed=0)
    step = make_train_step(den, alpha=0.0, tau=0.0)
    batch = {"inp": jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)}
    state2, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.float32(1e-4))
    assert np.isfinite(float(np.mean(metrics["loss"])))
