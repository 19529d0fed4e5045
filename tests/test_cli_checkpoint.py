"""CLI parsing + checkpoint format unit tests."""

import os

import numpy as np
import pytest

from spr_pick_tpu.cli.cli import build_parser
from spr_pick_tpu.utils import checkpoint as ckpt


def test_cli_train_start_flags():
    p = build_parser()
    args = vars(
        p.parse_args(
            [
                "train", "start", "-a", "ssdn", "-n", "gauss",
                "--noise_value", "var", "-t", "imgs.txt", "-l", "coords.txt",
                "--alpha", "0.75", "--tau", "0.01", "--iterations", "80000",
                "--bb", "24", "--nms", "18", "--train_batch_size", "4",
            ]
        )
    )
    assert args["command"] == "train"
    assert args["train_cmd"] == "start"
    assert args["algorithm"] == "ssdn"
    assert args["noise_value"] == "var"
    assert args["alpha"] == 0.75
    assert args["tau"] == 0.01
    assert args["iterations"] == 80000
    assert args["nms"] == 18


def test_cli_train_resume_flags():
    p = build_parser()
    args = vars(p.parse_args(["train", "resume", "hi_runs/00000-train-x"]))
    assert args["train_cmd"] == "resume"
    assert args["run_dir"] == "hi_runs/00000-train-x"


def test_cli_eval_flags():
    p = build_parser()
    args = vars(
        p.parse_args(
            ["eval", "-m", "model.wt", "-d", "imgs.txt", "--num", "100"]
        )
    )
    assert args["command"] == "eval"
    assert args["model"] == "model.wt"
    assert args["num"] == 100


def test_cli_requires_noise_value_for_ssdn(capsys):
    from spr_pick_tpu.cli.cli import run_train

    args = {
        "train_cmd": "start", "algorithm": "ssdn", "noise_value": None,
        "noise_style": "gauss", "dn_only": False, "runs_dir": "x",
        "alpha": 0.5, "tau": 0.01,
    }
    with pytest.raises(SystemExit):
        run_train(args)


def test_checkpoint_roundtrip(tmp_path, rng):
    trainable = {"model": {"w": rng.randn(3, 3).astype(np.float32)}}
    static = {"model": {"bn": rng.randn(4).astype(np.float32)}}
    opt_state = (np.zeros(3, np.float32),)
    cfg = {"key": 1}

    path = str(tmp_path / "model_00000042.training")
    ckpt.save_training(path, trainable, static, opt_state, cfg, "joint", 42)
    state = ckpt.load(path)
    assert state["iteration"] == 42
    assert state["mode"] == "joint"
    np.testing.assert_array_equal(
        state["trainable"]["model"]["w"], trainable["model"]["w"]
    )

    wt_path = str(tmp_path / "final-x.wt")
    ckpt.save_weights(wt_path, trainable, static, cfg, "joint")
    wt = ckpt.load(wt_path)
    assert wt["format"].startswith("spr_pick_tpu.wt")


def test_find_latest_training(tmp_path):
    sub = tmp_path / "training_jt"
    sub.mkdir()
    for it in (100, 5000, 320):
        (sub / f"model_{it:08d}.training").write_bytes(b"x")
    path = ckpt.find_latest_training(str(tmp_path))
    assert path.endswith("model_00005000.training")
    with pytest.raises(ValueError):
        ckpt.find_latest_training(str(tmp_path), "training_dn")


def test_cli_noise_input_requires_dn_only():
    """--noise_input is a denoise-data-plane switch (NoisyDataset analog);
    the joint micrograph path adds no synthetic noise, so accepting the
    flag there would silently do nothing."""
    from spr_pick_tpu.cli.cli import run_train

    args = {
        "train_cmd": "start", "algorithm": "n2c", "noise_value": None,
        "noise_style": "gauss25", "dn_only": False, "runs_dir": "x",
        "alpha": 0.5, "tau": 0.01, "noise_input": True,
    }
    with pytest.raises(SystemExit, match="dn_only"):
        run_train(args)
