"""User-facing CLI smoke: `python -m spr_pick_tpu train start` + eval run in
a subprocess on synthetic data (the exact reference workflow)."""

import os
import subprocess
import sys

import pytest

from tests.test_e2e import make_synthetic_dataset


@pytest.mark.slow
def test_cli_train_and_eval_subprocess(tmp_path, rng, subprocess_jax_env):
    images_txt, coords_txt = make_synthetic_dataset(tmp_path, rng, n_images=1)
    runs_dir = str(tmp_path / "runs")

    # TPU when the backend probe passed; a TPU-free CPU env when the
    # tunnel is down (the child would otherwise hang in plugin init).
    env = subprocess_jax_env
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    cmd = [
        sys.executable, "-m", "spr_pick_tpu", "train", "start",
        "-a", "ssdn", "-n", "gauss", "--noise_value", "const",
        "-t", images_txt, "-l", coords_txt,
        "--alpha", "0.75", "--tau", "0.05",
        "--iterations", "8", "--train_batch_size", "4",
        "--eval_interval", "1000", "--print_interval", "8",
        "--checkpoint_interval", "8", "--runs_dir", runs_dir,
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    run_dirs = os.listdir(runs_dir)
    assert len(run_dirs) == 1
    run_dir = os.path.join(runs_dir, run_dirs[0])
    wt = [f for f in os.listdir(run_dir) if f.endswith(".wt")]
    assert wt, os.listdir(run_dir)

    # Eval through the CLI on the final weights.
    cmd = [
        sys.executable, "-m", "spr_pick_tpu", "eval",
        "-m", os.path.join(run_dir, wt[0]),
        "-d", images_txt, "-l", coords_txt,
        "--num", "1", "--runs_dir", runs_dir,
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    eval_dirs = [d for d in os.listdir(runs_dir) if "-eval-" in d]
    assert eval_dirs
    eval_imgs = os.path.join(runs_dir, eval_dirs[0], "eval_imgs")
    assert any(f.endswith("_scores.txt") for f in os.listdir(eval_imgs))
