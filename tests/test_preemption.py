"""Graceful preemption: SIGTERM/SIGINT -> snapshot and clean stop.

The reference has no signal handling at all (SURVEY.md §5: recovery is a
manual `train resume` from the last periodic snapshot, losing up to
SNAPSHOT_INTERVAL iterations).  Here the first signal makes the train loop
flush metrics, write a resumable `.training` snapshot and return cleanly —
TPU pods get preempted, and the snapshot-on-signal turns that from data
loss into a resume point.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

from spr_pick_tpu.train import DenoiserTrainer


def test_stop_handler_mechanics():
    """First signal sets the stop flag; a second SIGINT still kills;
    restore() reinstates the previous handlers."""
    trainer = DenoiserTrainer(cfg=None, mode="joint")
    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)

    restore = trainer._install_stop_handlers()
    try:
        assert trainer._stop_requested is False
        os.kill(os.getpid(), signal.SIGTERM)
        assert trainer._stop_requested is True

        # Repeated SIGTERM stays graceful (idempotent flag)...
        os.kill(os.getpid(), signal.SIGTERM)
        assert trainer._stop_requested is True

        # ...but a SIGINT after the stop request falls through to a
        # KeyboardInterrupt (impatient Ctrl-C Ctrl-C must still kill).
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGINT)
    finally:
        restore()

    assert signal.getsignal(signal.SIGTERM) is prev_term
    assert signal.getsignal(signal.SIGINT) is prev_int


def _wait_for(predicate, timeout, interval=1.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        value = predicate()
        if value:
            return value
        time.sleep(interval)
    return None


@pytest.mark.slow
def test_sigterm_snapshots_and_stops(tmp_path, rng, subprocess_jax_env):
    """CLI train run receives SIGTERM mid-training: exits 0, logs the
    graceful stop, leaves a resumable snapshot and NO final-*.wt."""
    from tests.test_e2e import make_synthetic_dataset

    images_txt, coords_txt = make_synthetic_dataset(tmp_path, rng, n_images=1)
    runs_dir = str(tmp_path / "runs")

    env = subprocess_jax_env
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    cmd = [
        sys.executable, "-m", "spr_pick_tpu", "train", "start",
        "-a", "ssdn", "-n", "gauss", "--noise_value", "const",
        "-t", images_txt, "-l", coords_txt,
        "--alpha", "0.75", "--tau", "0.05",
        "--iterations", "1000000",  # would run ~forever without the signal
        # Same intervals/batch as test_cli_e2e -> the K=2 scan program hits
        # the persistent XLA cache; a cold compile would defer SIGTERM
        # delivery (signals wait out C++ calls) past any sane test budget.
        "--train_batch_size", "4", "--eval_interval", "1000",
        "--print_interval", "8", "--checkpoint_interval", "8",
        "--runs_dir", runs_dir,
    ]
    proc = subprocess.Popen(
        cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        # The banner is logged AFTER the signal handlers are installed, so
        # once it appears a SIGTERM is guaranteed a graceful stop.
        def training_started():
            assert proc.poll() is None, (
                f"child died (rc={proc.returncode}) before the banner"
            )
            for sub in os.listdir(runs_dir) if os.path.isdir(runs_dir) else []:
                log = os.path.join(runs_dir, sub, "log.txt")
                if os.path.exists(log) and "TRAINING STARTED" in open(log).read():
                    return os.path.join(runs_dir, sub)
            return None

        run_dir = _wait_for(training_started, timeout=600)
        assert run_dir, "training never reached the banner"

        proc.send_signal(signal.SIGTERM)
        # Compile of the first train program may defer handler delivery;
        # allow generously in case the XLA cache is cold after all.
        rc = proc.wait(timeout=1500)
        assert rc == 0, f"child exited {rc}, not a graceful stop"
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()

    log_text = open(os.path.join(run_dir, "log.txt")).read()
    assert "TRAINING STOPPED" in log_text
    assert "TRAINING FINISHED" not in log_text

    snap_dir = os.path.join(run_dir, "training_jt")
    snaps = [f for f in os.listdir(snap_dir) if f.endswith(".training")]
    assert snaps, "no resumable snapshot written on SIGTERM"
    # final-*.wt means the run COMPLETED; it must not exist here.
    assert not [f for f in os.listdir(run_dir) if f.endswith(".wt")]


def test_stop_handlers_restored_on_exception(tmp_path, rng, monkeypatch):
    """train() must restore process-wide signal handlers even when the loop
    raises (the try/finally path) — otherwise the next Ctrl-C in the
    process is swallowed by a handler bound to a dead trainer."""
    import spr_pick_tpu.train as train_mod
    from spr_pick_tpu.data import mrc
    from tests.test_e2e import make_synthetic_dataset

    images_txt, coords_txt = make_synthetic_dataset(tmp_path, rng, n_images=1)

    from spr_pick_tpu import cfg as cfg_mod
    from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue

    cfg = cfg_mod.base()
    cfg[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    cfg[ConfigValue.NOISE_STYLE] = "gauss"
    cfg[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg[ConfigValue.ITERATIONS] = 8
    trainer = train_mod.DenoiserTrainer(
        cfg, mode="joint", alpha=0.75, tau=0.05,
        runs_dir=str(tmp_path / "runs"),
    )
    trainer.set_train_data(images_txt)
    trainer.set_train_label(coords_txt)

    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)

    # Raise AFTER the handlers are installed (first thing inside the try is
    # the banner, then the step builders).
    def boom(*a, **k):
        raise RuntimeError("synthetic failure inside the train loop")

    monkeypatch.setattr(train_mod, "make_train_step", boom)
    with pytest.raises(RuntimeError, match="synthetic failure"):
        trainer.train()

    assert signal.getsignal(signal.SIGTERM) is prev_term
    assert signal.getsignal(signal.SIGINT) is prev_int
