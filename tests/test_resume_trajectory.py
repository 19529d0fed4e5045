"""Exact preemption-resume determinism, end to end.

The `.training` format checkpoints the FULL stochastic state (params,
optimizer, trainer RNG key, sampler master RNG + history debt, augment
RNGs — utils/checkpoint.py:save_training), so a run killed at a snapshot
and resumed must reproduce the uninterrupted run's trajectory EXACTLY,
not just approximately.  The reference cannot make this guarantee (it
deliberately skips optimizer + sampler state, train.py:975-1000); here it
is a hard invariant: final weights bit-equal.

Complements tests/test_sampler.py (resumed sampler draws identical
batches) and tests/test_preemption.py (SIGTERM snapshots cleanly) by
closing the loop at the weight level.
"""

import os
import shutil

import numpy as np
import pytest

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue
from spr_pick_tpu.utils import checkpoint

from tests.test_e2e import make_synthetic_dataset


def _leaf_items(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _leaf_items(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


@pytest.mark.slow
def test_resume_trajectory_matches_uninterrupted(tmp_path, rng):
    from spr_pick_tpu.train import DenoiserTrainer, resume_run

    images_txt, coords_txt = make_synthetic_dataset(
        tmp_path, rng, n_images=2, size=256, n_particles=4
    )

    cfg = cfg_mod.base()
    cfg[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    cfg[ConfigValue.NOISE_STYLE] = "gauss"
    cfg[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg[ConfigValue.ITERATIONS] = 32
    cfg[ConfigValue.TRAIN_MINIBATCH_SIZE] = 2
    cfg[ConfigValue.EVAL_INTERVAL] = 10_000  # no eval pass
    cfg[ConfigValue.PRINT_INTERVAL] = 16
    cfg[ConfigValue.SNAPSHOT_INTERVAL] = 16

    trainer = DenoiserTrainer(
        cfg, mode="joint", alpha=0.75, tau=0.05,
        runs_dir=str(tmp_path / "runsA"),
    )
    trainer.set_train_data(images_txt)
    trainer.set_train_label(coords_txt)
    trainer.train()

    run_a = trainer.run_dir_path
    snaps = sorted(os.listdir(os.path.join(run_a, "training_jt")))
    assert "model_00000016.training" in snaps

    final_a = [f for f in os.listdir(run_a) if f.endswith(".wt")]
    assert final_a
    wt_a = checkpoint.load(os.path.join(run_a, final_a[0]))

    # "Kill" at iteration 16: copy the run dir and resume from the mid-run
    # snapshot (everything after it in the copy is stale and gets
    # overwritten by the resumed run, exactly like a real preemption).
    run_b = str(tmp_path / "runsB" / os.path.basename(run_a))
    os.makedirs(os.path.dirname(run_b), exist_ok=True)
    shutil.copytree(run_a, run_b)

    trainer2 = resume_run(run_b, iteration=16)
    assert trainer2.iteration == 16
    trainer2.train()

    final_b = [f for f in os.listdir(run_b) if f.endswith(".wt")]
    wt_b = checkpoint.load(os.path.join(run_b, final_b[0]))

    a = dict(_leaf_items(wt_a["trainable"]))
    b = dict(_leaf_items(wt_b["trainable"]))
    assert a.keys() == b.keys()
    for name in a:
        np.testing.assert_array_equal(
            a[name], b[name],
            err_msg=f"resumed weights diverge from uninterrupted at {name}",
        )
