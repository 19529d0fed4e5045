"""North-star behavioural test: joint training learns to score particle
sites above background on synthetic micrographs (SURVEY.md §4(c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.data.micrograph import DevicePatchPipeline, MicrographDataset
from spr_pick_tpu.data.sampler import StratifiedCoordinateSampler
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue, PipelineOutput
from spr_pick_tpu.steps import init_state, make_eval_step, make_train_step
from tests.test_e2e import make_synthetic_dataset


@pytest.mark.slow
def test_joint_training_learns_particles(tmp_path, rng):
    images_txt, coords_txt = make_synthetic_dataset(
        tmp_path, rng, n_images=2, size=384, n_particles=8
    )

    cfg = cfg_mod.base()
    cfg[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    cfg[ConfigValue.NOISE_STYLE] = "gauss"
    cfg[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg_mod.infer(cfg, model_only=True)

    dataset = MicrographDataset(
        images_txt, coords_txt, radius=3, train=True, crop=64, bb=24,
        verbose=False,
    )
    sampler = StratifiedCoordinateSampler(
        [g for g in dataset.targets], balance=0.25, size=10 ** 9,
        random=np.random.RandomState(1),
    )
    pipeline = DevicePatchPipeline(dataset, crop=64, augment=True)

    den = Denoiser(cfg, mode="joint")
    state = init_state(den, seed=0)
    step = make_train_step(den, alpha=0.5, tau=0.05)

    key = jax.random.PRNGKey(0)
    for i in range(400):
        batch = pipeline.batch(sampler.sample_batch(8))
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub, jnp.float32(5e-4))
    loss = float(np.mean(np.asarray(metrics["loss"])))
    assert np.isfinite(loss)

    # Dense eval on the first micrograph; compare scores at particle centres
    # vs random background points.
    eval_step = make_eval_step(den, dense=True)
    item = dataset.test_item(0, pad_multiple=32)
    outputs = eval_step(state, {"inp": jnp.asarray(item["inp"])}, key)
    hm = np.asarray(outputs[PipelineOutput.DETECT])[0, :, :, 0]

    coords = dataset.coords[0][0]
    particle_scores = np.array([hm[y, x] for x, y in coords])
    bg = np.random.RandomState(2)
    bg_scores = []
    mask = dataset.targets[0][0]
    while len(bg_scores) < 200:
        x, y = bg.randint(80, 300), bg.randint(80, 300)
        if mask[y, x] == 0:
            bg_scores.append(hm[y, x])
    bg_scores = np.asarray(bg_scores)

    # Detector must rank particle sites clearly above background.
    assert particle_scores.mean() > bg_scores.mean() + 0.1, (
        f"particles {particle_scores.mean():.3f} vs bg {bg_scores.mean():.3f}"
    )
