"""End-to-end reference checkpoint import: torch .training file -> converter
CLI -> our evaluator loads it and runs dense inference."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.reference_compat import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference or torch unavailable"
)


@pytest.mark.slow
def test_import_reference_training_file(tmp_path, rng):
    from tests.reference_compat import import_reference

    import_reference()
    import torch

    from spr_pick.models.joint_network_v2 import JointNetwork as RefJoint
    import spr_pick.cfg as ref_cfg_mod
    from spr_pick.params import ConfigValue as RefCV
    from spr_pick.params import NoiseAlgorithm as RefNA
    from spr_pick.params import NoiseValue as RefNV
    from spr_pick.params import StateValue as RefSV

    torch.manual_seed(0)
    ref_model = RefJoint(in_channels=1, out_channels=2, blindspot=True, detect=True)
    ref_cfg = ref_cfg_mod.base()
    ref_cfg[RefCV.ALGORITHM] = RefNA.SELFSUPERVISED_DENOISING
    ref_cfg[RefCV.NOISE_VALUE] = RefNV.UNKNOWN_CONSTANT
    ref_cfg[RefCV.NOISE_STYLE] = "gauss"

    denoiser_sd = {
        f"models.denoiser_model.{k}": v for k, v in ref_model.state_dict().items()
    }
    denoiser_sd["l_params.estimated_sigma"] = torch.zeros((1, 1, 1, 1))
    denoiser_sd["cfg"] = ref_cfg
    state = {
        "denoiser": denoiser_sd,
        "state": {RefSV.ITERATION: 1234},
        "optimizer": {},
        "rng": torch.get_rng_state(),
    }
    ref_path = str(tmp_path / "model_00001234.training")
    torch.save(state, ref_path)

    out_path = str(tmp_path / "converted.training")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tools", "import_reference_checkpoint.py"),
            ref_path, "-o", out_path, "--mode", "joint",
        ],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(out_path)

    # Load into the evaluator and run a dense step.
    import jax
    import jax.numpy as jnp

    from spr_pick_tpu.eval import DenoiserEvaluator
    from spr_pick_tpu.params import ConfigValue, PipelineOutput
    from spr_pick_tpu.steps import make_eval_step

    ev = DenoiserEvaluator(out_path, runs_dir=str(tmp_path / "runs"))
    assert ev.iteration == 1234
    assert ev.cfg[ConfigValue.ALGORITHM].value == "ssdn"
    step = make_eval_step(ev.denoiser, dense=True)
    out = step(
        ev.train_state,
        {"inp": jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32)},
        jax.random.PRNGKey(0),
    )
    assert out[PipelineOutput.DETECT].shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out[PipelineOutput.IMG_DENOISED])).all()
