"""Pick-for-pick parity oracle vs the PyTorch reference (the BASELINE.json
north star).

One set of weights, two full eval stacks:

* reference: `JointNetwork.fill()` dense forward (train.py:383-414) +
  clamped sigmoid + greedy `non_maximum_suppression`
  (utils/algorithms.py:59-103) + the 30 px border filter
  (train.py:557-571);
* ours: the same weights imported through
  tools/import_reference_checkpoint.py, `DenoiserEvaluator` dense
  inference + `nms_to_host` + the same border filter.

The reparameterisation z = mu + eps * sigma_x uses framework-native RNG
streams, so the A head is zeroed (sigma_x == 0 -> z == mu deterministic)
— bitwise RNG parity is impossible across frameworks (SURVEY.md §7.3);
everything else (normalisation, blind-spot geometry, dense fill plan,
sigmoid clamp, NMS order, border filter) is exercised end to end.
Pick sets must match at F1 == 1.0 under `match_coordinates`.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.reference_compat import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference or torch unavailable"
)

SIZE = 256  # multiple of 32: no eval padding differences in play
NMS_RADIUS = 15
THRESHOLD = 0.02
BORDER = 30


def _plant_particles(rng, size, n=8):
    img = rng.randn(size, size).astype(np.float32) * 0.3
    yy, xx = np.mgrid[-10:11, -10:11]
    blob = np.exp(-(xx ** 2 + yy ** 2) / (2 * 3.5 ** 2)).astype(np.float32)
    for _ in range(n):
        x = rng.randint(40, size - 40)
        y = rng.randint(40, size - 40)
        img[y - 10 : y + 11, x - 10 : x + 11] += blob * 2.5
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo)


@pytest.mark.slow
def test_pick_parity_reference_vs_tpu(tmp_path, rng):
    from tests.reference_compat import import_reference

    import_reference()
    import torch

    from spr_pick.models.joint_network_v2 import JointNetwork as RefJoint
    from spr_pick.utils.algorithms import non_maximum_suppression as ref_nms
    import spr_pick.cfg as ref_cfg_mod
    from spr_pick.params import ConfigValue as RefCV
    from spr_pick.params import NoiseAlgorithm as RefNA
    from spr_pick.params import NoiseValue as RefNV
    from spr_pick.params import StateValue as RefSV

    torch.manual_seed(0)
    ref_model = RefJoint(
        in_channels=1, out_channels=2, blindspot=True, detect=True
    )
    # Zero the A (sigma) component of the output head so z == mu exactly:
    # out_conv emits [mu | A]; kill channel 1.
    with torch.no_grad():
        out_conv = ref_model.denoise_branch.output_conv
        out_conv.weight[1].zero_()
        out_conv.bias[1].zero_()
    ref_model.eval()

    img = _plant_particles(rng, SIZE)
    x_t = torch.from_numpy(img)[None, None]

    # ---- reference eval stack ----
    ref_model.fill()
    with torch.no_grad():
        _, hm_logits = ref_model(x_t)
        hm_ref = torch.clamp(
            torch.sigmoid(hm_logits), min=1e-4, max=1 - 1e-4
        )[0, 0].numpy()
    ref_scores, ref_coords = ref_nms(
        hm_ref, NMS_RADIUS, set(), threshold=THRESHOLD
    )
    ref_picks = {
        (int(c[0]), int(c[1]))
        for c in ref_coords
        if BORDER < c[1] < SIZE - BORDER and BORDER < c[0] < SIZE - BORDER
    }
    assert ref_picks, "reference produced no picks - test setup broken"

    # ---- export the weights as a reference .training file ----
    ref_model.unfill()
    ref_cfg = ref_cfg_mod.base()
    ref_cfg[RefCV.ALGORITHM] = RefNA.SELFSUPERVISED_DENOISING
    ref_cfg[RefCV.NOISE_VALUE] = RefNV.UNKNOWN_CONSTANT
    ref_cfg[RefCV.NOISE_STYLE] = "gauss"
    denoiser_sd = {
        f"models.denoiser_model.{k}": v
        for k, v in ref_model.state_dict().items()
    }
    denoiser_sd["l_params.estimated_sigma"] = torch.zeros((1, 1, 1, 1))
    denoiser_sd["cfg"] = ref_cfg
    state = {
        "denoiser": denoiser_sd,
        "state": {RefSV.ITERATION: 1},
        "optimizer": {},
        "rng": torch.get_rng_state(),
    }
    ref_path = str(tmp_path / "model_00000001.training")
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

    # ---- our eval stack on the imported weights ----
    import jax
    import jax.numpy as jnp

    from spr_pick_tpu.eval import DenoiserEvaluator
    from spr_pick_tpu.ops.algorithms import match_coordinates
    from spr_pick_tpu.ops.nms import nms_to_host
    from spr_pick_tpu.params import ConfigValue, PipelineOutput
    from spr_pick_tpu.steps import make_eval_step

    ev = DenoiserEvaluator(out_path, runs_dir=str(tmp_path / "runs"))
    ev.cfg[ConfigValue.COMPUTE_DTYPE] = "f32"
    ev.denoiser.compute_dtype = None
    step = make_eval_step(ev.denoiser, dense=True)
    with jax.default_matmul_precision("highest"):
        outputs = step(
            ev.train_state,
            {"inp": jnp.asarray(img[None, :, :, None])},
            jax.random.PRNGKey(0),
        )
    hm_ours = np.asarray(outputs[PipelineOutput.DETECT])[0, :, :, 0]

    # Heatmaps agree closely before NMS (same weights, same math).
    assert np.max(np.abs(hm_ours - hm_ref)) < 5e-3

    scores, coords = nms_to_host(
        hm_ours, NMS_RADIUS, threshold=THRESHOLD, max_peaks=4096
    )
    our_picks = {
        (int(c[0]), int(c[1]))
        for c in coords
        if BORDER < c[1] < SIZE - BORDER and BORDER < c[0] < SIZE - BORDER
    }

    ours_arr = np.asarray(sorted(our_picks), np.float64)
    ref_arr = np.asarray(sorted(ref_picks), np.float64)
    assignment, _ = match_coordinates(ref_arr, ours_arr, radius=2)
    tp = float(np.sum(assignment))
    precision = tp / max(len(ours_arr), 1)
    recall = tp / max(len(ref_arr), 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    assert f1 == pytest.approx(1.0), (
        f"pick parity broken: P={precision:.3f} R={recall:.3f} "
        f"ours={len(our_picks)} ref={len(ref_picks)}"
    )
