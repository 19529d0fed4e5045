"""bf16 pick parity at production scale (VERDICT r3 item 6).

cfg.py ships COMPUTE_DTYPE="bf16" as the global default; the parity claims
must hold in the shipped dtype.  This drives the dense joint route on a
1024^2 synthetic micrograph with partially-TRAINED weights (structured
heatmap, not flat sigmoid) in bf16 vs f32 and asserts the exported pick
sets match.

Decision recorded here (pre-approved by the verdict's own "score-margin
tolerance" option): picks whose f32 score lies within MARGIN of the star
threshold (0.13) are excluded from the strict set comparison — bf16's
~7e-3 heatmap drift can legitimately flip a pick that sits exactly on the
cut, which is a thresholding artifact, not a correctness issue.  Everything
else must match one-to-one (F1 == 1.0) within a small coordinate jitter
bound (a drifted heatmap may move a peak by a pixel).
"""

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

STAR_THRESHOLD = 0.13
MARGIN = 0.02
COORD_TOL = 3  # px of allowed peak jitter under dtype drift


def _cfg(dtype):
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    c[ConfigValue.COMPUTE_DTYPE] = dtype
    cfg_mod.infer(c, model_only=True)
    return c


def _picks(hm, radius, border=30):
    """NMS + border filter + star threshold: the full export filter chain
    (train.py write_scores + convert_to_star)."""
    from spr_pick_tpu.ops.nms import nms_to_host

    scores, coords = nms_to_host(hm, radius, threshold=0.02, max_peaks=2048)
    h, w = hm.shape
    keep = (
        (coords[:, 1] > border) & (coords[:, 1] < h - border)
        & (coords[:, 0] > border) & (coords[:, 0] < w - border)
    )
    return scores[keep], coords[keep]


def _match_sets(coords_a, coords_b, tol):
    """Greedy nearest matching within tol px; returns number matched."""
    if len(coords_a) == 0 or len(coords_b) == 0:
        return 0
    used = np.zeros(len(coords_b), bool)
    matched = 0
    for ca in coords_a:
        d = np.abs(coords_b - ca).max(axis=1)
        d[used] = tol + 1
        j = int(np.argmin(d))
        if d[j] <= tol:
            used[j] = True
            matched += 1
    return matched


@pytest.mark.slow
def test_bf16_dense_picks_match_f32_at_1024(tmp_path, rng):
    images_txt, coords_txt = make_synthetic_dataset(
        tmp_path, rng, n_images=2, size=384, n_particles=8
    )
    dataset = MicrographDataset(
        images_txt, coords_txt, radius=3, train=True, crop=64, bb=24,
        verbose=False,
    )
    sampler = StratifiedCoordinateSampler(
        [g for g in dataset.targets], balance=0.25, size=10 ** 9,
        random=np.random.RandomState(1),
    )
    pipeline = DevicePatchPipeline(dataset, crop=64, augment=True)

    # Train briefly in the shipped bf16 default so the heatmap has real
    # structure (scores spanning the 0.13 cut), then evaluate the SAME
    # weights through a bf16 and an f32 dense build.
    cfg_bf = _cfg("bf16")
    den_bf = Denoiser(cfg_bf, mode="joint")
    state = init_state(den_bf, seed=0)
    step = make_train_step(den_bf, alpha=0.5, tau=0.05)
    key = jax.random.PRNGKey(0)
    for _ in range(300):
        batch = pipeline.batch(sampler.sample_batch(8))
        key, sub = jax.random.split(key)
        state, _ = step(state, batch, sub, jnp.float32(5e-4))

    den_f32 = Denoiser(_cfg("f32"), mode="joint")

    # 1024^2 synthetic micrograph with planted particles (fresh draw).
    big_rng = np.random.RandomState(99)
    (tmp_path / "big").mkdir(exist_ok=True)
    big_txt, _ = make_synthetic_dataset(
        tmp_path / "big", big_rng, n_images=1, size=1024, n_particles=40
    )
    big = MicrographDataset(
        big_txt, None, radius=3, train=False, bb=24, verbose=False
    )
    item = big.test_item(0, pad_multiple=32)
    inp = jnp.asarray(item["inp"])
    shape = item["image_shape"]
    eval_key = jax.random.PRNGKey(7)

    hms = {}
    for label, den in (("bf16", den_bf), ("f32", den_f32)):
        eval_step = make_eval_step(den, dense=True)
        outputs = eval_step(state, {"inp": inp}, eval_key)
        hms[label] = np.asarray(
            outputs[PipelineOutput.DETECT], np.float32
        )[0, : shape[0], : shape[1], 0]

    drift = float(np.abs(hms["bf16"] - hms["f32"]).max())
    radius = int(cfg_bf[ConfigValue.NMS])
    sb, cb = _picks(hms["bf16"], radius)
    sf, cf = _picks(hms["f32"], radius)

    # Star-threshold sets, excluding the +-MARGIN band around the cut
    # (recorded decision, see module docstring).
    strong_b = cb[sb >= STAR_THRESHOLD + MARGIN]
    strong_f = cf[sf >= STAR_THRESHOLD + MARGIN]
    loose_b = cb[sb >= STAR_THRESHOLD - MARGIN]
    loose_f = cf[sf >= STAR_THRESHOLD - MARGIN]

    # Every confident pick in either dtype must appear in the other's
    # loose set: F1 == 1.0 outside the margin band.
    m_b = _match_sets(strong_b, loose_f, COORD_TOL)
    m_f = _match_sets(strong_f, loose_b, COORD_TOL)
    assert m_b == len(strong_b) and m_f == len(strong_f), (
        f"bf16/f32 star-threshold pick sets diverge beyond the margin "
        f"band: {m_b}/{len(strong_b)} and {m_f}/{len(strong_f)} matched "
        f"(heatmap drift {drift:.2e})"
    )
    # The run must actually exercise the cut: some confident picks exist.
    assert len(strong_f) > 0, "no picks above the star threshold; test inert"
