"""Algorithm-dependent input/reference preparation (the NoisyDataset role).

Parity: `spr_pick/datasets/noise_wrapper.py:98-168` (prepare_input):

  * input  = image (the reference DISABLES synthetic input noise at
    noise_wrapper.py:123 — cryo-EM data is already noisy; pass
    ``noise_input=True`` to enable it for clean benchmark datasets),
  * n2c    -> ref = clean image,
  * n2n    -> ref = image + synthetic noise (noise_style DSL),
  * n2v    -> input = UPS-manipulated image, ref = image + noise, mask map,
  * ssdn   -> no reference,
  * ssdn_u_only -> ref = input.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from spr_pick_tpu.data import n2v as n2v_mod
from spr_pick_tpu.data.noise import add_style
from spr_pick_tpu.params import NoiseAlgorithm


def prepare_batch(
    images: np.ndarray,
    algorithm: NoiseAlgorithm,
    noise_style: Optional[str],
    rng: np.random.RandomState,
    training: bool = True,
    noise_input: bool = False,
) -> Dict[str, np.ndarray]:
    """images: (B, H, W) float32 in [0,1].  Returns NHWC batch dict with
    'inp' and optionally 'ref'/'mask'/'noise_std'."""
    clean = np.asarray(images, np.float32)
    if noise_input and noise_style:
        noisy_in, coeff = add_style(clean, noise_style, rng=rng)
    else:
        noisy_in, coeff = clean, None

    batch: Dict[str, np.ndarray] = {}
    mask = None

    if algorithm == NoiseAlgorithm.NOISE_TO_VOID and training:
        manipulated = np.empty_like(noisy_in)
        mask = np.zeros_like(noisy_in)
        for b in range(noisy_in.shape[0]):
            manipulated[b], mask[b] = n2v_mod.manipulate(noisy_in[b], 5, rng=rng)
        noisy_in = manipulated

    if algorithm == NoiseAlgorithm.NOISE_TO_CLEAN:
        ref = clean
    elif algorithm in (NoiseAlgorithm.NOISE_TO_NOISE, NoiseAlgorithm.NOISE_TO_VOID):
        ref, _ = add_style(clean, noise_style, rng=rng)
    elif algorithm == NoiseAlgorithm.SELFSUPERVISED_DENOISING:
        ref = None
    elif algorithm == NoiseAlgorithm.SELFSUPERVISED_DENOISING_MEAN_ONLY:
        ref = noisy_in
    else:
        raise NotImplementedError("Denoising algorithm not supported")

    batch["inp"] = noisy_in[..., None]
    if ref is not None:
        batch["ref"] = ref[..., None]
    if mask is not None:
        batch["mask"] = mask[..., None]
    if coeff is not None:
        # Note: NOT an `isinstance(coeff, int)` guard — fixed poisson
        # styles ("poisson30") legitimately return a Python-int lam.
        coeff_arr = np.asarray(coeff, np.float32)
        if coeff_arr.ndim == 0:
            # Fixed-parameter styles (e.g. "gauss25") yield ONE scalar for
            # the whole batch; broadcast to the per-item layout the
            # sigma-consuming pipelines expect (same shape contract as
            # prepare_batch_jax, which always builds (B,1,1)).
            coeff_arr = np.full((clean.shape[0],), float(coeff_arr), np.float32)
        batch["noise_std"] = coeff_arr.reshape(clean.shape[0], 1, 1, 1)
    return batch


def prepare_batch_jax(
    crops,
    algorithm: NoiseAlgorithm,
    noise_style: Optional[str],
    key,
    training: bool = True,
    noise_input: bool = False,
):
    """Device-side :func:`prepare_batch`: same algorithm matrix, jax PRNG.

    ``crops``: (B, H, W) jnp array.  Traces inside jit (algorithm / style /
    flags are static), so the whole input/reference construction — noise
    synthesis and n2v UPS masking included — fuses into the train program
    instead of running per step in host numpy.  Used by
    DeviceDenoisePipeline and steps.make_denoise_scan.
    """
    import jax
    import jax.numpy as jnp

    from spr_pick_tpu.data.noise import add_style_jax

    k_in, k_ref, k_ups = jax.random.split(key, 3)
    clean = crops
    coeff = None
    if noise_input and noise_style:
        noisy_in, coeff = add_style_jax(clean, noise_style, k_in)
    else:
        noisy_in = clean

    batch = {}
    mask = None
    if algorithm == NoiseAlgorithm.NOISE_TO_VOID and training:
        noisy_in, mask = n2v_mod.manipulate_jax(noisy_in, k_ups, 5)

    if algorithm == NoiseAlgorithm.NOISE_TO_CLEAN:
        ref = clean
    elif algorithm in (NoiseAlgorithm.NOISE_TO_NOISE, NoiseAlgorithm.NOISE_TO_VOID):
        ref, _ = add_style_jax(clean, noise_style, k_ref)
    elif algorithm == NoiseAlgorithm.SELFSUPERVISED_DENOISING:
        ref = None
    elif algorithm == NoiseAlgorithm.SELFSUPERVISED_DENOISING_MEAN_ONLY:
        ref = noisy_in
    else:
        raise NotImplementedError("Denoising algorithm not supported")

    batch["inp"] = noisy_in[..., None]
    if ref is not None:
        batch["ref"] = ref[..., None]
    if mask is not None:
        batch["mask"] = mask[..., None]
    if coeff is not None:
        batch["noise_std"] = jnp.reshape(coeff, (clean.shape[0], 1, 1, 1))
    return batch
