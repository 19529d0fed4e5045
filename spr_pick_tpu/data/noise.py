"""Synthetic noise DSL: 'gauss{SD}[_{MAX}][_nc]', 'poisson{LAM}[_{MAX}][_nc]'.

Parity: `spr_pick/utils/noise.py:14-154`.  Integer parameters are divided by
255 (gauss), ranges draw a per-item parameter from U(min, max), and `_nc`
disables clipping to [0, 1].  Implemented over numpy RandomState (host data
plane) — the training hot path never adds noise (the reference disables the
input-noise line, noise_wrapper.py:123); this is used to build n2n/n2v
references and test fixtures.
"""

from __future__ import annotations

import re
from typing import Tuple, Union

import numpy as np


def _parse_style(style: str):
    noise_type = re.findall(r"[a-zA-Z]+", style)[0]
    params = [p for p in style.replace(noise_type, "").split("_")]
    clip = "nc" not in params
    params = [x for x in params if x != "nc" and x != ""]
    floats = any("." in x for x in params)
    params = [float(p) if floats else int(p) for p in params]
    return noise_type, params, clip


def add_gaussian(images: np.ndarray, std_dev, mean=0.0, clip=True,
                 rng: np.random.RandomState = None):
    """Add Gaussian noise.  std_dev int -> /255; tuple -> per-item uniform."""
    rng = rng or np.random
    images = np.array(images, dtype=np.float32, copy=True)
    if isinstance(std_dev, (list, tuple)):
        if len(std_dev) == 1:
            std_dev = std_dev[0]
        else:
            lo, hi = std_dev
            if isinstance(lo, int):
                lo /= 255
            if isinstance(hi, int):
                hi /= 255
            shape = (images.shape[0],) + (1,) * (images.ndim - 1)
            std_dev = rng.uniform(lo, hi, size=shape).astype(np.float32)
    if isinstance(std_dev, int):
        std_dev = std_dev / 255
    images += rng.randn(*images.shape).astype(np.float32) * std_dev + mean
    if clip:
        np.clip(images, 0.0, 1.0, out=images)
    return images, std_dev


def add_poisson(images: np.ndarray, lam, clip=True,
                rng: np.random.RandomState = None):
    rng = rng or np.random
    images = np.array(images, dtype=np.float32, copy=True)
    if isinstance(lam, (list, tuple)):
        if len(lam) == 1:
            lam = lam[0]
        else:
            lo, hi = lam
            shape = (images.shape[0],) + (1,) * (images.ndim - 1)
            lam = rng.uniform(lo, hi, size=shape).astype(np.float32)
    images *= lam
    # Note: the reference samples Poisson(1) noise and ADDS it
    # (utils/noise.py:102-106) rather than sampling Poisson(x*lam); behaviour
    # preserved.
    noise = rng.poisson(1.0, size=images.shape).astype(np.float32)
    images += noise
    images /= lam
    if clip:
        np.clip(images, 0.0, 1.0, out=images)
    return images, lam


def add_style(images: np.ndarray, style: str, rng: np.random.RandomState = None):
    noise_type, params, clip = _parse_style(style)
    if noise_type == "gauss":
        return add_gaussian(images, params, clip=clip, rng=rng)
    elif noise_type == "poisson":
        return add_poisson(images, params, clip=clip, rng=rng)
    raise NotImplementedError("Noise type not supported")


def add_style_jax(images, style: str, key):
    """Device-side `add_style`: same DSL, same distributions, jax PRNG.

    ``images``: (B, H, W) jnp array.  Returns (noisy, coeff) where coeff is
    a (B, 1, 1) per-item parameter array (std dev for gauss, lam for
    poisson).  Used by the HBM-resident denoise data plane
    (DeviceDenoisePipeline) so n2n/n2v reference construction and input
    noising run inside the jitted train program instead of per-step host
    numpy.  Bit-parity with the numpy path is impossible (different PRNG);
    the distributions are identical by construction.
    """
    import jax
    import jax.numpy as jnp

    noise_type, params, clip = _parse_style(style)
    b = images.shape[0]
    pshape = (b,) + (1,) * (images.ndim - 1)
    k_param, k_noise = jax.random.split(key)

    def param_array(raw):
        vals = [v / 255 if isinstance(v, int) and noise_type == "gauss" else v
                for v in raw]
        if len(vals) == 1:
            return jnp.full(pshape, vals[0], jnp.float32)
        lo, hi = vals
        return jax.random.uniform(
            k_param, pshape, jnp.float32, minval=lo, maxval=hi
        )

    if noise_type == "gauss":
        std = param_array(params)
        out = images + jax.random.normal(k_noise, images.shape, jnp.float32) * std
        coeff = std
    elif noise_type == "poisson":
        lam = param_array(params)
        # Reference semantics preserved (utils/noise.py:102-106): scale,
        # ADD Poisson(1) noise, unscale — not Poisson(x*lam) sampling.
        noise = jax.random.poisson(k_noise, 1.0, images.shape).astype(jnp.float32)
        out = (images * lam + noise) / lam
        coeff = lam
    else:
        raise NotImplementedError("Noise type not supported")
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out, coeff
