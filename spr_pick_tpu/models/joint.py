"""Joint denoise + detect network.

Parity: `spr_pick/models/joint_network_v2.py:437-561` (JointNetwork,
Detector).  ``dense`` selects per-pixel detector output (the reference's
``fill()``); the param tree is identical in both modes so one set of weights
serves training (per-crop logit) and dense whole-micrograph inference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from spr_pick_tpu.models.resnet import LinearClassifier, ResNet8
from spr_pick_tpu.models.unet import BlindspotUNet


class Detector(nn.Module):
    """BatchNorm(1ch) -> LinearClassifier(ResNet8(bn=True)).

    Parity: joint_network_v2.py:543-561.

    Dense (per-pixel) mode has two numerically-equivalent implementations:

    * ``dense_impl="dilated"`` — the reference's fill(): dilated stride-1
      convs.  Simple, but dilated convs map poorly onto the MXU
      (~3 TFLOP/s measured on v5e).
    * ``dense_impl="stitch"`` — shift-and-stitch: run the ORIGINAL strided
      net on the stride^2 = 16 shifted copies of the padded input (folded
      onto the batch axis) and interleave the outputs (depth-to-space).
      Bit-identical outputs.  Measured on v5e at 1024^2 the dilated path is
      slightly faster (49 vs 63 ms) since XLA handles these dilations
      acceptably while stitch pays for materialising 16 shifted copies, so
      dilated is the default; stitch is kept as a tested fallback for
      backends with poor dilated-conv support.
    """

    dense: bool = False
    dtype: jnp.dtype = None
    dense_impl: str = "dilated"  # "dilated" | "stitch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="input_bn",
        )(x)

        use_stitch = (
            self.dense
            and self.dense_impl == "stitch"
            and x.shape[1] % 4 == 0
            and x.shape[2] % 4 == 0
        )
        features = ResNet8(
            bn=True,
            dense=self.dense and not use_stitch,
            dtype=self.dtype,
            name="features",
        )
        classifier = LinearClassifier(features, name="classifier")

        if not use_stitch:
            return classifier(x, train).astype(jnp.float32)

        # --- shift-and-stitch dense inference ---
        b, h, w, c = x.shape
        stride = 4
        width = features.width  # 63
        pad = width // 2  # 31
        # Strided-net input length so each shift yields exactly h/4 sites:
        # L = 4 * (h/4 - 1) + width = h + 59.
        l_h = h + width - stride
        l_w = w + width - stride
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        shifts = [
            xp[:, dy : dy + l_h, dx : dx + l_w, :]
            for dy in range(stride)
            for dx in range(stride)
        ]
        stacked = jnp.concatenate(shifts, axis=0)  # (16B, l_h, l_w, C)
        sub = classifier(stacked, train)  # (16B, h/4, w/4, 1)
        h4, w4 = h // stride, w // stride
        sub = sub.reshape(stride, stride, b, h4, w4)
        # out[b, 4i+dy, 4j+dx] = sub[dy, dx, b, i, j]
        out = sub.transpose(2, 3, 0, 4, 1).reshape(b, h, w, 1)
        return out.astype(jnp.float32)


class JointNetwork(nn.Module):
    """Blind-spot U-Net (mu | A) -> reparameterised sample -> detector.

    forward returns ``(out_stats, detect_logits)``:
      * out_stats: B,H,W,out_channels with [..., 0:in] = mu and the rest = A
        (sigma_x = A**2), parity joint_network_v2.py:469-475,509-532.
      * detect_logits: per-crop (train) or per-pixel (dense) detector logits.

    The reparameterisation noise uses the flax RNG stream ``"sample"``
    (explicit-key equivalent of ``torch.randn_like``, :473).
    """

    in_channels: int = 1
    out_channels: int = 2
    blindspot: bool = True
    dense: bool = False
    zero_output_weights: bool = False
    dtype: jnp.dtype = None

    @property
    def input_wh_mul(self) -> int:
        return 2 ** 5

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        out_stats = BlindspotUNet(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            blindspot=self.blindspot,
            levels=5,
            zero_output_weights=self.zero_output_weights,
            dtype=self.dtype,
            name="denoise_branch",
        )(x)

        mu_x = out_stats[..., 0 : self.in_channels]
        a_c = out_stats[..., self.in_channels : self.out_channels]
        # For multi-channel (triangular-A) outputs use the leading
        # in_channels of A for the per-channel sample scale; the reference's
        # reparameterize would shape-crash there (joint_network_v2.py:469-475
        # assumes out_channels = 2 * in_channels).
        sigma_x = a_c[..., 0 : self.in_channels] ** 2
        # Sampling happens in eval too (the reference always reparameterises,
        # joint_network_v2.py:469-475).
        epsilon = jax.random.normal(self.make_rng("sample"), mu_x.shape, mu_x.dtype)
        z = mu_x + epsilon * sigma_x

        detect = Detector(dense=self.dense, dtype=self.dtype, name="detector")(z, train)
        return out_stats, detect
