"""The pipeline engine: functional re-design of the reference `Denoiser`.

Parity: `spr_pick/denoiser_v2.py` (the active v2 engine).  Instead of an
`nn.Module` that mutates itself (`fill()/unfill()`, `.train()/.eval()`), this
engine owns

  * a *model spec* (flax modules built twice: crop mode and dense mode,
    sharing one parameter tree), and
  * pure, jit-compiled pipeline functions
    ``loss(trainable, batch_stats, batch, rng) -> (loss, aux)`` per
    algorithm/mode, dispatched exactly like ``run_pipeline``
    (denoiser_v2.py:196-207).

Reference quirks deliberately fixed (SURVEY.md §7.4): the `known` noise
branch reads the noise s.d. from the batch instead of an undefined variable
(denoiser_v2.py:406-409); the MSE pipelines run on a single-head U-Net so
n2c/n2n/n2v actually work in this framework.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DTYPES = {"bf16": jnp.bfloat16, "f32": None, None: None}

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu import losses
from spr_pick_tpu.models import BlindspotUNet, JointNetwork
from spr_pick_tpu.params import (
    ConfigValue,
    NoiseValue,
    Pipeline,
    PipelineOutput,
)

MODEL = "denoiser_model"
SIGMA_ESTIMATOR = "sigma_estimation_model"
ESTIMATED_SIGMA = "estimated_sigma"


def _num_output_components(channels: int, diagonal: bool) -> int:
    # Means + triangular A (denoiser_v2.py:70-77).
    if diagonal:
        return channels * 2
    return channels + (channels * (channels + 1)) // 2


@dataclasses.dataclass
class Denoiser:
    """Holds configuration, model specs and variables; provides pure loss
    functions for train/eval over any of the five algorithms."""

    cfg: Dict
    mode: str  # "joint" | "denoise"
    # Route dense (whole-micrograph) inference through the optimised XLA
    # dense forward (ops/dense_unet.py) when preconditions hold.
    fused_dense: bool = True
    # Run the flip-TTA consistency forward FOLDED into the primary forward
    # as one 2B batch (one program region instead of two sequential ones).
    # Semantics vs the reference's two sequential forwards
    # (denoiser_v2.py:295-322): identical math everywhere except the
    # detector's BatchNorm, which normalises over the 2B fold (primary +
    # flipped samples) instead of each forward's own B — a different but
    # equally-valid batch-statistics estimate (the flipped copies have
    # identical per-channel spatial statistics; only the reparameterisation
    # draws differ), and ONE running-stats update per step instead of two.
    #
    # None (the default) resolves from the configured train batch size:
    # the fold measures faster at batch 4/64/256 (+5-18%) but reproducibly
    # ~10% SLOWER at exactly batch 16 — the reference's own default — where
    # XLA picks a worse conv schedule for the 128-lane rot4 fold
    # (docs/PERF.md round 5).  SPR_FOLD_TTA=0/1 overrides either way.
    fold_tta: Optional[bool] = None

    def __post_init__(self):
        import os as _os

        env_fold = _os.environ.get("SPR_FOLD_TTA")
        if env_fold in ("0", "1"):
            self.fold_tta = env_fold == "1"
        elif self.fold_tta is None:
            self.fold_tta = self.cfg.get(ConfigValue.TRAIN_MINIBATCH_SIZE) != 16
        c = self.cfg
        cfg_mod.infer(c, model_only=True)
        in_ch = c[ConfigValue.IMAGE_CHANNELS]
        pipeline = c[ConfigValue.PIPELINE]
        blindspot = c[ConfigValue.BLINDSPOT]
        diagonal = c[ConfigValue.DIAGONAL_COVARIANCE]

        self.in_channels = in_ch
        self.pipeline = pipeline
        self.blindspot = blindspot
        self.noise_value: Optional[NoiseValue] = c.get(ConfigValue.NOISE_VALUE)
        self.noise_style: Optional[str] = c.get(ConfigValue.NOISE_STYLE)

        if pipeline == Pipeline.SSDN:
            out_ch = _num_output_components(in_ch, diagonal)
        else:
            out_ch = in_ch
        self.out_channels = out_ch
        dtype = _DTYPES.get(c.get(ConfigValue.COMPUTE_DTYPE, None), None)
        self.compute_dtype = dtype

        if self.mode == "joint" or pipeline == Pipeline.SSDN:
            # Reference always builds JointNetwork (denoiser_v2.py:99-107).
            self.model = JointNetwork(
                in_channels=in_ch,
                out_channels=out_ch,
                blindspot=blindspot,
                dense=False,
                dtype=dtype,
            )
            self.model_dense = JointNetwork(
                in_channels=in_ch,
                out_channels=out_ch,
                blindspot=blindspot,
                dense=True,
                dtype=dtype,
            )
        else:
            # Single-head U-Net for MSE / n2v pipelines.
            self.model = BlindspotUNet(
                in_channels=in_ch, out_channels=out_ch, blindspot=blindspot,
                dtype=dtype,
            )
            self.model_dense = self.model

        self.sigma_model = None
        if (
            pipeline == Pipeline.SSDN
            and self.noise_value == NoiseValue.UNKNOWN_VARIABLE
        ):
            # DualNetworkShallow sigma estimator (denoiser_v2.py:129-137).
            self.sigma_model = BlindspotUNet(
                in_channels=in_ch, out_channels=1, blindspot=False, levels=3,
                dtype=dtype,
            )

    # ------------------------------------------------------------------
    # Initialisation
    # ------------------------------------------------------------------

    @property
    def has_joint_model(self) -> bool:
        return isinstance(self.model, JointNetwork)

    def init_variables(self, seed: int = 0, patch: int = 64) -> Dict[str, Any]:
        """Initialise all model variables.  Returns
        {'model': {'params', 'batch_stats'?}, 'sigma': {...}?,
         'l_params': {'estimated_sigma'}?}
        """
        key = jax.random.PRNGKey(seed)
        k_model, k_sample, k_sigma = jax.random.split(key, 3)
        x = jnp.zeros((1, patch, patch, self.in_channels), jnp.float32)
        variables: Dict[str, Any] = {}
        if self.has_joint_model:
            variables["model"] = dict(
                self.model.init({"params": k_model, "sample": k_sample}, x, True)
            )
        else:
            variables["model"] = dict(self.model.init({"params": k_model}, x))
        if self.sigma_model is not None:
            variables["sigma"] = dict(self.sigma_model.init({"params": k_sigma}, x))
        if (
            self.pipeline == Pipeline.SSDN
            and self.noise_value == NoiseValue.UNKNOWN_CONSTANT
        ):
            # Learnable scalar sigma (denoiser_v2.py:158-164).
            variables["l_params"] = {
                ESTIMATED_SIGMA: jnp.zeros((1, 1, 1, 1), jnp.float32)
            }
        return variables

    @staticmethod
    def split_trainable(variables: Dict) -> Tuple[Dict, Dict]:
        """Split variables into (trainable, non-trainable/batch_stats)."""
        trainable = {}
        static = {}
        for name in ("model", "sigma"):
            if name in variables:
                trainable[name] = variables[name]["params"]
                if "batch_stats" in variables[name]:
                    static[name] = variables[name]["batch_stats"]
        if "l_params" in variables:
            trainable["l_params"] = variables["l_params"]
        return trainable, static

    @staticmethod
    def merge_variables(trainable: Dict, static: Dict) -> Dict:
        variables: Dict[str, Any] = {}
        for name in ("model", "sigma"):
            if name in trainable:
                variables[name] = {"params": trainable[name]}
                if name in static:
                    variables[name]["batch_stats"] = static[name]
        if "l_params" in trainable:
            variables["l_params"] = trainable["l_params"]
        return variables

    # ------------------------------------------------------------------
    # Forward helpers
    # ------------------------------------------------------------------

    @property
    def supports_rect_dense(self) -> bool:
        """Whether dense eval handles RECTANGULAR micrographs natively
        (two-lane rotation fold in dense_blindspot_unet) so the data layer
        can skip the square-padding tax.  Non-blindspot models are always
        rect-safe; blindspot models need the fused dense route."""
        if not self.blindspot:
            return True
        return self.fused_dense and self.has_joint_model and self.in_channels == 1

    def _can_fuse_dense(self, inp) -> bool:
        """Optimised dense path preconditions: blind-spot joint model,
        single input channel, H and W on the 32-px pad grid (square inputs
        take the rot4 fold, rectangular ones the two-lane fold).  The
        default path is pure XLA (SPMD-partitionable; the opt-in Pallas
        kernels are the only thing that would not shard)."""
        return (
            self.fused_dense
            and self.has_joint_model
            and self.blindspot
            and self.in_channels == 1
            and inp.ndim == 4
            and inp.shape[1] % 32 == 0
            and inp.shape[2] % 32 == 0
        )

    def _apply_model_fused(self, model_vars, inp, rng):
        """Dense inference through the optimised XLA U-Net forward.

        Numerically equivalent to ``model_dense.apply`` (tested to f32
        exactness in tests/test_dense_unet.py); the reparameterisation
        noise uses the raw ``rng`` key rather than flax's path-derived
        stream — a different but identically-distributed sample (the
        reference's torch stream differs from both; SURVEY.md §7.3 RNG
        semantics)."""
        from spr_pick_tpu.models.joint import Detector
        from spr_pick_tpu.ops.dense_unet import dense_blindspot_unet

        p = model_vars["params"]
        cdtype = self.compute_dtype or jnp.float32
        out_stats = dense_blindspot_unet(
            p["denoise_branch"], inp, out_channels=self.out_channels,
            cdtype=cdtype,
        )
        mu_x = out_stats[..., 0 : self.in_channels]
        a_c = out_stats[..., self.in_channels : self.out_channels]
        sigma_x = a_c[..., 0 : self.in_channels] ** 2
        epsilon = jax.random.normal(rng, mu_x.shape, mu_x.dtype)
        z = mu_x + epsilon * sigma_x

        det = Detector(dense=True, dtype=self.compute_dtype)
        col = {"params": p["detector"]}
        if "batch_stats" in model_vars:
            col["batch_stats"] = model_vars["batch_stats"]["detector"]
        detect = det.apply(col, z, False)
        return (out_stats, detect), None

    def _apply_model(self, model_vars, inp, rng, train: bool, dense: bool):
        """Apply the main model.  Returns ((net_out, hm_logits), bn_updates)."""
        if dense and not train and self._can_fuse_dense(inp):
            return self._apply_model_fused(model_vars, inp, rng)
        model = self.model_dense if dense else self.model
        col = {"params": model_vars["params"]}
        if "batch_stats" in model_vars:
            col["batch_stats"] = model_vars["batch_stats"]
        if self.has_joint_model:
            if train:
                out, updates = model.apply(
                    col, inp, True, rngs={"sample": rng}, mutable=["batch_stats"]
                )
                return out, updates.get("batch_stats")
            out = model.apply(col, inp, False, rngs={"sample": rng})
            return out, None
        else:
            out = model.apply(col, inp)
            return (out, None), None

    def _noise_estimate(self, variables, noisy_in):
        """Raw noise estimate before softplus remap (const or var)."""
        if self.noise_value == NoiseValue.UNKNOWN_CONSTANT:
            return variables["l_params"][ESTIMATED_SIGMA]
        elif self.noise_value == NoiseValue.UNKNOWN_VARIABLE:
            col = {"params": variables["sigma"]["params"]}
            est = self.sigma_model.apply(col, noisy_in)
            # Per-image scalar: mean over H, W (denoiser_v2.py:390).
            return jnp.mean(est, axis=(1, 2), keepdims=True)
        return None

    def _noise_std(self, variables, noisy_in, mu_x, batch):
        """Distill the noise s.d. per style/params.

        Parity: denoiser_v2.py:379-424 (with the `known` branch fixed to read
        batch['noise_std'] — the reference references an undefined variable
        there, SURVEY.md §7.4).
        """
        style = self.noise_style or "gauss"
        if self.noise_value == NoiseValue.KNOWN:
            params_in = batch.get("noise_std")
            if params_in is None:
                raise ValueError(
                    "noise_value=known requires batch['noise_std'] (N111)"
                )
            if style.startswith("gauss"):
                return jnp.maximum(params_in, 1e-3)
            elif style.startswith("poisson"):
                return (jnp.maximum(mu_x, 1e-3) / params_in) ** 0.5
        est = losses.softplus_noise_remap(self._noise_estimate(variables, noisy_in))
        if style.startswith("poisson"):
            return (jnp.maximum(mu_x, 1e-3) * est) ** 0.5
        return est

    # ------------------------------------------------------------------
    # Pipelines (pure loss functions)
    # ------------------------------------------------------------------

    def joint_pipeline(
        self,
        trainable: Dict,
        static: Dict,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        alpha: float,
        tau: float,
        train: bool,
        dense: bool = False,
    ):
        """Joint denoise + detect step.  Parity: `_new_pipeline`
        (denoiser_v2.py:253-589).

        batch: inp (B,H,W,C); target (B,) or (B,1) PU labels for train.
        Returns (mean_loss, (outputs, bn_updates)).
        """
        variables = self.merge_variables(trainable, static)
        inp = batch["inp"]
        noisy_in = inp

        k_sample, k_flip_p, k_sample2 = jax.random.split(rng, 3)

        pred_loss = jnp.float32(0.0)
        consis_loss = jnp.float32(0.0)
        if train and self.fold_tta:
            # Flip-TTA consistency (denoiser_v2.py:304-322), FOLDED: the
            # primary and flipped forwards run as ONE 2B batch — one
            # program region, one BN update over the fold (see the
            # fold_tta field docstring for the exact semantics).
            p = jax.random.uniform(k_flip_p)
            w_flip = p <= 0.5
            inp_f = jnp.where(w_flip, jnp.flip(inp, 2), jnp.flip(inp, 1))
            both = jnp.concatenate([inp, inp_f], axis=0)
            (net_out2, hm_logits2), bn_updates = self._apply_model(
                variables["model"], both, k_sample, train, dense
            )
            b = inp.shape[0]
            net_out = net_out2[:b]
            hm_logits = hm_logits2[:b]
            hm_logits_f = hm_logits2[b:]
        else:
            (net_out, hm_logits), bn_updates = self._apply_model(
                variables["model"], inp, k_sample, train, dense
            )
        hm_p = losses.clamped_sigmoid(hm_logits)

        if train:
            if not self.fold_tta:
                # Reference-shaped path: second forward on a flipped copy,
                # sequential, BN updating twice (denoiser_v2.py:304-322).
                # W-flip with prob 0.5 else H-flip.
                p = jax.random.uniform(k_flip_p)
                w_flip = p <= 0.5
                inp_f = jnp.where(w_flip, jnp.flip(inp, 2), jnp.flip(inp, 1))
                model_vars2 = dict(variables["model"])
                if bn_updates is not None:
                    model_vars2["batch_stats"] = bn_updates
                (_, hm_logits_f), bn_updates2 = self._apply_model(
                    model_vars2, inp_f, k_sample2, train, dense
                )
                if bn_updates2 is not None:
                    bn_updates = bn_updates2
            hm_logits_f = jnp.where(
                w_flip, jnp.flip(hm_logits_f, 2), jnp.flip(hm_logits_f, 1)
            )
            hm_p_f = losses.clamped_sigmoid(hm_logits_f)

            target = batch["target"]
            pred_loss = losses.pu_loss(hm_p, target, tau, slack=4.0)
            consis_loss = jnp.mean((hm_p - hm_p_f) ** 2)

        c = self.in_channels
        mu_x = net_out[..., 0:c]
        a_c = net_out[..., c : self.out_channels]
        known = self.noise_value == NoiseValue.KNOWN

        if c == 1:
            sigma_x = a_c ** 2
            noise_std = self._noise_std(variables, noisy_in, mu_x, batch)
            loss_map, pme_out, net_std, noise_std_out = losses.gaussian_nll_pme(
                noisy_in, mu_x, sigma_x, noise_std, known_noise=known
            )
        else:
            raise NotImplementedError(
                "joint mode supports single-channel micrographs"
            )

        loss_out = jnp.mean(loss_map.reshape(loss_map.shape[0], -1), axis=1, keepdims=True)

        if train:
            final_loss = (
                alpha * loss_out + (1 - alpha) * pred_loss + 0.1 * consis_loss
            )
        else:
            final_loss = loss_out

        outputs = {
            PipelineOutput.IMG_MU: mu_x,
            PipelineOutput.IMG_DENOISED: pme_out,
            PipelineOutput.LOSS: final_loss,
            PipelineOutput.DETECT_LOSS: pred_loss,
            PipelineOutput.DENOISE_LOSS: loss_out,
            PipelineOutput.AUG_LOSS: consis_loss,
            PipelineOutput.NOISE_STD_DEV: noise_std_out,
            PipelineOutput.MODEL_STD_DEV: net_std,
            PipelineOutput.DETECT: hm_p,
        }
        return jnp.mean(final_loss), (outputs, bn_updates)

    def ssdn_pipeline(
        self,
        trainable: Dict,
        static: Dict,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        train: bool,
        dense: bool = False,
    ):
        """Denoise-only ssdn step.  Parity: `_ssdn_pipeline`
        (denoiser_v2.py:598-849)."""
        variables = self.merge_variables(trainable, static)
        inp = batch["inp"]

        (net_out, hm_logits), bn_updates = self._apply_model(
            variables["model"], inp, rng, train, dense
        )

        c = self.in_channels
        mu_x = net_out[..., 0:c]
        a_c = net_out[..., c : self.out_channels]
        known = self.noise_value == NoiseValue.KNOWN

        if c == 1:
            sigma_x = a_c ** 2
            noise_std = self._noise_std(variables, inp, mu_x, batch)
            loss_map, pme_out, net_std, noise_std_out = losses.gaussian_nll_pme(
                inp, mu_x, sigma_x, noise_std, known_noise=known
            )
        else:
            # Full triangular A -> sigma_x = A^T A (denoiser_v2.py:663-688).
            diagonal = self.cfg[ConfigValue.DIAGONAL_COVARIANCE]
            if diagonal:
                diag = a_c ** 2  # BHWC
                sigma_x = jax.vmap(jnp.diag, in_axes=0)(diag.reshape(-1, c)).reshape(
                    a_c.shape[:-1] + (c, c)
                )
            else:
                # a_c has c(c+1)/2 entries = upper-triangular A.
                tri = jnp.zeros(a_c.shape[:-1] + (c, c))
                iu = np.triu_indices(c)
                tri = tri.at[..., iu[0], iu[1]].set(a_c)
                sigma_x = jnp.einsum("...ji,...jk->...ik", tri, tri)
            noise_std = self._noise_std(variables, inp, mu_x, batch)
            noise_std = jnp.broadcast_to(noise_std, inp.shape)
            loss_map, pme_out, net_std, noise_std_out = losses.full_cov_nll_pme(
                inp, mu_x, sigma_x, noise_std, known_noise=known
            )

        loss_out = jnp.mean(loss_map.reshape(loss_map.shape[0], -1), axis=1, keepdims=True)
        outputs = {
            PipelineOutput.IMG_MU: mu_x,
            PipelineOutput.IMG_DENOISED: pme_out,
            PipelineOutput.LOSS: loss_out,
            PipelineOutput.NOISE_STD_DEV: noise_std_out,
            PipelineOutput.MODEL_STD_DEV: net_std,
        }
        return jnp.mean(loss_out), (outputs, bn_updates)

    def mse_pipeline(
        self,
        trainable: Dict,
        static: Dict,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        train: bool = True,
        dense: bool = False,
    ):
        """n2c / n2n plain MSE.  Parity: `_mse_pipeline`
        (denoiser_v2.py:209-226)."""
        variables = self.merge_variables(trainable, static)
        (cleaned, _), bn_updates = self._apply_model(
            variables["model"], batch["inp"], rng, train, dense
        )
        outputs = {PipelineOutput.IMG_DENOISED: cleaned}
        loss = jnp.float32(0.0)
        if "ref" in batch:
            loss = losses.mse_per_item(cleaned, batch["ref"])
            outputs[PipelineOutput.LOSS] = loss
        return jnp.mean(loss), (outputs, bn_updates)

    def mask_mse_pipeline(
        self,
        trainable: Dict,
        static: Dict,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        train: bool = True,
        dense: bool = False,
    ):
        """n2v masked MSE.  Parity: `_mask_mse_pipeline`
        (denoiser_v2.py:228-249) with a dense 0/1 mask instead of a
        coordinate list (static shapes)."""
        variables = self.merge_variables(trainable, static)
        (cleaned, _), bn_updates = self._apply_model(
            variables["model"], batch["inp"], rng, train, dense
        )
        outputs = {PipelineOutput.IMG_DENOISED: cleaned}
        loss = jnp.float32(0.0)
        if "ref" in batch and "mask" in batch:
            loss = losses.masked_mse(cleaned, batch["ref"], batch["mask"])
            # Per-item mean (denoiser_v2.py:245): the reference sums the
            # masked squared error then means over the (1,) dim — keep sum.
            outputs[PipelineOutput.LOSS] = loss
        return jnp.mean(loss), (outputs, bn_updates)

    def run_pipeline(self, trainable, static, batch, rng, alpha=0.0, tau=0.0,
                     train=True, dense=False):
        """Dispatch, parity with denoiser_v2.py:196-207."""
        if self.mode == "joint":
            return self.joint_pipeline(
                trainable, static, batch, rng, alpha, tau, train, dense
            )
        if self.pipeline == Pipeline.MSE:
            return self.mse_pipeline(trainable, static, batch, rng, train, dense)
        if self.pipeline == Pipeline.SSDN:
            return self.ssdn_pipeline(trainable, static, batch, rng, train, dense)
        if self.pipeline == Pipeline.MASK_MSE:
            return self.mask_mse_pipeline(trainable, static, batch, rng, train, dense)
        raise NotImplementedError("Unsupported processing pipeline")

    def config_name(self) -> str:
        return cfg_mod.config_name(self.cfg)
