"""Programmatic picking/denoising API — one import, one call.

The reference has no library surface: picking a micrograph from Python
means driving its Trainer/eval internals by hand.  Here:

    from spr_pick_tpu.api import Picker

    picker = Picker("final-ssdn-gauss.wt")        # or .training
    picks = picker.pick("mic.mrc")                # DataFrame: name/x/y/score
    den   = picker.denoise("mic.mrc")             # float32 H,W

Semantics match the evaluator exactly (same dense forward, same device NMS,
same 30 px border filter and x/y column order as `_scores.txt` /
convert_to_star — train.py:write_scores).  Arrays are accepted as well as
paths; pass `standardize=True` at load for header-based MRC normalisation.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Union

import numpy as np
import pandas as pd

from spr_pick_tpu.data.loader import load_image
from spr_pick_tpu.data.micrograph import pad_to_multiple, unpad
from spr_pick_tpu.params import ConfigValue, PipelineOutput

ImageLike = Union[str, np.ndarray]


class Picker:
    """Load a checkpoint once, then pick/denoise micrographs.

    ``checkpoint``: `.training` (full state) or `.wt` (weights+cfg) file.
    Raw reference (PyTorch) checkpoints load directly — the loader sniffs
    the torch magic and converts in-process (needs torch + the reference
    package importable; see docs/MIGRATION.md) — or convert once offline
    via tools/import_reference_checkpoint.py.

    ``nms_radius`` defaults to the checkpoint cfg's NMS value,
    ``threshold`` to the product's 0.02 heatmap floor, ``border`` to the
    evaluator's 30 px frame (pass 0 to keep edge picks).
    """

    def __init__(self, checkpoint: str, mode: str = "joint",
                 nms_radius: Optional[int] = None, threshold: float = 0.02,
                 max_peaks: Optional[int] = None, border: int = 30,
                 seed: int = 0):
        # The evaluator owns checkpoint-format dispatch (.training vs .wt)
        # and model reconstruction from the embedded cfg; reuse it as the
        # loader.  No run dir is created: evaluate() is never called and
        # run_dir_path stays untouched.
        from spr_pick_tpu.eval import DenoiserEvaluator

        self._ev = DenoiserEvaluator(checkpoint, mode=mode)
        self.nms_radius = int(
            nms_radius if nms_radius is not None
            else self._ev.cfg[ConfigValue.NMS]
        )
        self.threshold = float(threshold)
        # Default from the checkpoint cfg like the evaluator (train.py uses
        # cfg MAX_PEAKS) so pick-set parity holds beyond 2048 peaks too.
        self.max_peaks = int(
            max_peaks if max_peaks is not None
            else self._ev.cfg.get(ConfigValue.MAX_PEAKS, 2048)
        )
        self.border = int(border)
        self.seed = int(seed)
        self._step = None

    # ------------------------------------------------------------------

    def _forward(self, image: ImageLike, standardize: bool = False):
        """Dense forward on one micrograph; returns (outputs, shape)."""
        import jax
        import jax.numpy as jnp

        from spr_pick_tpu.steps import make_eval_step

        img = self._load(image, standardize)
        if self._step is None:
            self._step = make_eval_step(self._ev.denoiser, dense=True)
        square = not self._ev.denoiser.supports_rect_dense
        padded, shape = pad_to_multiple(img, 32, square=square)
        if max(padded.shape) > self._ev.tile_eval_threshold:
            # Same routing as the evaluator: giant micrographs go through
            # halo tiling (the whole-image forward would exhaust HBM and
            # compile a fresh program per size).  _evaluate_tiled draws one
            # key per tile chunk from the evaluator's internal stream; pin
            # that stream to this Picker's seed for the call so the tiled
            # route honours the same deterministic-seed contract as the
            # whole-image path (repeated picks are idempotent).
            self._ev._eval_step = self._step
            saved_key = self._ev._rng_key
            self._ev._rng_key = jax.random.PRNGKey(self.seed)
            try:
                outputs = self._ev._evaluate_tiled(
                    {"inp": padded[None, :, :, None]}
                )
            finally:
                self._ev._rng_key = saved_key
            return outputs, shape
        outputs = self._step(
            self._ev.train_state,
            {"inp": jnp.asarray(padded[None, :, :, None])},
            jax.random.PRNGKey(self.seed),
        )
        return outputs, shape

    def pick(self, image: ImageLike, name: Optional[str] = None,
             standardize: bool = False) -> pd.DataFrame:
        """Pick one micrograph -> DataFrame(image_name, x_coord, y_coord,
        score), sorted by descending score, border-filtered — identical
        semantics (incl. x/y column order) to the evaluator's _scores.txt.
        """
        from spr_pick_tpu.ops.nms import nms_to_host

        if name is None:
            name = self._name_for(image)
        outputs, shape = self._forward(image, standardize=standardize)
        if PipelineOutput.DETECT not in outputs:
            raise ValueError(
                "checkpoint has no detector head (denoise-only model); "
                "use .denoise()"
            )
        hm = np.asarray(outputs[PipelineOutput.DETECT])[
            0, : shape[0], : shape[1], 0
        ]
        scores, coords = nms_to_host(
            hm, self.nms_radius, threshold=self.threshold,
            max_peaks=self.max_peaks,
        )
        return self._picks_frame(name, scores, coords, shape)

    def _picks_frame(self, name, scores, coords, shape) -> pd.DataFrame:
        """Border-filter + column mapping shared by pick/_pick_group
        (identical to train.py:write_scores: x = coords[:, 1])."""
        b = self.border
        x_max, y_max = shape[0] - b, shape[1] - b
        keep = (
            (coords[:, 1] > b) & (coords[:, 1] < x_max)
            & (coords[:, 0] > b) & (coords[:, 0] < y_max)
        ) if b > 0 else np.ones(len(scores), bool)
        return pd.DataFrame(
            {
                "image_name": name,
                "x_coord": coords[keep, 1].astype(int),
                "y_coord": coords[keep, 0].astype(int),
                "score": scores[keep],
            }
        )

    def pick_many(self, images: Iterable[ImageLike],
                  standardize: bool = False,
                  batch_size: int = 1,
                  names: Optional[Iterable[str]] = None) -> pd.DataFrame:
        """Pick several micrographs; one concatenated DataFrame.

        ``batch_size`` > 1 groups consecutive SAME-SHAPE micrographs into
        one dense forward + one vmapped NMS program (the evaluator's
        batched path): the NMS wave fixed costs amortise across the batch
        and nothing but the pick lists crosses to host.  Results match
        batch_size=1 up to backend conv numerics: a batch-N conv program
        may round differently from batch-1 at the lsb (bit-identical on
        CPU, ~7e-3 heatmap drift in bf16 on TPU), which can flip picks
        whose scores tie at the threshold.  Given the same heatmap, the
        vmapped NMS is bit-exact vs the single-image kernel.

        ``names``: optional per-image output names (e.g. from a manifest's
        image_name column); defaults to each path's basename.
        """
        images = list(images)
        if names is None:
            names = [self._name_for(im) for im in images]
        else:
            names = list(names)
            if len(names) != len(images):
                raise ValueError(
                    f"{len(names)} names for {len(images)} images"
                )
        if batch_size <= 1:
            frames = [
                self.pick(im, name=nm, standardize=standardize)
                for im, nm in zip(images, names)
            ]
        else:
            frames = []
            i = 0
            carried = None  # shape-mismatched load carried to the next group
            while i < len(images):
                first = carried if carried is not None else self._load(
                    images[i], standardize
                )
                carried = None
                group, arrs = [names[i]], [first]
                while (
                    len(group) < batch_size and i + len(group) < len(images)
                ):
                    nxt = self._load(images[i + len(group)], standardize)
                    if nxt.shape != first.shape:
                        carried = nxt  # don't decode it twice
                        break
                    group.append(names[i + len(group)])
                    arrs.append(nxt)
                frames.extend(self._pick_group(group, arrs))
                i += len(group)
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            columns=["image_name", "x_coord", "y_coord", "score"]
        )

    @staticmethod
    def _name_for(image: ImageLike) -> str:
        return (
            os.path.splitext(os.path.basename(image))[0]
            if isinstance(image, str) else "image"
        )

    def _load(self, image: ImageLike, standardize: bool) -> np.ndarray:
        if isinstance(image, str):
            return load_image(image, standardize=standardize)
        img = np.ascontiguousarray(image, np.float32)
        if img.ndim != 2:
            raise ValueError(f"expected a 2-D micrograph, got {img.shape}")
        return img

    def _pick_group(self, names, arrs):
        """One dense forward + one batched NMS over a same-shape group.

        ``names``: output name per array (already resolved by pick_many).
        """
        import jax
        import jax.numpy as jnp

        from spr_pick_tpu.ops.nms import nms_batch_to_host
        from spr_pick_tpu.steps import make_eval_step

        if self._step is None:
            self._step = make_eval_step(self._ev.denoiser, dense=True)
        square = not self._ev.denoiser.supports_rect_dense
        padded = []
        shape = None
        for a in arrs:
            p, shape = pad_to_multiple(a, 32, square=square)
            padded.append(p)
        if max(padded[0].shape) > self._ev.tile_eval_threshold:
            # Giant micrographs: per-image halo tiling (pick() routes
            # through _forward's tiled path), not one huge batched program.
            return [
                self.pick(a, name=nm) for nm, a in zip(names, arrs)
            ]
        batch = {"inp": jnp.asarray(np.stack(padded)[..., None])}
        outputs = self._step(
            self._ev.train_state, batch, jax.random.PRNGKey(self.seed)
        )
        if PipelineOutput.DETECT not in outputs:
            raise ValueError(
                "checkpoint has no detector head (denoise-only model); "
                "use .denoise()"
            )
        hms = outputs[PipelineOutput.DETECT][:, : shape[0], : shape[1], 0]
        picks = nms_batch_to_host(
            hms, self.nms_radius, threshold=self.threshold,
            max_peaks=self.max_peaks,
        )
        frames = []
        for name, (scores, coords) in zip(names, picks):
            frames.append(self._picks_frame(name, scores, coords, shape))
        return frames

    def denoise(self, image: ImageLike,
                standardize: bool = False) -> np.ndarray:
        """Denoise one micrograph -> float32 H,W (original shape)."""
        outputs, shape = self._forward(image, standardize=standardize)
        return self._denoised(outputs, shape)

    def process(self, image: ImageLike, name: Optional[str] = None,
                standardize: bool = False):
        """ONE dense forward -> (picks DataFrame, denoised float32 H,W).

        Same results as pick() + denoise() at half the compute; picks is
        None for denoise-only checkpoints (no detector head).
        """
        from spr_pick_tpu.ops.nms import nms_to_host

        if name is None:
            name = self._name_for(image)
        outputs, shape = self._forward(image, standardize=standardize)
        den = self._denoised(outputs, shape)
        if PipelineOutput.DETECT not in outputs:
            return None, den
        hm = np.asarray(outputs[PipelineOutput.DETECT])[
            0, : shape[0], : shape[1], 0
        ]
        scores, coords = nms_to_host(
            hm, self.nms_radius, threshold=self.threshold,
            max_peaks=self.max_peaks,
        )
        return self._picks_frame(name, scores, coords, shape), den

    @staticmethod
    def _denoised(outputs, shape) -> np.ndarray:
        key = (
            PipelineOutput.IMG_DENOISED
            if PipelineOutput.IMG_DENOISED in outputs
            else PipelineOutput.IMG_MU
        )
        return unpad(np.asarray(outputs[key])[0, :, :, 0], shape)
