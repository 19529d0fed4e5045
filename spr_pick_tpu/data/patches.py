"""Patch pipeline for unlabeled (folder / HDF5) denoising datasets.

Covers the reference's folder/h5 training route (train.py:1035-1048 +
NoisyDataset): random patch crops from whole images, algorithm-dependent
input/reference construction (data/noisy.py), batched to device.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from spr_pick_tpu.data.crop import random_crop
from spr_pick_tpu.data.noisy import prepare_batch
from spr_pick_tpu.params import NoiseAlgorithm


class DenoisePatchPipeline:
    """Random-crop batches from an image dataset (folder/hdf5) for the
    n2c / n2n / n2v / ssdn denoise-only algorithms."""

    def __init__(
        self,
        dataset,
        patch: int,
        algorithm: NoiseAlgorithm,
        noise_style: Optional[str],
        seed: int = 0,
        noise_input: bool = False,
    ):
        self.dataset = dataset
        self.patch = patch
        self.algorithm = algorithm
        self.noise_style = noise_style
        self.noise_input = noise_input
        self.rng = np.random.RandomState(seed)
        # Cache decoded images (folder datasets decode lazily).
        self._cache: Dict[int, np.ndarray] = {}

    def _image(self, i: int) -> np.ndarray:
        if i not in self._cache:
            self._cache[i] = np.asarray(self.dataset[i], np.float32)
        return self._cache[i]

    def batch(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        crops = np.empty((batch_size, self.patch, self.patch), np.float32)
        for b in range(batch_size):
            idx = self.rng.randint(len(self.dataset))
            img = self._image(idx)
            crops[b], _, _ = random_crop(img, None, self.patch, self.rng)
        host = prepare_batch(
            crops,
            self.algorithm,
            self.noise_style,
            self.rng,
            training=True,
            noise_input=self.noise_input,
        )
        return {k: jnp.asarray(v) for k, v in host.items()}

    def state_dict(self):
        """Crop/noise RNG state (resumable data plane)."""
        return {"rng_state": self.rng.get_state()}

    def load_state_dict(self, sd) -> None:
        self.rng.set_state(sd["rng_state"])


class UnlabeledEvalDataset:
    """Whole-image eval access over a folder/hdf5 dataset (no coordinates).

    Provides the same `test_item` contract as MicrographDataset so the
    evaluator's dense pass and artifact dumps work on unlabeled data.
    """

    def __init__(self, dataset, gt_dataset=None):
        self.dataset = dataset
        self.gt_dataset = gt_dataset

    def __len__(self):
        return len(self.dataset)

    def test_item(self, index: int, pad_multiple: int = 32,
                  square: bool = False) -> Dict:
        from spr_pick_tpu.data.micrograph import pad_to_multiple

        img = np.asarray(self.dataset[index], np.float32)
        padded, shape = pad_to_multiple(img, pad_multiple, square=square)
        gt = None
        if self.gt_dataset is not None:
            gt = np.asarray(self.gt_dataset[index], np.float32)
        return {
            "inp": padded[None, :, :, None],
            "hm": None,
            "hm_small": None,
            "image_shape": shape,
            "name": self.dataset.name(index),
            "gt": gt,
            "target": None,
        }
