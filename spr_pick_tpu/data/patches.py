"""Patch pipeline for unlabeled (folder / HDF5) denoising datasets.

Covers the reference's folder/h5 training route (train.py:1035-1048 +
NoisyDataset): random patch crops from whole images, algorithm-dependent
input/reference construction (data/noisy.py), batched to device.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spr_pick_tpu.data.crop import random_crop
from spr_pick_tpu.data.noisy import prepare_batch, prepare_batch_jax
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


class DeviceDenoisePipeline:
    """HBM-resident denoise data plane: the folder/hdf5 analog of
    DevicePatchPipeline.

    All images are stacked into one (N, Hmax, Wmax) device array at
    construction; per step, the host contributes only three int32 coordinate
    arrays (image index + crop corner, drawn from a resumable numpy
    RandomState with per-image valid ranges — same distribution as
    `random_crop`).  The crop gather, noise synthesis and n2v UPS masking
    (data/noisy.py:prepare_batch_jax) run inside one jitted program — or
    fused into the K-step train scan (steps.make_denoise_scan) with no
    per-step dispatch at all.  Replaces the reference's per-item host
    pipeline (datasets/noise_wrapper.py:98-168 under a torch DataLoader).

    Raises ValueError when the padded stack would exceed ``max_bytes``
    (the trainer falls back to the host DenoisePatchPipeline).
    """

    def __init__(
        self,
        dataset,
        patch: int,
        algorithm: NoiseAlgorithm,
        noise_style: Optional[str],
        seed: int = 0,
        noise_input: bool = False,
        max_bytes: int = 4 << 30,
    ):
        self.patch = patch
        self.algorithm = algorithm
        self.noise_style = noise_style
        self.noise_input = noise_input

        n_imgs = len(dataset)
        if n_imgs == 0:
            raise ValueError("empty dataset")
        # Decode incrementally, checking a LOWER BOUND of the final padded
        # stack (n_imgs * hmax_so_far * wmax_so_far) as hmax/wmax grow —
        # an over-budget dataset is rejected at the first oversize image,
        # before the whole set is decoded into host RAM (the trainer then
        # falls back to the lazy host DenoisePatchPipeline).
        imgs = []
        hmax = wmax = patch
        for i in range(n_imgs):
            im = np.asarray(dataset[i], np.float32)
            h, w = im.shape[:2]
            if h < patch or w < patch:
                # Undersized images take the same reflect pad as random_crop.
                im = np.pad(
                    im,
                    ((0, max(0, patch - h)), (0, max(0, patch - w))),
                    mode="reflect",
                )
                h, w = im.shape[:2]
            imgs.append(im)
            hmax, wmax = max(hmax, h), max(wmax, w)
            nbytes = n_imgs * hmax * wmax * 4
            if nbytes > max_bytes:
                raise ValueError(
                    f"image stack (>= {nbytes / 2**30:.1f} GiB padded) exceeds "
                    f"the device data-plane budget "
                    f"({max_bytes / 2**30:.1f} GiB)"
                )
        stack = np.zeros((len(imgs), hmax, wmax), np.float32)
        for n, im in enumerate(imgs):
            stack[n, : im.shape[0], : im.shape[1]] = im
        self.heights = np.array([im.shape[0] for im in imgs], np.int32)
        self.widths = np.array([im.shape[1] for im in imgs], np.int32)
        # Lazy placement (see DevicePatchPipeline): keep the host stack so
        # shard_over() can put per-chip shards straight from host memory.
        self._images_host: Optional[np.ndarray] = stack
        self._images_dev = None

        self.rng = np.random.RandomState(seed)
        self._base_key = jax.random.PRNGKey(seed ^ 0x5EED)
        self._key_counter = 0

        patch_sz = patch
        algo, style, noise_in = algorithm, noise_style, noise_input

        @jax.jit
        def make_batch(images, flat, ys, xs, key):
            def gather(n, y, x):
                return jax.lax.dynamic_slice(
                    images[n], (y, x), (patch_sz, patch_sz)
                )

            crops = jax.vmap(gather)(flat, ys, xs)
            return prepare_batch_jax(
                crops, algo, style, key, training=True, noise_input=noise_in
            )

        self._make_batch = make_batch

    @property
    def images_dev(self):
        """The (N, H, W) stack on device; placed on first access when
        shard_over() hasn't been called first."""
        if self._images_dev is None:
            self._images_dev = jax.device_put(self._images_host)
            self._images_host = None
        return self._images_dev

    @images_dev.setter
    def images_dev(self, value):
        self._images_dev = value
        self._images_host = None

    def shard_over(self, mesh) -> None:
        """Shard the stack over the mesh's data axis — N/|mesh| images per
        chip, device_put straight from the host copy when still unplaced
        (the full stack never occupies one device)."""
        from spr_pick_tpu.parallel.mesh import shard_stack

        src = self._images_host if self._images_dev is None else self._images_dev
        self._images_dev = shard_stack(src, mesh)
        self._images_host = None

    def sample_coords(self, shape):
        """Draw image indices + in-bounds crop corners of the given shape
        ((B,) or (K, B)) — the host's only per-step/per-chunk work."""
        flat = self.rng.randint(len(self.heights), size=shape).astype(np.int32)
        ry = self.rng.random_sample(shape)
        rx = self.rng.random_sample(shape)
        ys = (ry * (self.heights[flat] - self.patch + 1)).astype(np.int32)
        xs = (rx * (self.widths[flat] - self.patch + 1)).astype(np.int32)
        return flat, ys, xs

    def _next_key(self):
        key = jax.random.fold_in(self._base_key, self._key_counter)
        self._key_counter += 1
        return key

    def batch(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        flat, ys, xs = self.sample_coords((batch_size,))
        return self._make_batch(
            self.images_dev,
            jnp.asarray(flat),
            jnp.asarray(ys),
            jnp.asarray(xs),
            self._next_key(),
        )

    def state_dict(self):
        """Crop RNG + noise key position (resumable data plane)."""
        return {
            "rng_state": self.rng.get_state(),
            "key_counter": self._key_counter,
        }

    def load_state_dict(self, sd) -> None:
        self.rng.set_state(sd["rng_state"])
        self._key_counter = int(sd.get("key_counter", 0))


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
