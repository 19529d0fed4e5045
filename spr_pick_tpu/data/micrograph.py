"""Micrograph dataset + TPU-native device data plane.

Parity: `spr_pick/datasets/micrograph.py` (manifest/dir loading, coordinate
matching, mask/heatmap construction, train patch extraction, test
whole-image access) and `spr_pick/datasets/image_wrapper.py` (pad-to-multiple
reflection padding, unpad).

TPU-first redesign (SURVEY.md §7.1 "Data plane"): instead of per-item PIL
crops in CPU worker processes, the micrograph stack and heatmaps are pinned
once in HBM and the per-step patch batch is an on-device gather
(`jax.vmap(lax.dynamic_slice)`) driven by the sampler's packed indices —
the training input pipeline costs one small host->device transfer of B int32
triples per step.
"""

from __future__ import annotations

import glob
import os
import sys
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from spr_pick_tpu.data import files as file_utils
from spr_pick_tpu.data.loader import IMAGE_EXTS, load_image, \
    load_images_from_list
from spr_pick_tpu.data.sampler import unpack_index
from spr_pick_tpu.ops.heatmap import as_gaussian, as_mask


def _image_table(path: str, image_ext: str = "") -> pd.DataFrame:
    """Manifest TSV or directory -> DataFrame(image_name, path).

    Parity: micrograph.py:217-229.  The extension filter is the loader's
    own IMAGE_EXTS (one shared constant — a private subset here once
    silently dropped .tif files the loader could read), and an empty
    directory raises instead of yielding a 0-image dataset that crashes
    later with an opaque sampler IndexError.
    """
    if os.path.isdir(path):
        paths = glob.glob(path + os.sep + "*" + image_ext)
        names, valid = [], []
        for p in paths:
            name, ext = os.path.splitext(os.path.basename(p))
            if ext.lower() in IMAGE_EXTS:
                names.append(name)
                valid.append(p)
        if not valid:
            raise ValueError(
                f"no images with extensions {IMAGE_EXTS} found under "
                f"{path!r}"
            )
        return pd.DataFrame({"image_name": names, "path": valid})
    return pd.read_csv(path, sep="\t")


def pad_to_multiple(img: np.ndarray, multiple: int,
                    square: bool = False) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Reflection-pad H,W (trailing sides) up to a multiple.

    Parity: image_wrapper.py:221-249 (left/top 0, right/bottom padded).
    ``square=True`` additionally pads the shorter side to the longer one:
    the blind-spot rot4 fold needs H == W (the reference's torch.cat of
    90-degree rotations would CRASH on non-square micrographs; padding
    square then cropping back is strictly better).  Returns
    (padded, original_shape).
    """
    h, w = img.shape[:2]
    ph = (h + multiple - 1) // multiple * multiple
    pw = (w + multiple - 1) // multiple * multiple
    if square:
        ph = pw = max(ph, pw)
    if ph == h and pw == w:
        return img, (h, w)
    return _reflect_pad_trailing(img, ph - h, pw - w), (h, w)


def _reflect_pad_trailing(img: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Reflection-pad the trailing H/W sides by (ph, pw).

    np.pad(mode="reflect") requires pad < dim; square-padding a
    rectangular micrograph with aspect ratio >= 2 violates that, so the
    pad is applied in passes (each bounded by dim-1).  Degenerate 1-px
    dims fall back to edge replication (reflect is undefined there).
    """
    while ph > 0 or pw > 0:
        h, w = img.shape[:2]
        if (ph > 0 and h <= 1) or (pw > 0 and w <= 1):
            pad = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
            return np.pad(img, pad, mode="edge")
        dh = min(ph, h - 1)
        dw = min(pw, w - 1)
        pad = [(0, dh), (0, dw)] + [(0, 0)] * (img.ndim - 2)
        img = np.pad(img, pad, mode="reflect")
        ph -= dh
        pw -= dw
    return img


def unpad(img: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    """Crop back to the original (H, W).  Parity: image_wrapper.py:251-276."""
    return img[: shape[0], : shape[1]]


class MicrographDataset:
    """Loads micrographs + particle coordinates; builds masks and heatmaps.

    Parity: micrograph.py:26-299.  Images are float32 numpy in [0,1] (MRC
    min-max-quantised, see data/loader.py).  Structure: nested lists indexed
    [group][image].
    """

    def __init__(
        self,
        image_path: str,
        coordinate_path: Optional[str],
        radius: int = 3,
        train: bool = True,
        crop: int = 72,
        gt_path: Optional[str] = None,
        bb: int = 32,
        verbose: bool = True,
    ):
        self.image_path = image_path
        self.coordinate_path = coordinate_path
        self.radius = radius
        self.train = train
        self.crop = crop
        self.gt_path = gt_path
        self.bb = bb
        self.verbose = verbose
        self._load()

    # -- loading -------------------------------------------------------

    def _load(self):
        train_images = _image_table(self.image_path)
        gt_images = _image_table(self.gt_path) if self.gt_path else None

        targets = file_utils.read_coordinates(self.coordinate_path) if self.coordinate_path else pd.DataFrame(columns=["image_name", "x_coord", "y_coord"])
        # Default the source column PER TABLE: the reference only
        # defaults when BOTH lack it (micrograph.py:248), so a coordinate
        # file carrying `source` with a plain image manifest crashes.
        if "source" not in train_images:
            train_images["source"] = 0
        if "source" not in targets:
            targets["source"] = 0
        if gt_images is not None and "source" not in gt_images:
            gt_images["source"] = 0

        images = load_images_from_list(
            train_images.image_name, train_images.path, sources=train_images.source
        )
        gts = (
            load_images_from_list(
                gt_images.image_name, gt_images.path, sources=gt_images.source
            )
            if gt_images is not None
            else None
        )

        # Filter coordinates with no matching image (micrograph.py:260-272).
        names = {n for d in images.values() for n in d.keys()}
        keep = targets.image_name.apply(lambda x: x in names)
        targets = targets.loc[keep]

        # Sanity warnings (micrograph.py:274-291).
        width = max((im.shape[1] for d in images.values() for im in d.values()), default=0)
        height = max((im.shape[0] for d in images.values() for im in d.values()), default=0)
        if len(targets):
            oob = ((targets.x_coord > width) | (targets.y_coord > height)).sum()
            if oob > int(0.1 * len(targets)):
                print(
                    f"WARNING: {oob} particle coordinates are out of the micrograph "
                    "dimensions. Did you scale the micrographs and particle "
                    "coordinates correctly?",
                    file=sys.stderr,
                )
            if (
                targets.x_coord.max() < 0.7 * width
                and targets.y_coord.max() < 0.7 * height
            ):
                print(
                    "WARNING: no coordinates are observed near the right/bottom "
                    "borders. Did you scale the micrographs and particle "
                    "coordinates correctly?",
                    file=sys.stderr,
                )

        # Per-image coordinate dict.
        coord_map: Dict = {}
        for (source, name), df in targets.groupby(["source", "image_name"]):
            coord_map.setdefault(source, {})[name] = df[
                ["x_coord", "y_coord"]
            ].values.astype(np.int32)
        null_xy = np.zeros((0, 2), dtype=np.int32)

        self.images: List[List[np.ndarray]] = []
        self.targets: List[List[np.ndarray]] = []
        self.hms: List[List[np.ndarray]] = []
        self.hms_small: List[List[np.ndarray]] = []
        self.gts: List[List[np.ndarray]] = []
        self.names: List[List[str]] = []
        self.coords: List[List[np.ndarray]] = []

        for source in images.keys():
            g_imgs, g_tgts, g_hms, g_hms_s, g_gts, g_names, g_xy = (
                [], [], [], [], [], [], [],
            )
            for name, im in images[source].items():
                xy = coord_map.get(source, {}).get(name, null_xy)
                shape = im.shape[:2]
                shape_small = (shape[0] // 2, shape[1] // 2)
                radii = np.full(len(xy), self.radius, dtype=np.int32)
                g_imgs.append(im)
                g_tgts.append(as_mask(shape, xy[:, 0], xy[:, 1], radii))
                g_hms.append(as_gaussian(shape, xy[:, 0], xy[:, 1], bb=self.bb))
                g_hms_s.append(
                    as_gaussian(
                        shape_small, xy[:, 0] // 2, xy[:, 1] // 2, bb=self.bb // 2
                    )
                )
                if gts is not None:
                    g_gts.append(gts[source][name])
                g_names.append(name)
                g_xy.append(xy)
            self.images.append(g_imgs)
            self.targets.append(g_tgts)
            self.hms.append(g_hms)
            self.hms_small.append(g_hms_s)
            if gts is not None:
                self.gts.append(g_gts)
            self.names.append(g_names)
            self.coords.append(g_xy)

        self.num_images = sum(len(g) for g in self.images)
        # Flat index -> (group, local) so test_item spans ALL source
        # groups; the reference resolves test indices in group 0 only
        # (micrograph.py:129) and breaks on multi-source manifests.
        self._flat_index = [
            (g, i)
            for g, group in enumerate(self.images)
            for i in range(len(group))
        ]
        self.num_positive_regions, self.total_regions = self._report_stats()

    def _report_stats(self):
        """p_observed stats print (micrograph.py:197-210)."""
        if self.verbose:
            print("source\tsplit\tp_observed\tnum_positive_regions\ttotal_regions")
        num_pos = total = 0
        for i, group in enumerate(self.targets):
            p = int(sum(t.sum() for t in group))
            tot = sum(t.size for t in group)
            num_pos += p
            total += tot
            if self.verbose:
                print(f"{i}\ttrain\t{p / max(tot, 1):.3g}\t{p}\t{tot}")
        return num_pos, total

    def __len__(self):
        return self.num_images

    # -- host access ---------------------------------------------------

    def train_item(self, packed_index: int):
        """Decode packed index -> centred crop + centre label.

        Parity: micrograph.py:60-122 (host fallback path; the fast path is
        DevicePatchPipeline below).
        """
        g, i, coord = unpack_index(packed_index)
        g, i, coord = int(g), int(i), int(coord)
        img = self.images[g][i]
        hm = self.hms[g][i]
        w = img.shape[1]
        x, y = coord % w, coord // w
        half = self.crop // 2
        x0, y0 = x - half, y - half
        patch = _crop_zero_pad(img, x0, y0, self.crop)
        label = float(hm.ravel()[coord])
        return patch, label, self.names[g][i]

    def test_item(self, index: int, pad_multiple: int = 32,
                  square: bool = False):
        """Whole padded micrograph + metadata (micrograph.py:128-164).

        Carries the half-resolution heatmap `hm_small` like the reference
        test items (image_wrapper.py:18-22 HM_SMALL slot), padded to
        pad_multiple//2 (half the full-res pad grid, as in the reference).
        ``square`` pads to a square canvas for blind-spot dense eval.
        """
        g, i = self._flat_index[index]
        img = self.images[g][i]
        hm = self.hms[g][i]
        hm_small = self.hms_small[g][i]
        padded, shape = pad_to_multiple(img, pad_multiple, square=square)
        hm_p, _ = pad_to_multiple(hm, pad_multiple, square=square)
        hm_s_p, _ = pad_to_multiple(
            hm_small, max(pad_multiple // 2, 1), square=square
        )
        gt = None
        if self.gts:
            gt = self.gts[g][i]
        return {
            "inp": padded[None, :, :, None],
            "hm": hm_p[None, :, :, None],
            "hm_small": hm_s_p[None, :, :, None],
            "image_shape": shape,
            "name": self.names[g][i],
            "gt": gt,
            "target": self.targets[g][i],
        }


def _crop_zero_pad(img: np.ndarray, x0: int, y0: int, size: int) -> np.ndarray:
    """Crop with zero fill outside bounds (PIL .crop semantics)."""
    h, w = img.shape[:2]
    out = np.zeros((size, size), dtype=img.dtype)
    sx0, sy0 = max(0, x0), max(0, y0)
    sx1, sy1 = min(w, x0 + size), min(h, y0 + size)
    if sx1 > sx0 and sy1 > sy0:
        out[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = img[sy0:sy1, sx0:sx1]
    return out


class DevicePatchPipeline:
    """HBM-resident patch gather: the training data plane.

    All micrographs are stacked into one (N, H, W) array, put on device
    once, and each train batch is produced by a jitted
    ``vmap(dynamic_slice)`` gather keyed by (flat_image, y, x) int32 triples
    decoded from the sampler's packed indices.  A per-batch random flip
    augment (image + label jointly, fixing the reference's independent-flip
    quirk at micrograph.py:107-111) runs in the same fused program.

    Heatmaps never go to device: the training label is a single point-read
    ``hm[y, x]`` per sampled coordinate (reference micrograph.py:77), so
    labels are gathered HOST-side from the dataset's per-image heatmaps
    (``labels_for``) and shipped as one tiny (B,) / (K, B) float32 array —
    halving the HBM footprint vs a device heatmap stack.

    Raises ValueError when the padded image stack would exceed
    ``max_bytes`` (the trainer falls back to HostPatchPipeline, which keeps
    the reference's capacity model: host-RAM-bound, not HBM-bound).
    """

    def __init__(self, dataset: MicrographDataset, crop: int,
                 augment: bool = True, max_bytes: int = 4 << 30):
        self.crop = crop
        self.augment = augment

        flat_images, flat_hms = [], []
        self.flat_of: Dict[Tuple[int, int], int] = {}
        for g, group in enumerate(dataset.images):
            for i, img in enumerate(group):
                self.flat_of[(g, i)] = len(flat_images)
                flat_images.append(img)
                flat_hms.append(dataset.hms[g][i])

        hmax = max(im.shape[0] for im in flat_images)
        wmax = max(im.shape[1] for im in flat_images)
        nbytes = len(flat_images) * hmax * wmax * 4
        if nbytes > max_bytes:
            raise ValueError(
                f"micrograph stack ({nbytes / 2**30:.1f} GiB padded to "
                f"{len(flat_images)}x{hmax}x{wmax}) exceeds the device "
                f"data-plane budget ({max_bytes / 2**30:.1f} GiB)"
            )
        stack = np.zeros((len(flat_images), hmax, wmax), np.float32)
        self.widths = np.array([im.shape[1] for im in flat_images], np.int32)
        for n, im in enumerate(flat_images):
            stack[n, : im.shape[0], : im.shape[1]] = im

        # Placement is LAZY: the host stack is kept until first device use so
        # shard_over() can device_put per-chip shards straight from host
        # memory — under a mesh the full stack must never transit (or
        # transiently double on) a single chip's HBM, or the advertised
        # |mesh|-fold dataset-capacity scaling silently caps at one chip.
        self._images_host: Optional[np.ndarray] = stack
        self._images_dev = None
        # Host references (no copy) to the dataset's heatmaps, for the
        # per-coordinate label point-reads.
        self._hms_host = flat_hms
        self.heights = np.array([im.shape[0] for im in flat_images], np.int32)

        crop_sz = self.crop

        @partial(jax.jit, static_argnames=())
        def gather(images, flat_idx, ys, xs, flip_bits):
            def one(n, y, x, flip):
                half = crop_sz // 2
                patch = jax.lax.dynamic_slice(
                    images[n], (y - half, x - half), (crop_sz, crop_sz)
                )
                return jnp.where(flip > 0, jnp.flip(patch, axis=1), patch)

            return jax.vmap(one)(flat_idx, ys, xs, flip_bits)[..., None]

        self._gather = gather
        self._np_rng = np.random.RandomState(0)

    @property
    def images_dev(self):
        """The (N, H, W) stack on device; placed (replicated/single-device)
        on first access when shard_over() hasn't been called first."""
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
        chip.  When the stack is still host-resident (lazy placement) each
        shard is device_put directly to its chip; the full stack never
        occupies one device."""
        from spr_pick_tpu.parallel.mesh import shard_stack

        src = self._images_host if self._images_dev is None else self._images_dev
        self._images_dev = shard_stack(src, mesh)
        self._images_host = None

    def state_dict(self):
        """Flip-augment RNG state (resumable data plane)."""
        return {"flip_rng_state": self._np_rng.get_state()}

    def load_state_dict(self, sd) -> None:
        self._np_rng.set_state(sd["flip_rng_state"])

    def decode(self, packed_indices: np.ndarray):
        """Packed sampler indices -> (flat image idx, ys, xs) int32 arrays.

        Works on any shape; used by both the per-step gather and the
        scan-chunked trainer."""
        g, i, coord = unpack_index(packed_indices)
        flat = np.array(
            [self.flat_of[(int(gg), int(ii))] for gg, ii in zip(
                g.reshape(-1), i.reshape(-1))],
            np.int32,
        ).reshape(np.shape(packed_indices))
        w = self.widths[flat]
        xs = (coord % w).astype(np.int32)
        ys = (coord // w).astype(np.int32)
        return flat, ys, xs

    def labels_for(self, flat, ys, xs) -> np.ndarray:
        """Host point-read of the centre-pixel heatmap labels (any shape).

        Parity: micrograph.py:77 (`label = hm.ravel()[coord]`).  Vectorised
        per unique image; the cost is a few microseconds per element against
        heatmaps the dataset already holds in host RAM.
        """
        f = np.asarray(flat).reshape(-1)
        y = np.asarray(ys).reshape(-1)
        x = np.asarray(xs).reshape(-1)
        out = np.empty(len(f), np.float32)
        for img_idx in np.unique(f):
            m = f == img_idx
            hm = self._hms_host[int(img_idx)]
            out[m] = hm[y[m], x[m]]
        return out.reshape(np.shape(flat))

    def check_in_bounds(self, flat, ys, xs) -> None:
        """Reject coordinates whose crop window would leave the true image.

        The device gather uses ``dynamic_slice``, whose out-of-range clamping
        would silently decouple the label (read at (y, x)) from the patch
        centre — different semantics from the host path's zero-pad crop
        (`_crop_zero_pad`).  The sampler's border margins
        (enumerate_pu_coordinates: lo=72, hi=140) keep every draw in bounds
        for any crop <= 144; this guards the invariant if either side
        changes.
        """
        half = self.crop // 2
        rest = self.crop - half
        f = np.asarray(flat).reshape(-1)
        y = np.asarray(ys).reshape(-1)
        x = np.asarray(xs).reshape(-1)
        bad = (
            (y < half)
            | (x < half)
            | (y + rest > self.heights[f])
            | (x + rest > self.widths[f])
        )
        if bad.any():
            j = int(np.flatnonzero(bad)[0])
            raise ValueError(
                f"patch centre ({int(y[j])},{int(x[j])}) of image {int(f[j])} "
                f"(h={int(self.heights[f[j]])}, w={int(self.widths[f[j]])}) "
                f"puts the {self.crop}-px crop out of bounds; dynamic_slice "
                f"would clamp and decouple the label from the patch centre. "
                f"Sampler margins must be >= crop/2."
            )

    def batch(self, packed_indices: np.ndarray) -> Dict[str, jnp.ndarray]:
        flat, ys, xs = self.decode(packed_indices)
        self.check_in_bounds(flat, ys, xs)
        labels = self.labels_for(flat, ys, xs)
        flips = (
            self._np_rng.rand(len(flat)) < 0.5
        ).astype(np.int32) if self.augment else np.zeros(len(flat), np.int32)
        inp = self._gather(self.images_dev, flat, ys, xs, flips)
        return {"inp": inp, "target": jnp.asarray(labels)}


class HostPatchPipeline:
    """Host fallback for the joint TXT data plane: batches are built with
    numpy crops straight from the dataset's per-image arrays — no padded
    device stack at all, so dataset capacity is bounded by host RAM exactly
    like the reference's DataLoader path (train.py:1088-1094).  Selected by
    the trainer when DevicePatchPipeline's HBM budget is exceeded (or via
    SPR_HOST_JOINT_DATA=1)."""

    def __init__(self, dataset: MicrographDataset, crop: int, augment: bool = True):
        self.dataset = dataset
        self.crop = crop
        self.augment = augment
        self._np_rng = np.random.RandomState(0)

    def state_dict(self):
        """Flip-augment RNG state (resumable data plane)."""
        return {"flip_rng_state": self._np_rng.get_state()}

    def load_state_dict(self, sd) -> None:
        self._np_rng.set_state(sd["flip_rng_state"])

    def batch(self, packed_indices: np.ndarray) -> Dict[str, jnp.ndarray]:
        packed = np.asarray(packed_indices).reshape(-1)
        b = len(packed)
        inp = np.empty((b, self.crop, self.crop, 1), np.float32)
        target = np.empty((b,), np.float32)
        flips = (
            (self._np_rng.rand(b) < 0.5)
            if self.augment else np.zeros(b, bool)
        )
        for j, p in enumerate(packed):
            patch, label, _ = self.dataset.train_item(int(p))
            if flips[j]:
                patch = patch[:, ::-1]
            inp[j, :, :, 0] = patch
            target[j] = label
        return {"inp": jnp.asarray(inp), "target": jnp.asarray(target)}
