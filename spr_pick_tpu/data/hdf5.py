"""HDF5 image dataset (dataset_tool_h5.py format: 'images' + 'shapes').

Parity: `spr_pick/datasets/hdf5.py:19-107`.  h5py is optional in this image;
the loader degrades with a clear error if it is missing.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class HDF5Dataset:
    def __init__(self, path: str, channels: int = 1):
        try:
            import h5py  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "h5py is required for HDF5 datasets but is not installed"
            ) from e
        import h5py

        self.path = path
        self.channels = channels
        self._file = h5py.File(path, "r")
        self.images = self._file["images"]
        self.shapes = self._file.get("shapes")

    def __len__(self) -> int:
        return len(self.images)

    def name(self, index: int) -> str:
        return f"{index:06d}"

    def __getitem__(self, index: int) -> np.ndarray:
        img = np.asarray(self.images[index], dtype=np.float32)
        if self.shapes is not None:
            h, w = self.shapes[index][:2]
            img = img.reshape(-1)[: h * w].reshape(h, w)
        # Normalisation is decided by the STORED dtype, not a per-image
        # value heuristic (a near-black uint8 frame would skip a
        # max()>1.5 test and enter at 255x its siblings' scale).  The
        # reference divides unconditionally via PIL to_tensor — same
        # behaviour for integer-stored datasets; float-stored data is
        # assumed already in [0, 1].
        if np.issubdtype(self.images.dtype, np.integer):
            img = img / 255.0
        return img

    def image_size(self, index: int) -> Tuple[int, int]:
        if self.shapes is not None:
            h, w = self.shapes[index][:2]
            return int(h), int(w)
        return self.images[index].shape[:2]

    def close(self):
        self._file.close()
