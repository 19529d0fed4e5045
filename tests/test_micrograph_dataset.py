"""MicrographDataset loading edge cases.

Covers the reference bugs this framework fixes rather than ports
(SURVEY.md §7.4 policy): one-sided `source` columns, multi-source test
indexing, extreme-aspect square padding, directory extension filtering,
and dtype-driven HDF5 normalisation.
"""

import os

import numpy as np
import pytest

from spr_pick_tpu.data import mrc
from spr_pick_tpu.data.micrograph import (
    MicrographDataset,
    _image_table,
    pad_to_multiple,
)


def _write_mics(tmp_path, rng, names, size=256):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)
    rows = []
    for name in names:
        p = str(img_dir / f"{name}.mrc")
        mrc.write(p, rng.rand(size, size).astype(np.float32))
        rows.append(f"{name}\t{p}")
    manifest = tmp_path / "images.txt"
    manifest.write_text("image_name\tpath\n" + "\n".join(rows) + "\n")
    return str(manifest)


def test_pad_to_multiple_square_extreme_aspect(rng):
    """np.pad(mode='reflect') caps the pad below the dim; square-padding
    an aspect-ratio >= 2 micrograph must not crash (reference would)."""
    img = rng.rand(40, 100).astype(np.float32)
    padded, shape = pad_to_multiple(img, 32, square=True)
    assert shape == (40, 100)
    assert padded.shape == (128, 128)
    np.testing.assert_array_equal(padded[:40, :100], img)
    # First reflect pass mirrors rows 38, 37, ... below row 39.
    np.testing.assert_array_equal(padded[40, :100], img[38])
    # Degenerate 1-px dim falls back to edge replication.
    one = rng.rand(1, 100).astype(np.float32)
    padded1, _ = pad_to_multiple(one, 32, square=True)
    assert padded1.shape == (128, 128)
    np.testing.assert_array_equal(padded1[77, :100], one[0])


def test_source_column_in_coords_only(tmp_path, rng):
    """A coordinate table carrying `source` alongside a plain image
    manifest loads (the reference defaults the column only when BOTH
    tables lack it and crashes otherwise)."""
    manifest = _write_mics(tmp_path, rng, ["mic0"])
    coords = tmp_path / "coords.txt"
    coords.write_text(
        "image_name\tx_coord\ty_coord\tsource\nmic0\t100\t120\t0\n"
    )
    ds = MicrographDataset(manifest, str(coords), verbose=False)
    assert ds.num_images == 1
    assert len(ds.coords[0][0]) == 1


def test_multi_source_test_item_spans_groups(tmp_path, rng):
    """test_item must resolve indices across ALL source groups (the
    reference indexes group 0 only, micrograph.py:129)."""
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i, src in enumerate([0, 0, 1]):
        p = str(img_dir / f"mic{i}.mrc")
        mrc.write(p, rng.rand(128, 128).astype(np.float32))
        rows.append(f"mic{i}\t{p}\t{src}")
    manifest = tmp_path / "images.txt"
    manifest.write_text("image_name\tpath\tsource\n" + "\n".join(rows) + "\n")
    coords = tmp_path / "coords.txt"
    coords.write_text(
        "image_name\tx_coord\ty_coord\tsource\n"
        "mic0\t50\t60\t0\nmic2\t70\t80\t1\n"
    )
    ds = MicrographDataset(manifest, str(coords), verbose=False)
    assert ds.num_images == 3
    names = {ds.test_item(i)["name"] for i in range(len(ds))}
    assert names == {"mic0", "mic1", "mic2"}


def test_image_table_extensions_and_empty_dir(tmp_path, rng):
    """Directory discovery shares the loader's IMAGE_EXTS (.tif included)
    and an imageless directory raises instead of a silent empty dataset."""
    d = tmp_path / "mics"
    d.mkdir()
    try:
        from PIL import Image

        arr = (rng.rand(32, 32) * 255).astype(np.uint8)
        Image.fromarray(arr).save(str(d / "a.tif"))
        Image.fromarray(arr).save(str(d / "b.png"))
    except ImportError:
        mrc.write(str(d / "a.mrc"), rng.rand(32, 32).astype(np.float32))
    (d / "notes.txt").write_text("not an image\n")
    table = _image_table(str(d))
    assert len(table) >= 2 or "a" in set(table.image_name)
    assert "notes" not in set(table.image_name)

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no images"):
        _image_table(str(empty))


def test_hdf5_normalisation_by_dtype(tmp_path):
    """uint8-stored HDF5 images divide by 255 unconditionally (dtype
    decides, not a per-image max heuristic that left near-black frames
    at 255x scale); float-stored images pass through."""
    h5py = pytest.importorskip("h5py")
    from spr_pick_tpu.data.hdf5 import HDF5Dataset

    path = str(tmp_path / "ds.h5")
    with h5py.File(path, "w") as f:
        imgs = np.zeros((2, 16, 16), np.uint8)
        imgs[0] = 200
        imgs[1] = 1  # near-black: the old max()>1.5 heuristic skipped /255
        f.create_dataset("images", data=imgs)
    ds = HDF5Dataset(path)
    np.testing.assert_allclose(ds[0], 200 / 255, rtol=1e-6)
    np.testing.assert_allclose(ds[1], 1 / 255, rtol=1e-6)
    ds.close()

    path_f = str(tmp_path / "ds_f.h5")
    with h5py.File(path_f, "w") as f:
        f.create_dataset("images", data=np.full((1, 8, 8), 0.5, np.float32))
    ds_f = HDF5Dataset(path_f)
    np.testing.assert_allclose(ds_f[0], 0.5)
    ds_f.close()
