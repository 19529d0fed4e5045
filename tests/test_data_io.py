"""I/O layer tests: MRC round-trip, normalisation, coordinate tables, star."""

import io
import os

import numpy as np
import pandas as pd
import pytest

from spr_pick_tpu.data import mrc, star
from spr_pick_tpu.data import files as file_utils
from spr_pick_tpu.data.loader import load_mrc, minmax_quantize_u8, unquantize, quantize


def test_mrc_roundtrip(tmp_path, rng):
    arr = rng.randn(64, 80).astype(np.float32)
    path = str(tmp_path / "test.mrc")
    mrc.write(path, arr)
    out, header, ext = mrc.read(path)
    np.testing.assert_array_equal(out, arr)
    assert int(header["nx"]) == 80
    assert int(header["ny"]) == 64
    assert int(header["mode"]) == 2
    assert ext == b""


def test_mrc_modes(tmp_path, rng):
    for dtype in (np.int8, np.int16, np.uint16):
        arr = (rng.rand(8, 8) * 100).astype(dtype)
        header = mrc.make_header((1, 8, 8), dtype=dtype)
        buf = io.BytesIO()
        buf.write(np.asarray(header, dtype=mrc.HEADER_DTYPE).tobytes())
        buf.write(arr.tobytes())
        out, h, _ = mrc.parse(buf.getvalue())
        np.testing.assert_array_equal(out, arr)


def test_mrc_normalization(tmp_path, rng):
    """load_mrc must reproduce min-max -> *255 -> uint8 truncate -> /255."""
    arr = rng.randn(32, 32).astype(np.float32)
    path = str(tmp_path / "n.mrc")
    mrc.write(path, arr)
    img = load_mrc(path)
    lo, hi = arr.min(), arr.max()
    expect = (((arr - lo) / (hi - lo)) * 255).astype(np.uint8).astype(np.float32) / 255
    np.testing.assert_allclose(img, expect)
    assert img.min() >= 0 and img.max() <= 1


def test_quantize_unquantize_roundtrip(rng):
    x = rng.randn(16, 16).astype(np.float32)
    q = quantize(x)
    u = unquantize(q)
    assert np.abs(u - np.clip(x, -3, 3)).max() < 6 / 255 + 1e-6


def test_coord_txt_roundtrip(tmp_path):
    table = pd.DataFrame(
        {
            "image_name": ["mic1", "mic1", "mic2"],
            "x_coord": [10, 200, 42],
            "y_coord": [20, 100, 77],
            "score": [0.9, 0.5, 0.13],
        }
    )
    path = str(tmp_path / "coords.txt")
    file_utils.write_coordinates(path, table)
    out = file_utils.read_coordinates(path)
    pd.testing.assert_frame_equal(out, table)


def test_star_roundtrip(tmp_path):
    table = pd.DataFrame(
        {
            "image_name": ["mic1", "mic2"],
            "x_coord": [10, 42],
            "y_coord": [20, 77],
            "score": [0.9, 0.13],
        }
    )
    path = str(tmp_path / "coords.star")
    file_utils.write_coordinates(path, table, format="star")
    text = open(path).read()
    assert "data_images" in text and "loop_" in text and "_rlnCoordinateX" in text
    out = file_utils.read_coordinates(path)
    assert list(out.x_coord) == [10, 42]
    assert list(out.y_coord) == [20, 77]
    assert list(out.image_name) == ["mic1", "mic2"]
    np.testing.assert_allclose(out.score, [0.9, 0.13])


def test_box_roundtrip(tmp_path):
    table = pd.DataFrame(
        {"image_name": ["m", "m"], "x_coord": [50, 70], "y_coord": [60, 80]}
    )
    file_utils.write_coordinates(str(tmp_path), table, format="box", boxsize=20)
    out = file_utils.read_coordinates(str(tmp_path / "m.box"))
    assert list(out.x_coord) == [50, 70]
    assert list(out.y_coord) == [60, 80]


def test_eman2_json(tmp_path):
    table = pd.DataFrame(
        {"image_name": ["m"], "x_coord": [50], "y_coord": [60]}
    )
    file_utils.write_coordinates(str(tmp_path), table, format="json")
    import json

    data = json.load(open(tmp_path / "m_info.json"))
    assert data["boxes"] == [[50, 60, "manual"]]


def test_old_star_score_column(tmp_path):
    path = tmp_path / "old.star"
    path.write_text(
        "data_images\nloop_\n_rlnMicrographName #1\n_rlnCoordinateX #2\n"
        "_rlnCoordinateY #3\n_rlnParticleScore #4\nmic1.mrc\t5\t6\t0.5\n"
    )
    out = file_utils.read_coordinates(str(path))
    assert "score" in out.columns
    np.testing.assert_allclose(out.score, [0.5])
