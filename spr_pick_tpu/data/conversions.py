"""Coordinate-format conversions (boxes / EMAN2 json / star columns).

Parity: `spr_pick/utils/conversions.py:8-91`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from spr_pick_tpu.data import star


def mirror_y_axis(coords: pd.DataFrame, n: int) -> pd.DataFrame:
    coords = coords.copy()
    coords["y_coord"] = n - 1 - coords["y_coord"]
    return coords


def boxes_to_coordinates(boxes, shape=None, invert_y=False, image_name=None):
    """EMAN box table (x_lo, y_lo, w, h) -> centre coordinates."""
    if len(boxes) < 1:
        columns = ["x_coord", "y_coord"]
        if image_name is not None:
            columns.append("image_name")
        return pd.DataFrame(columns=columns)

    x_lo, y_lo, width, height = (boxes[:, i] for i in range(4))
    x_coord = x_lo + width // 2
    y_coord = y_lo + height // 2
    if invert_y:
        y_coord = (shape[0] - 1 - y_lo) - height // 2

    coords = np.stack([x_coord, y_coord], axis=1)
    if image_name is not None:
        coords = pd.DataFrame(coords, columns=["x_coord", "y_coord"])
        coords.insert(0, "image_name", [image_name] * len(coords))
    return coords


def coordinates_to_boxes(coords, box_width, box_height, shape=None, invert_y=False):
    x = np.asarray(coords[:, 0])
    y = np.asarray(coords[:, 1])
    if invert_y:
        y = shape[0] - 1 - y
    w = np.full(len(x), box_width, dtype=np.int32)
    h = np.full(len(x), box_height, dtype=np.int32)
    return np.stack([x - w // 2, y - h // 2, w, h], axis=1)


def coordinates_to_eman2_json(coords, shape=None, invert_y=False, tag="manual"):
    x = np.asarray(coords[:, 0])
    y = np.asarray(coords[:, 1])
    if invert_y:
        y = shape[0] - 1 - y
    return [[int(xi), int(yi), tag] for xi, yi in zip(x, y)]


_STAR_RENAMES = {
    "score": star.SCORE_COLUMN_NAME,
    "image_name": "MicrographName",
    "x_coord": star.X_COLUMN_NAME,
    "y_coord": star.Y_COLUMN_NAME,
    "voltage": star.VOLTAGE,
    "detector_pixel_size": star.DETECTOR_PIXEL_SIZE,
    "magnification": star.MAGNIFICATION,
    "amplitude_contrast": star.AMPLITUDE_CONTRAST,
}


def coordinates_to_star(table: pd.DataFrame, image_ext: str = "") -> pd.DataFrame:
    table = table.copy()
    for k, v in _STAR_RENAMES.items():
        if k in table.columns:
            table[v] = table[k]
            table = table.drop(k, axis=1)
    table["MicrographName"] = table["MicrographName"].apply(lambda x: x + image_ext)
    return table
