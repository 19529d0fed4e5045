"""Format-sniffing coordinate table I/O.

Parity: `spr_pick/utils/files.py:13-234` — .star / .box (EMAN) / .json
(EMAN2) / .csv (VIA) / .txt|.tab TSV readers + writers.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pandas as pd

from spr_pick_tpu.data import star
from spr_pick_tpu.data.conversions import (
    boxes_to_coordinates,
    coordinates_to_boxes,
    coordinates_to_eman2_json,
    coordinates_to_star,
)

PARTICLE_FORMAT_MAP = {
    ".star": "star",
    ".box": "box",
    ".json": "json",
    ".csv": "csv",
    ".txt": "coord",
    ".tab": "coord",
}


class UnknownFormatError(Exception):
    def __init__(self, ext):
        super().__init__(f"Unknown coordinate format: {ext}")
        self.ext = ext


def detect_format(path: str) -> str:
    _, ext = os.path.splitext(path)
    if ext not in PARTICLE_FORMAT_MAP:
        raise UnknownFormatError(ext)
    return PARTICLE_FORMAT_MAP[ext]


def strip_ext(name: str) -> str:
    return os.path.splitext(name)[0]


def read_box(path: str) -> np.ndarray:
    rows = []
    with open(path) as f:
        for line in f:
            if line.strip():
                tokens = line.split()
                rows.append([int(t) for t in tokens[:4]])
    return np.array(rows, dtype=int)


def read_via_csv(path: str) -> pd.DataFrame:
    """VIA-format CSV with region_shape_attributes dicts."""
    table = pd.read_csv(path)
    table["image_name"] = table["filename"].apply(strip_ext)
    table = table.drop("filename", axis=1)
    table = table.loc[table["region_count"] > 0]

    regions = table["region_shape_attributes"]
    x_coord = np.zeros(len(table), dtype=int)
    y_coord = np.zeros(len(table), dtype=int)
    for i in range(len(regions)):
        region = json.loads(regions.iloc[i])
        x_coord[i] = region["cx"]
        y_coord[i] = region["cy"]

    scores: Optional[np.ndarray] = None
    attributes = table["region_attributes"]
    if len(table) > 0:
        att = json.loads(attributes.iloc[0])
        if "score" in att:
            scores = np.full(len(table), -np.inf, dtype=np.float32)
            for i in range(len(attributes)):
                att = json.loads(attributes.iloc[i])
                if "score" in att:
                    scores[i] = float(att["score"])

    table = table.drop(
        [
            "file_size",
            "file_attributes",
            "region_count",
            "region_id",
            "region_shape_attributes",
            "region_attributes",
        ],
        axis=1,
    )
    table["x_coord"] = x_coord
    table["y_coord"] = y_coord
    if scores is not None:
        table["score"] = scores
    return table


def write_via_csv(path, table: pd.DataFrame):
    filename = table["image_name"].apply(lambda x: x + ".png")
    via = pd.DataFrame({"filename": filename})
    via["file_size"] = -1
    via["file_attributes"] = "{}"
    via["region_count"] = 0
    via["region_id"] = 0
    for im, group in table.groupby("image_name"):
        where = via["filename"] == im + ".png"
        via.loc[where, "region_count"] = len(group)
        via.loc[where, "region_id"] = np.arange(len(group))

    via["region_shape_attributes"] = [
        '{{"name":"point","cx":{},"cy":{}}}'.format(
            table["x_coord"].iloc[i], table["y_coord"].iloc[i]
        )
        for i in range(len(table))
    ]
    if "score" in table.columns:
        via["region_attributes"] = [
            '{{"score":"{}"}}'.format(table["score"].iloc[i])
            for i in range(len(table))
        ]
    else:
        via["region_attributes"] = "{}"
    via.to_csv(path, index=False)


def read_coordinates(path: str, format: str = "auto") -> pd.DataFrame:
    if format == "auto":
        format = detect_format(path)

    if format == "star":
        with open(path) as f:
            table = star.parse(f)
        renames = {
            star.SCORE_COLUMN_NAME: "score",
            "MicrographName": "image_name",
            star.X_COLUMN_NAME: "x_coord",
            star.Y_COLUMN_NAME: "y_coord",
            star.VOLTAGE: "voltage",
            star.DETECTOR_PIXEL_SIZE: "detector_pixel_size",
            star.MAGNIFICATION: "magnification",
            star.AMPLITUDE_CONTRAST: "amplitude_contrast",
        }
        for k, v in renames.items():
            if k in table.columns:
                table[v] = table[k]
                table = table.drop(k, axis=1)
        table["image_name"] = table["image_name"].apply(strip_ext)
        return table
    elif format == "box":
        box = read_box(path)
        image_name = os.path.basename(strip_ext(path))
        return boxes_to_coordinates(box, image_name=image_name)
    elif format == "csv":
        return read_via_csv(path)
    else:
        return pd.read_csv(path, sep="\t")


def write_coordinates(
    path: str,
    table: pd.DataFrame,
    format: str = "auto",
    boxsize: int = 0,
    image_ext: str = ".mrc",
    suffix: str = "",
):
    if format in ("box", "json"):
        for image_name, group in table.groupby("image_name"):
            if format == "box":
                this_path = os.path.join(path, image_name + suffix + ".box")
                xy = group[["x_coord", "y_coord"]].values.astype(np.int32)
                boxes = pd.DataFrame(coordinates_to_boxes(xy, boxsize, boxsize))
                boxes.to_csv(this_path, sep="\t", header=False, index=False)
            else:
                this_path = os.path.join(path, image_name + suffix + "_info.json")
                xy = group[["x_coord", "y_coord"]].values.astype(int)
                with open(this_path, "w") as f:
                    json.dump({"boxes": coordinates_to_eman2_json(xy)}, f, indent=0)
    elif format == "star":
        table = coordinates_to_star(table, image_ext=image_ext)
        with open(path, "w") as f:
            star.write(table, f)
    elif format == "csv":
        write_via_csv(path, table)
    else:
        columns = ["image_name", "x_coord", "y_coord"]
        if "score" in table.columns:
            columns.append("score")
        table[columns].to_csv(path, sep="\t", index=False)
