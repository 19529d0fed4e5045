"""Aggregate evaluator `*_scores.txt` picks into a RELION .star file.

Parity: `/root/reference/convert_to_star.py` — score threshold (0.13),
coordinate upscale (x4, undoing the reference's 8x->2x binning ratio) and
optional post-scale border filter — generalised from the reference's
hardcoded paths.  Exposed both as the root `convert_to_star.py` CLI and as
the eval `--export_star` flag (one-command eval -> picks -> star).
"""

from __future__ import annotations

import glob
import os

import pandas as pd

from spr_pick_tpu.data import star


def convert(scores_dir: str, output: str, threshold: float = 0.13,
            scale: float = 4.0, borders=None) -> int:
    """Write all `scores_dir/*_scores.txt` picks above `threshold` to a
    .star at `output`; returns the number of particles written.

    `borders`: optional (xmin, xmax, ymin, ymax) keep-window applied AFTER
    scaling (the reference run used 15 1425 15 1009).
    """
    frames = []
    for path in sorted(glob.glob(os.path.join(scores_dir, "*_scores.txt"))):
        frames.append(pd.read_csv(path, sep="\t"))
    if not frames:
        raise FileNotFoundError(f"no *_scores.txt files found in {scores_dir}")
    return frame_to_star(
        pd.concat(frames, ignore_index=True), output,
        threshold=threshold, scale=scale, borders=borders,
    )


def frame_to_star(table: pd.DataFrame, output: str, threshold: float = 0.13,
                  scale: float = 4.0, borders=None) -> int:
    """Same star conversion, from an in-memory picks table
    (image_name/x_coord/y_coord/score — the `_scores.txt` schema, as
    produced by :meth:`spr_pick_tpu.api.Picker.pick_many`)."""
    table = table.copy()
    table = table[table["score"] > threshold]
    table["x_coord"] = (table["x_coord"] * scale).astype(int)
    table["y_coord"] = (table["y_coord"] * scale).astype(int)
    if borders is not None:
        xmin, xmax, ymin, ymax = borders
        table = table[
            (table.x_coord > xmin) & (table.x_coord < xmax)
            & (table.y_coord > ymin) & (table.y_coord < ymax)
        ]

    out = pd.DataFrame(
        {
            "MicrographName": table["image_name"],
            star.X_COLUMN_NAME: table["x_coord"],
            star.Y_COLUMN_NAME: table["y_coord"],
            star.SCORE_COLUMN_NAME: table["score"],
        }
    )
    with open(output, "w") as f:
        star.write(out, f)
    return len(out)
