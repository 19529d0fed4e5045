#!/usr/bin/env python
"""Aggregate `*_scores.txt` picks into a RELION .star file.

Parity: `/root/reference/convert_to_star.py` — threshold + border filter +
coordinate upscale — generalised from the reference's hardcoded paths into a
proper CLI:

    python convert_to_star.py RUN_DIR/eval_imgs -o particles.star \
        --threshold 0.13 --scale 4

The reference multiplies coordinates by 4 (undoing its 8x->2x binning ratio)
and uses threshold 0.13 with borders x in (15, 1425), y in (15, 1009) on the
upscaled coords; defaults here reproduce that behaviour when --borders is
given.
"""

from __future__ import annotations

import argparse
import glob
import os

import pandas as pd

from spr_pick_tpu.data import star


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("scores_dir", help="Directory containing *_scores.txt files")
    p.add_argument("-o", "--output", default="particles.star")
    p.add_argument("--threshold", type=float, default=0.13)
    p.add_argument("--scale", type=float, default=4.0,
                   help="Coordinate upscale factor (binning undo)")
    p.add_argument("--borders", type=int, nargs=4, metavar=("XMIN", "XMAX", "YMIN", "YMAX"),
                   default=None, help="Keep picks with XMIN<x<XMAX and YMIN<y<YMAX "
                   "(applied after scaling); reference run used 15 1425 15 1009")
    args = p.parse_args()

    frames = []
    for path in sorted(glob.glob(os.path.join(args.scores_dir, "*_scores.txt"))):
        df = pd.read_csv(path, sep="\t")
        frames.append(df)
    if not frames:
        raise SystemExit(f"no *_scores.txt files found in {args.scores_dir}")
    table = pd.concat(frames, ignore_index=True)

    table = table[table["score"] > args.threshold]
    table["x_coord"] = (table["x_coord"] * args.scale).astype(int)
    table["y_coord"] = (table["y_coord"] * args.scale).astype(int)
    if args.borders is not None:
        xmin, xmax, ymin, ymax = args.borders
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
    with open(args.output, "w") as f:
        star.write(out, f)
    print(f"wrote {len(out)} particles to {args.output}")


if __name__ == "__main__":
    main()
