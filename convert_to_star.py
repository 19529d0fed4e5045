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

from spr_pick_tpu.data.star_export import convert


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

    try:
        n = convert(args.scores_dir, args.output, args.threshold,
                    args.scale, args.borders)
    except FileNotFoundError as exc:
        raise SystemExit(str(exc))
    print(f"wrote {n} particles to {args.output}")


if __name__ == "__main__":
    main()
