#!/usr/bin/env python
"""Generate training manifest TSVs (`*_images.txt` / `*_coords.txt`).

The reference README documents a `generate_train_files.py` helper that is
missing from its repo (README.md:35-39; SURVEY.md §7.4) — this provides it:
scan a micrograph directory + a coordinate file/directory and emit the TSV
manifests `joint train` consumes.

    python generate_train_files.py micrographs/ coords.star -o data/train
    # -> data/train_images.txt  (image_name<TAB>path)
    # -> data/train_coords.txt  (image_name<TAB>x_coord<TAB>y_coord)
"""

from __future__ import annotations

import argparse
import glob
import os

import pandas as pd

from spr_pick_tpu.data import files as file_utils

IMAGE_EXTS = (".mrc", ".tiff", ".tif", ".png")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image_dir", help="Directory of micrographs (.mrc/.tiff/.png)")
    p.add_argument("coords", help="Coordinate file (.star/.box/.csv/.txt) or directory of per-image files")
    p.add_argument("-o", "--output-prefix", default="train",
                   help="Output prefix; writes {prefix}_images.txt and {prefix}_coords.txt")
    p.add_argument("--scale", type=float, default=1.0,
                   help="Divide coordinates by this factor (e.g. 4 for 8x->2x binning)")
    args = p.parse_args()

    rows = []
    for path in sorted(glob.glob(os.path.join(args.image_dir, "*"))):
        name, ext = os.path.splitext(os.path.basename(path))
        if ext.lower() in IMAGE_EXTS:
            rows.append({"image_name": name, "path": os.path.abspath(path)})
    if not rows:
        raise SystemExit(f"no micrographs found in {args.image_dir}")
    images = pd.DataFrame(rows)

    if os.path.isdir(args.coords):
        tables = [
            file_utils.read_coordinates(p)
            for p in sorted(glob.glob(os.path.join(args.coords, "*")))
            if os.path.splitext(p)[1] in file_utils.PARTICLE_FORMAT_MAP
        ]
        coords = pd.concat(tables, ignore_index=True)
    else:
        coords = file_utils.read_coordinates(args.coords)

    if args.scale != 1.0:
        coords["x_coord"] = (coords["x_coord"] / args.scale).astype(int)
        coords["y_coord"] = (coords["y_coord"] / args.scale).astype(int)

    known = set(images.image_name)
    missing = sorted(set(coords.image_name) - known)
    if missing:
        print(f"warning: {len(missing)} coordinate image(s) have no micrograph: "
              f"{missing[:5]}{'...' if len(missing) > 5 else ''}")
    coords = coords[coords.image_name.isin(known)]

    img_path = args.output_prefix + "_images.txt"
    coord_path = args.output_prefix + "_coords.txt"
    os.makedirs(os.path.dirname(os.path.abspath(img_path)), exist_ok=True)
    images.to_csv(img_path, sep="\t", index=False)
    coords[["image_name", "x_coord", "y_coord"]].to_csv(coord_path, sep="\t", index=False)
    print(f"wrote {len(images)} micrographs -> {img_path}")
    print(f"wrote {len(coords)} coordinates -> {coord_path}")


if __name__ == "__main__":
    main()
