"""RELION STAR file parsing and writing.

Parity: `spr_pick/utils/star.py:15-97` — loop-block parser with the `rln`
prefix strip, typed columns, `ParticleScore` -> `AutopickFigureOfMerit`
upgrade, and the `_rln<name> #i` write format.
"""

from __future__ import annotations

import pandas as pd

X_COLUMN_NAME = "CoordinateX"
Y_COLUMN_NAME = "CoordinateY"
SCORE_COLUMN_NAME = "AutopickFigureOfMerit"
OLD_SCORE_COLUMN_NAME = "ParticleScore"

VOLTAGE = "Voltage"
DETECTOR_PIXEL_SIZE = "DetectorPixelSize"
MAGNIFICATION = "Magnification"
AMPLITUDE_CONTRAST = "AmplitudeContrast"

_FLOAT_COLS = (VOLTAGE, DETECTOR_PIXEL_SIZE, MAGNIFICATION, AMPLITUDE_CONTRAST)


def parse(f) -> pd.DataFrame:
    """Parse the first data_ block of a STAR file into a DataFrame."""
    lines = f.readlines()
    for i, line in enumerate(lines):
        if line.startswith("data_"):
            return _parse_body(lines[i + 1 :])
    return pd.DataFrame()


parse_star = parse


def _parse_body(lines) -> pd.DataFrame:
    # find loop_
    for i, line in enumerate(lines):
        if line.startswith("loop_"):
            lines = lines[i + 1 :]
            break

    header, lines = _parse_loop_header(lines)

    content = []
    for line in lines:
        line = line.strip()
        if line.startswith("data"):
            break
        if line.startswith("#") or line.startswith(";"):
            continue
        if line:
            content.append(line.split())

    table = pd.DataFrame(content, columns=header)

    if OLD_SCORE_COLUMN_NAME in table.columns and SCORE_COLUMN_NAME not in table.columns:
        table[SCORE_COLUMN_NAME] = table[OLD_SCORE_COLUMN_NAME]
        table = table.drop(OLD_SCORE_COLUMN_NAME, axis=1)

    if X_COLUMN_NAME in table:
        table[X_COLUMN_NAME] = table[X_COLUMN_NAME].astype(float).astype(int)
    if Y_COLUMN_NAME in table:
        table[Y_COLUMN_NAME] = table[Y_COLUMN_NAME].astype(float).astype(int)
    if SCORE_COLUMN_NAME in table:
        table[SCORE_COLUMN_NAME] = table[SCORE_COLUMN_NAME].astype(float)
    for col in _FLOAT_COLS:
        if col in table:
            table[col] = table[col].astype(float)
    return table


def _parse_loop_header(lines):
    columns = []
    i = 0
    for i, line in enumerate(lines):
        line = line.strip()
        if not line.startswith("_"):
            break
        name = line[1:]
        loc = name.find("#")
        if loc >= 0:
            name = name[:loc]
        if name.startswith("rln"):
            name = name[3:]
        columns.append(name.strip())
    return columns, lines[i:]


def write(table: pd.DataFrame, f):
    """Write `data_images` / `loop_` block with _rln-prefixed columns."""
    print("data_images", file=f)
    print("loop_", file=f)
    for i, name in enumerate(table.columns):
        print("_rln" + name + " #" + str(i + 1), file=f)
    table.to_csv(f, sep="\t", index=False, header=False)
