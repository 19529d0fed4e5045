"""Scores -> RELION .star export (reference convert_to_star.py parity).

Reference behaviour (/root/reference/convert_to_star.py): concatenate all
`*_scores.txt`, keep score > 0.13, multiply coordinates by 4 (undoing the
8x->2x binning ratio) and truncate to int, optional post-scale border
keep-window.  Exposed as spr_pick_tpu.data.star_export.convert, the root
convert_to_star.py CLI and the eval --export_star flag.
"""

import os

import numpy as np
import pytest

from spr_pick_tpu.data import star
from spr_pick_tpu.data.star_export import convert


def _write_scores(path, rows):
    with open(path, "w") as f:
        f.write("image_name\tx_coord\ty_coord\tscore\n")
        for name, x, y, s in rows:
            f.write(f"{name}\t{x}\t{y}\t{s}\n")


def test_convert_threshold_scale_and_roundtrip(tmp_path):
    _write_scores(tmp_path / "a_scores.txt", [
        ("mic0", 10, 20, 0.5),
        ("mic0", 30, 40, 0.10),   # below threshold -> dropped
    ])
    _write_scores(tmp_path / "b_scores.txt", [
        ("mic1", 7, 9, 0.99),
    ])
    out = str(tmp_path / "particles.star")
    n = convert(str(tmp_path), out, threshold=0.13, scale=4.0)
    assert n == 2

    with open(out) as f:
        table = star.parse(f)
    assert list(table["MicrographName"]) == ["mic0", "mic1"]
    # x4 upscale, int truncation
    assert list(table[star.X_COLUMN_NAME]) == [40, 28]
    assert list(table[star.Y_COLUMN_NAME]) == [80, 36]
    np.testing.assert_allclose(
        table[star.SCORE_COLUMN_NAME].astype(float), [0.5, 0.99]
    )


def test_convert_borders_applied_after_scale(tmp_path):
    _write_scores(tmp_path / "a_scores.txt", [
        ("mic0", 2, 50, 0.9),    # x*4 = 8 <= xmin 8 -> dropped (strict >)
        ("mic0", 3, 50, 0.9),    # x*4 = 12, inside
        ("mic0", 100, 50, 0.9),  # x*4 = 400 >= xmax 400 -> dropped
    ])
    out = str(tmp_path / "p.star")
    n = convert(str(tmp_path), out, threshold=0.0, scale=4.0,
                borders=(8, 400, 0, 1000))
    assert n == 1
    with open(out) as f:
        table = star.parse(f)
    assert list(table[star.X_COLUMN_NAME]) == [12]


def test_convert_missing_scores_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        convert(str(tmp_path), str(tmp_path / "o.star"))


def test_frame_to_star_matches_convert(tmp_path):
    """The in-memory entry point (used by `joint pick`) is the same
    conversion as the scores-dir reader, and does not mutate its input."""
    import pandas as pd

    from spr_pick_tpu.data.star_export import frame_to_star

    rows = [("mic0", 10, 20, 0.5), ("mic0", 30, 40, 0.10), ("mic1", 7, 9, 0.99)]
    _write_scores(tmp_path / "a_scores.txt", rows)
    out_dir = str(tmp_path / "via_dir.star")
    n_dir = convert(str(tmp_path), out_dir)

    table = pd.DataFrame(
        rows, columns=["image_name", "x_coord", "y_coord", "score"]
    )
    before = table.copy()
    out_mem = str(tmp_path / "via_frame.star")
    n_mem = frame_to_star(table, out_mem)
    pd.testing.assert_frame_equal(table, before)  # input untouched

    assert n_mem == n_dir == 2
    with open(out_dir) as f1, open(out_mem) as f2:
        assert f1.read() == f2.read()


def test_eval_parser_accepts_export_star():
    from spr_pick_tpu.cli.cli import build_parser

    parser = build_parser()
    base = ["eval", "-m", "m.wt", "-d", "imgs.txt"]
    args = vars(parser.parse_args(base))
    assert args["export_star"] is None  # off by default

    args = vars(parser.parse_args(base + ["--export_star"]))
    assert args["export_star"] == "particles.star"  # bare flag -> default name

    args = vars(parser.parse_args(
        base + ["--export_star", "/out/p.star",
                "--star_threshold", "0.2", "--star_scale", "2",
                "--star_borders", "15", "1425", "15", "1009"]
    ))
    assert args["export_star"] == "/out/p.star"
    assert args["star_threshold"] == 0.2
    assert args["star_scale"] == 2.0
    assert args["star_borders"] == [15, 1425, 15, 1009]


def test_run_eval_exports_star(tmp_path, monkeypatch):
    """run_eval with --export_star aggregates the run's eval_imgs scores
    into a .star inside the run dir (evaluator stubbed: export is host-side
    plumbing, the dense path is covered elsewhere)."""
    from spr_pick_tpu.cli import cli as cli_mod

    run_dir = tmp_path / "00000-eval-x"
    eval_imgs = run_dir / "eval_imgs"
    eval_imgs.mkdir(parents=True)
    _write_scores(eval_imgs / "mic0_00000001_scores.txt",
                  [("mic0", 5, 6, 0.9)])

    class StubEvaluator:
        run_dir_path = str(run_dir)

        def __init__(self, *a, **k):
            pass

        def set_test_data(self, *_):
            pass

        def evaluate(self):
            pass

    monkeypatch.setattr(
        "spr_pick_tpu.eval.DenoiserEvaluator", StubEvaluator
    )
    cli_mod.start([
        "eval", "-m", "m.wt", "-d", "imgs.txt", "--export_star",
    ])
    out = run_dir / "particles.star"
    assert out.exists()
    with open(out) as f:
        table = star.parse(f)
    assert list(table[star.X_COLUMN_NAME]) == [20]


def test_run_eval_export_star_clean_error_when_no_scores(tmp_path, monkeypatch):
    """A run that produced no *_scores.txt (e.g. denoise-only model) must
    exit with a clear message, not an unhandled traceback after eval."""
    from spr_pick_tpu.cli import cli as cli_mod

    run_dir = tmp_path / "00000-eval-x"
    (run_dir / "eval_imgs").mkdir(parents=True)

    class StubEvaluator:
        run_dir_path = str(run_dir)

        def __init__(self, *a, **k):
            pass

        def set_test_data(self, *_):
            pass

        def evaluate(self):
            pass

    monkeypatch.setattr("spr_pick_tpu.eval.DenoiserEvaluator", StubEvaluator)
    with pytest.raises(SystemExit, match="export_star"):
        cli_mod.start(["eval", "-m", "m.wt", "-d", "i.txt", "--export_star"])
