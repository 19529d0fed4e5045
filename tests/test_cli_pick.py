"""`joint pick` subcommand (CLI front-end of the Picker API).

The reference has no one-command picking path: picking means a full eval
run with run dirs + artifact dumps.  `joint pick` must (a) reproduce the
Picker API's picks exactly, (b) accept paths / manifests / directories,
(c) write the `_scores.txt` TSV schema or a RELION .star by extension.
"""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from spr_pick_tpu.cli import cli
from tests.test_api import _train_tiny_joint


@pytest.mark.slow
def test_pick_cli_matches_api(tmp_path, rng):
    from spr_pick_tpu.api import Picker
    from spr_pick_tpu.data import mrc, star

    wt, images_txt = _train_tiny_joint(tmp_path, rng, zero_sigma_head=False)
    manifest = pd.read_csv(images_txt, sep="\t")
    mic_path = manifest["path"][0]
    mic_name = str(manifest["image_name"][0])

    expected = Picker(wt).pick(mic_path)

    # --- TSV output from a plain path ---
    out_txt = str(tmp_path / "picks.txt")
    cli.start(["pick", "-m", wt, mic_path, "-o", out_txt])
    got = pd.read_csv(out_txt, sep="\t")
    assert list(got.columns) == ["image_name", "x_coord", "y_coord", "score"]
    pd.testing.assert_frame_equal(
        got, expected, check_dtype=False, atol=1e-6,
    )

    # --- .star output by extension (threshold 0 keeps all, scale 2) ---
    out_star = str(tmp_path / "picks.star")
    cli.start([
        "pick", "-m", wt, mic_path, "-o", out_star,
        "--star_threshold", "0.0", "--star_scale", "2",
    ])
    with open(out_star) as f:
        table = star.parse(f)
    assert len(table) == len(expected)
    np.testing.assert_array_equal(
        np.sort(table[star.X_COLUMN_NAME].astype(int).to_numpy()),
        np.sort((expected.x_coord * 2).astype(int).to_numpy()),
    )

    # --- manifest input: names come from the image_name column ---
    out_manifest = str(tmp_path / "picks_manifest.txt")
    cli.start(["pick", "-m", wt, images_txt, "-o", out_manifest])
    got_m = pd.read_csv(out_manifest, sep="\t")
    assert set(got_m.image_name) == {mic_name}
    assert len(got_m) == len(expected)

    # --- directory input: basename names, recursive discovery ---
    mic_dir = tmp_path / "mics"
    mic_dir.mkdir()
    shutil.copy(mic_path, mic_dir / "copy_a.mrc")
    out_dir_picks = str(tmp_path / "picks_dir.txt")
    cli.start(["pick", "-m", wt, str(mic_dir), "-o", out_dir_picks])
    got_d = pd.read_csv(out_dir_picks, sep="\t")
    assert set(got_d.image_name) == {"copy_a"}
    np.testing.assert_array_equal(
        np.sort(got_d.x_coord.to_numpy()), np.sort(expected.x_coord.to_numpy())
    )

    # --- denoised outputs (mrc float32, original shape) ---
    den_dir = tmp_path / "denoised"
    cli.start([
        "pick", "-m", wt, mic_path, "-o", str(tmp_path / "p2.txt"),
        "--denoise_dir", str(den_dir),
    ])
    den_path = den_dir / (os.path.splitext(os.path.basename(mic_path))[0] + ".mrc")
    assert den_path.exists()
    den = mrc.read(str(den_path))[0]
    orig = mrc.read(mic_path)[0]
    assert den.shape == orig.shape
    assert np.isfinite(den).all()
    # The single-forward process() path writes the same picks.
    got_p = pd.read_csv(tmp_path / "p2.txt", sep="\t")
    pd.testing.assert_frame_equal(got_p, expected, check_dtype=False, atol=1e-6)


def test_expand_pick_inputs_errors(tmp_path):
    # Manifest without a path column is a clean CLI error, not a traceback.
    bad = tmp_path / "bad.txt"
    bad.write_text("image_name\tnot_path\na\tb\n")
    with pytest.raises(SystemExit):
        cli._expand_pick_inputs([str(bad)])
    # Empty directory is a clean error too.
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit):
        cli._expand_pick_inputs([str(empty)])


def test_expand_pick_inputs_dedups_duplicate_names(tmp_path):
    # dirA/mic1.mrc + dirB/mic1.mrc would clobber each other's
    # --denoise_dir output and merge picks rows under one image_name;
    # names are suffixed deterministically instead.
    import numpy as np

    from spr_pick_tpu.data import mrc

    img = np.zeros((8, 8), np.float32)
    dirs = []
    for d in ("a", "b", "c"):
        sub = tmp_path / d
        sub.mkdir()
        mrc.write(str(sub / "mic1.mrc"), img)
        dirs.append(str(sub))
    mrc.write(str(tmp_path / "a" / "other.mrc"), img)

    paths, names = cli._expand_pick_inputs(dirs)
    assert len(paths) == 4
    assert sorted(names) == ["mic1", "mic1-2", "mic1-3", "other"]
    # Alignment preserved: each name still corresponds to its path's dir.
    by_name = dict(zip(names, paths))
    assert by_name["mic1"].startswith(str(tmp_path / "a"))
    assert by_name["mic1-2"].startswith(str(tmp_path / "b"))
    assert by_name["mic1-3"].startswith(str(tmp_path / "c"))
