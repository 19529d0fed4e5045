"""The examples/quickstart.py walkthrough must actually run end-to-end:
synthesize -> train -> resume -> dense eval + star export -> Picker API.
It is the living migration document, so it is executed, not just read."""

import os
import subprocess
import sys

import pytest

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_quickstart_runs_end_to_end(tmp_path, subprocess_jax_env):
    env = subprocess_jax_env
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    out = str(tmp_path / "quickstart")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(_REPO, "examples", "quickstart.py"),
            "-o", out, "--iterations", "8", "--batch", "4",
            "--n_images", "1", "--size", "384",
        ],
        capture_output=True, text=True, timeout=1800, env=env, cwd=_REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert os.path.exists(os.path.join(out, "picks.star"))
    assert "[5/5] programmatic Picker API" in proc.stdout
    assert "done — artifacts under" in proc.stdout
