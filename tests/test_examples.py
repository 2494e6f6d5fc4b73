"""Example-script smoke tests (subprocess, CPU/pygame-dummy)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_render_rollout_gif(tmp_path):
    out = str(tmp_path / "ep.gif")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SDL_VIDEODRIVER"] = "dummy"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "render_rollout.py"),
         "--p1", "const:3", "--p2", "l0", "--out", out, "--max-steps", "400"],
        capture_output=True, text=True, timeout=240, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(out) > 50_000
    assert "winner=1" in r.stdout
