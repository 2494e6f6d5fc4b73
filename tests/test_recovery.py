"""Elastic-recovery integration test: SIGKILL a training run mid-flight,
resume from its last orbax checkpoint, verify the continuation
(the failure-detection/recovery story SURVEY.md section 5 requires)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(args, **kw):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, "-m", "merging_gym_tpu.cli", "--cpu", *args],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, **kw)


@pytest.mark.slow
def test_sigkill_and_resume(tmp_path):
    out = str(tmp_path / "run")
    args = ["train", "--algo", "dqn", "--num-envs", "8",
            "--episodes", "100000", "--chunk-steps", "30",
            "--max-chunks", "400", "--memory-capacity", "64",
            "--batch-size", "8", "--checkpoint-every", "1", "--out", out]
    proc = _cli(args)
    # Wait until at least two checkpoints landed, then kill -9.
    deadline = time.time() + 420
    ckpt_dir = os.path.join(out, "ckpt")
    while time.time() < deadline:
        steps = [d for d in (os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else [])
                 if d.isdigit()]
        if len(steps) >= 2:
            break
        if proc.poll() is not None:
            pytest.fail(f"trainer exited early:\n{proc.stdout.read()[-2000:]}")
        time.sleep(2)
    else:
        proc.kill()
        pytest.fail("no checkpoints appeared within deadline")
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()

    # Resume into a new run dir; it must pick up the saved env_steps and
    # keep increasing from there.
    out2 = str(tmp_path / "run2")
    proc2 = _cli(["train", "--algo", "dqn", "--num-envs", "8",
                  "--episodes", "100000", "--chunk-steps", "30",
                  "--max-chunks", "2", "--memory-capacity", "64",
                  "--batch-size", "8", "--resume", out, "--out", out2])
    out_text, _ = proc2.communicate(timeout=420)
    assert proc2.returncode == 0, out_text[-2000:]
    assert "resumed from" in out_text
    resumed_at = int(out_text.split("resumed from")[1].split("at step")[1].split()[0])
    assert resumed_at > 0
    rows = [json.loads(l) for l in open(os.path.join(out2, "scalars.jsonl"))]
    assert rows[-1]["env_steps"] == resumed_at + 2 * 30 * 8
