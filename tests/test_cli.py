"""CLI integration tests: subprocess runs of every subcommand on CPU."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=480):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "merging_gym_tpu.cli", "--cpu", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)


def test_train_dqn_tiny(tmp_path):
    out = str(tmp_path / "run")
    r = run_cli(["train", "--algo", "dqn", "--num-envs", "8",
                 "--episodes", "5", "--chunk-steps", "50", "--max-chunks", "6",
                 "--memory-capacity", "64", "--batch-size", "8",
                 "--out", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "params.npz"))
    assert os.path.exists(os.path.join(out, "scalars.jsonl"))
    rows = [json.loads(l) for l in open(os.path.join(out, "scalars.jsonl"))]
    assert rows[-1]["env_steps"] > 0


def test_eval_const_policies(tmp_path):
    r = run_cli(["eval", "--p1", "const:4", "--p2", "const:1",
                 "--episodes", "16", "--num-envs", "16"])
    assert r.returncode == 0, r.stderr[-2000:]
    result = json.loads(r.stdout[r.stdout.index("{"):])
    assert result["p1_first_rate"] > 0.9


def test_bad_algo_rejected():
    r = run_cli(["train", "--algo", "nope"], timeout=60)
    assert r.returncode != 0
    assert "invalid choice" in r.stderr


def test_help_lists_subcommands():
    r = run_cli(["--help"], timeout=60)
    assert r.returncode == 0
    for cmd in ("train", "levelk", "play", "bench", "eval"):
        assert cmd in r.stdout
