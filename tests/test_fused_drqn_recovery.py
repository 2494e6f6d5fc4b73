"""Checkpoint/resume for the fused DRQN trainer (VERDICT r3 items 1+6).

Same two locks as tests/test_fused_trainer_recovery.py: bit-for-bit
resume == continue through an orbax roundtrip (the carry dict holds the
kernel's full HBM-streamed state: params, target, moments, env rows
incl. both seats' LSTM state, window buffer, ring, counters), and the
SIGKILL-a-CLI-run integration path under the Pallas interpreter.
"""

import json
import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from merging_gym_tpu.agents.drqn import DRQNConfig
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.io.checkpoint import CheckpointManager
from merging_gym_tpu.ops import fused_drqn as FD

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("MGT_FUSED_INTERPRET", "1")
    yield


def _chunks(cfg, ep, carry, steps_per, count, base_seed):
    for _ in range(count):
        carry = FD.fused_drqn_chunk(cfg, ep, carry, steps_per,
                                    seed=base_seed + carry["steps"],
                                    greedy=True)
    return carry


def test_orbax_roundtrip_resume_equals_continue(tmp_path):
    n, steps, L = 128, 6, 4
    cfg = DRQNConfig(lr=1e-3, target_sync=3, seq_len=L, burn_in=1,
                     memory_capacity=2 * n, opponent=FD.OPP_SELFPLAY)
    ep = EnvParams(max_steps=30)

    carry0 = FD.fused_drqn_init(jax.random.key(0), cfg, ep, n)
    carry0["p"] = tuple((a - np.mean(a)) * 0.05 for a in carry0["p"])
    carry0["tp"] = tuple((a - np.mean(a)) * 0.05 for a in carry0["tp"])
    carry0["opp"] = carry0["p"]

    # Uninterrupted: 3 chunks (6-step chunks end mid-window, L=4, so the
    # save lands with a partially filled window slot buffer).
    cont = _chunks(cfg, ep, dict(carry0), steps, 3, base_seed=77)

    mid = _chunks(cfg, ep, dict(carry0), steps, 1, base_seed=77)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, mid, wait=True)
    fresh = FD.fused_drqn_init(jax.random.key(0), cfg, ep, n)
    restored = FD.coerce_drqn_carry(mgr.restore(fresh))
    mgr.close()
    assert restored["steps"] == steps
    resumed = _chunks(cfg, ep, restored, steps, 2, base_seed=77)

    for k in ("p", "tp", "m", "v"):
        for a, b in zip(cont[k], resumed[k]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=k)
    for k in ("ring", "win", "env"):
        np.testing.assert_array_equal(np.asarray(cont[k]),
                                      np.asarray(resumed[k]), err_msg=k)
    for k in ("learns", "steps", "env_steps", "episodes", "collisions",
              "wins", "sum_ep_reward", "last_loss"):
        assert cont[k] == resumed[k], k


def _cli(args, **kw):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["MGT_FUSED_INTERPRET"] = "1"
    return subprocess.Popen(
        [sys.executable, "-m", "merging_gym_tpu.cli", "--cpu", *args],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, **kw)


@pytest.mark.slow
def test_sigkill_and_resume_fused_drqn(tmp_path):
    out = str(tmp_path / "run")
    common = ["train", "--algo", "drqn", "--fused-kernel", "--greedy-actor",
              "--num-envs", "128", "--episodes", "1000000",
              "--chunk-steps", "20", "--memory-capacity", "256",
              "--checkpoint-every", "1"]
    proc = _cli(common + ["--max-chunks", "400", "--out", out])
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

    out2 = str(tmp_path / "run2")
    proc2 = _cli(common + ["--max-chunks", "2", "--resume", out,
                           "--out", out2])
    out_text, _ = proc2.communicate(timeout=420)
    assert proc2.returncode == 0, out_text[-2000:]
    assert "resumed from" in out_text
    resumed_at = int(out_text.split("resumed from")[1].split("at step")[1].split()[0])
    assert resumed_at > 0
    rows = [json.loads(l) for l in open(os.path.join(out2, "scalars.jsonl"))]
    assert rows[-1]["env_steps"] == resumed_at + 2 * 20 * 128
