"""Checkpoint/resume for the fused-kernel trainer (VERDICT r1 item 3).

The kernel's whole training state streams back to HBM after every
launch (params, target, Adam moments, env rows, replay ring, counters),
so a checkpoint is just the carry dict through orbax.  Two locks:

* resume == continue, bit-for-bit: an orbax save/restore roundtrip mid
  run produces exactly the states an uninterrupted run produces
  (interpret mode, greedy actor, global-step-derived chunk seeds);
* the test_recovery.py-style integration path: SIGKILL a CLI
  ``train --fused-kernel --checkpoint-every`` run mid-flight, resume
  with ``--resume``, verify the continuation (the CLI runs the kernel
  under the Pallas interpreter via MGT_FUSED_INTERPRET=1 on CPU).
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

from merging_gym_tpu.agents.dqn import DQNConfig
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.io.checkpoint import CheckpointManager
from merging_gym_tpu.ops import fused_trainer as FT

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("MGT_FUSED_INTERPRET", "1")
    yield


def _chunks(cfg, ep, carry, steps_per, count, base_seed):
    for _ in range(count):
        carry = FT.fused_dqn_chunk(cfg, ep, carry, steps_per,
                                   seed=base_seed + carry["steps"],
                                   greedy=True)
    return carry


def test_orbax_roundtrip_resume_equals_continue(tmp_path):
    n, steps = 128, 8
    cfg = DQNConfig(lr=1e-3, target_sync=5, memory_capacity=2 * n,
                    opponent=FT.OPP_SELFPLAY)
    ep = EnvParams(max_steps=40)

    carry0 = FT.fused_dqn_init(jax.random.key(0), cfg, ep, n)
    carry0["p"] = tuple((a - np.mean(a)) * 0.05 for a in carry0["p"])
    carry0["tp"] = tuple((a - np.mean(a)) * 0.05 for a in carry0["tp"])
    carry0["opp"] = carry0["p"]

    # Uninterrupted: 3 chunks.
    cont = _chunks(cfg, ep, dict(carry0), steps, 3, base_seed=77)

    # Interrupted: 1 chunk -> orbax save -> restore into a FRESH template
    # (as a restarted process would) -> 2 more chunks.
    mid = _chunks(cfg, ep, dict(carry0), steps, 1, base_seed=77)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, mid, wait=True)
    fresh = FT.fused_dqn_init(jax.random.key(0), cfg, ep, n)
    restored = FT.coerce_carry(mgr.restore(fresh))
    mgr.close()
    assert restored["steps"] == steps and restored["warm"] == 1
    resumed = _chunks(cfg, ep, restored, steps, 2, base_seed=77)

    for k in ("p", "tp", "m", "v"):
        for a, b in zip(cont[k], resumed[k]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=k)
    np.testing.assert_array_equal(np.asarray(cont["ring"]),
                                  np.asarray(resumed["ring"]))
    np.testing.assert_array_equal(np.asarray(cont["env"]),
                                  np.asarray(resumed["env"]))
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
def test_sigkill_and_resume_fused(tmp_path):
    out = str(tmp_path / "run")
    common = ["train", "--algo", "dqn", "--fused-kernel", "--greedy-actor",
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
