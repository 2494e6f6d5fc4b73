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


def test_drqn_orbax_resume_equals_continue(tmp_path):
    """resume == continue for the XLA DRQN trainer through the same
    generic orbax path the CLI uses for --algo drqn (template carry ->
    mgr.restore -> keep training): bit-for-bit parity with an
    uninterrupted run (VERDICT r3 item 6)."""
    import jax
    import numpy as np

    from merging_gym_tpu.agents import drqn as DR
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.io.checkpoint import CheckpointManager

    n, steps = 16, 12
    cfg = DR.DRQNConfig(memory_capacity=32, batch_size=4, seq_len=4,
                        burn_in=1, opponent="selfplay")
    ep = EnvParams(max_steps=30)
    carry0 = DR.drqn_train_init(jax.random.key(0), cfg, ep, n)

    cont = DR.drqn_train_chunk(cfg, ep, carry0, steps)
    cont = DR.drqn_train_chunk(cfg, ep, cont, steps)

    mid = DR.drqn_train_chunk(cfg, ep, carry0, steps)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, mid, wait=True)
    fresh = DR.drqn_train_init(jax.random.key(0), cfg, ep, n)
    restored = mgr.restore(fresh)
    mgr.close()
    resumed = DR.drqn_train_chunk(cfg, ep, restored, steps)

    flat_c = jax.tree.leaves_with_path(cont)
    flat_r = {jax.tree_util.keystr(k): v
              for k, v in jax.tree.leaves_with_path(resumed)}
    assert len(flat_c) == len(flat_r)

    def to_np(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype,
                                                         jax.dtypes.prng_key):
            x = jax.random.key_data(x)
        return np.asarray(x)

    for k, a in flat_c:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(to_np(a), to_np(flat_r[ks]),
                                      err_msg=ks)
