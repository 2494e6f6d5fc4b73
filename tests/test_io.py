"""IO tests: torch .pth import of real reference checkpoints, npz
round-trip, orbax full-state checkpoint/resume, metrics + CSV logs."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.io import torch_import as ti
from merging_gym_tpu.io.checkpoint import (CheckpointManager, load_params_npz,
                                           run_dir_name, save_params_npz)
from merging_gym_tpu.io.metrics import MetricsWriter, rates_from_counters
from merging_gym_tpu.io.trajectory import HEADER, EpisodeLogger, make_log_dir
from merging_gym_tpu.nn.mlp import qnet_apply, qnet_init

REF_DQN_DIRS = sorted(glob.glob(
    "/root/reference/test_params/dqn/*OP:L0(2.0, 1.0, -10, 0.001)"))


@pytest.mark.skipif(not REF_DQN_DIRS, reason="reference checkpoints not present")
def test_load_reference_checkpoint_and_infer():
    """The six pretrained reference policies load and produce sane greedy
    actions through our jitted apply."""
    params, target = ti.load_reference_dqn(REF_DQN_DIRS[0])
    assert params["fc0"]["w"].shape == (10, 200)
    obs = jnp.asarray(np.linspace(-1, 1, 10), jnp.float32)
    q = qnet_apply(params, obs)
    assert q.shape == (5,)
    assert not bool(jnp.isnan(q).any())
    # torch round-trip: export and re-import must be exact
    sd = ti.qnet_to_state_dict(params)
    back = ti.qnet_from_state_dict(sd)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]["w"]),
                                      np.asarray(back[k]["w"]))


@pytest.mark.skipif(not REF_DQN_DIRS, reason="reference checkpoints not present")
def test_reference_policy_beats_random_vs_l0():
    """Sanity: the pretrained L1 policy (trained vs L0) should win vs the
    L0 opponent from the deterministic start -- the behaviour the
    reference's human_player.py plays against."""
    from merging_gym_tpu.core.oracle import OracleMergeEnv

    params, _ = ti.load_reference_dqn(REF_DQN_DIRS[0])
    env = OracleMergeEnv()
    obs = env.reset()
    apply = jax.jit(qnet_apply)
    for _ in range(3000):
        a = int(jnp.argmax(apply(params, jnp.asarray(obs, jnp.float32))))
        obs, r, done, info = env.step(a, None)
        if done:
            break
    assert done


def test_npz_roundtrip(tmp_path):
    params = qnet_init(jax.random.key(0), 10, 5)
    path = str(tmp_path / "p.npz")
    save_params_npz(path, params)
    like = qnet_init(jax.random.key(1), 10, 5)
    back = load_params_npz(path, like)
    np.testing.assert_array_equal(np.asarray(params["fc1"]["w"]),
                                  np.asarray(back["fc1"]["w"]))


def test_orbax_full_state_resume(tmp_path):
    """Checkpoint the entire train carry mid-run and restore it: the
    restored run must continue identically (the resume-equals-continue
    property the reference lacks, SURVEY.md section 5)."""
    from merging_gym_tpu.agents import dqn as D
    from merging_gym_tpu.core.env import EnvParams

    cfg = D.DQNConfig(memory_capacity=64, batch_size=16)
    env_params = EnvParams()
    carry = D.train_init(jax.random.key(0), cfg, env_params, 8)
    carry = D.train_chunk(cfg, env_params, carry, 10)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(10, carry, wait=True)
    restored = mgr.restore(carry)
    mgr.close()

    a = D.train_chunk(cfg, env_params, carry, 5)
    b = D.train_chunk(cfg, env_params, restored, 5)
    np.testing.assert_allclose(np.asarray(a.dqn.params["fc0"]["w"]),
                               np.asarray(b.dqn.params["fc0"]["w"]), atol=0)
    assert int(a.metrics.env_steps) == int(b.metrics.env_steps)


def test_run_dir_name_convention():
    name = run_dir_name(" dqn", "L1", (2.0, 1.0, -10, 0.001))
    assert "dqn with OP:L1(2.0, 1.0, -10, 0.001)" in name


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path / "run"))
    w.log(0, {"reward": 1.5, "collision_rate": 0.4})
    w.log(1, {"reward": 2.5, "collision_rate": 0.3})
    w.close()
    lines = open(tmp_path / "run" / "scalars.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    csv_text = open(tmp_path / "run" / "scalars.csv").read()
    assert "collision_rate" in csv_text and "2.5" in csv_text


def test_trajectory_csv_schema(tmp_path):
    d = make_log_dir(str(tmp_path / "log"))
    lg = EpisodeLogger(d, 0, "testtag")
    obs = list(np.arange(10.0))
    lg.log_step(obs, 2, None, [-0.1, 0.2], None)
    lg.log_step(obs, 3, 4, [-0.1, 0.2], 2)
    lg.log_step(obs, 3, 4, [0.0, 0.0], 1)  # ego won -> row suppressed
    lg.close()
    rows = open(lg.path).read().strip().splitlines()
    assert rows[0].split(",")[0] == '"x2 - x1"' or rows[0].startswith("x2 - x1")
    assert len(rows) == 3  # header + 2 rows (third suppressed)
    assert len(HEADER) == 14


def test_dump_batch_trajectories_reference_row_semantics(tmp_path):
    """Rows hold the PRE-step obs (human_player.py:181 logs `state`), the
    first row is the reset observation, ego-winning rows are suppressed,
    and the L0 sentinel becomes an empty action2 cell."""
    import jax
    import jax.numpy as jnp

    from merging_gym_tpu.core import constants as Cc
    from merging_gym_tpu.core.env import EnvParams, observe, reset
    from merging_gym_tpu.core.vector import reset_batch, rollout
    from merging_gym_tpu.io.trajectory import dump_batch_trajectories, make_log_dir

    params = EnvParams()

    def policy(ps, obs, key):
        a = jnp.stack([jnp.full((obs.shape[0],), 4, jnp.int32),
                       jnp.full((obs.shape[0],), Cc.ACTION_NONE, jnp.int32)], -1)
        return ps, a

    state = reset_batch(params, jax.random.key(0), 2)
    (_, _), traj = jax.jit(
        lambda s, k: rollout(params, s, policy, None, k, 300))(
            state, jax.random.key(1))
    d = make_log_dir(str(tmp_path / "log"))
    paths = dump_batch_trajectories(d, traj, max_episodes=1)
    assert len(paths) == 1
    rows = open(paths[0]).read().strip().splitlines()
    start_obs = np.asarray(observe(reset(params)))
    first = rows[1].split(",")
    np.testing.assert_allclose([float(v) for v in first[:10]], start_obs,
                               rtol=1e-5)
    assert first[10] == "4" and first[11] == ""  # L0 -> empty cell
    # Once the ego wins (winner==1 rows suppressed), row count is shorter
    # than the episode length.
    T = np.asarray(traj.done)[:, 0].argmax() + 1
    assert len(rows) - 1 < int(T)
