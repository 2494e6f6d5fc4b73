"""Class-env wrappers + UI tests: reference-API parity of MergeEnv,
gymnasium registration, headless rendering, screens, human harness."""

import os

import numpy as np
import pytest

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.oracle import OracleMergeEnv
from merging_gym_tpu.envs.gym_env import GymnasiumMergeEnv, MergeEnv, register_gymnasium


def test_merge_env_reference_api():
    env = MergeEnv()
    obs = env.reset()
    assert isinstance(obs, list) and len(obs) == 10
    assert env.show_reward() == (2.0, 1.0, -10.0, 0.001)
    assert env.action_dict == {0: 0.0, 1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0}
    assert env.action_space.n == 5
    assert env.observation_space.shape == (10,)
    obs, rewards, done, info = env.step(3, None)
    assert len(rewards) == 2 and not done and info["collision"] is False
    assert env.winner is None
    assert env.state1["vel"] > env.state2["vel"]
    # drives to completion like the oracle
    oracle = OracleMergeEnv()
    oracle.step(3, None)
    np.testing.assert_allclose(obs, oracle.observe(), atol=0)


def test_gymnasium_env_modern_api():
    register_gymnasium()
    import gymnasium as gym

    env = gym.make("merging_gym_tpu/MergeEnv-v0")
    obs, info = env.reset(seed=0)
    assert obs.shape == (10,)
    total = 0.0
    for _ in range(3000):
        obs, r, term, trunc, info = env.step(4)
        total += r
        if term or trunc:
            break
    assert term or trunc
    assert "winner" in info and "reward_opponent" in info
    env.close()


def test_old_gym_id_aliases():
    """The reference's gym-0.20 ids (merging_gym/__init__.py:3-11) resolve
    as gymnasium aliases, so reference scripts port with zero renames."""
    register_gymnasium()
    import gymnasium as gym

    env = gym.make("merging_env-v0")
    obs, info = env.reset(seed=0)
    assert obs.shape == (10,)
    env.close()
    assert "merging_env_extend-v0" in gym.registry


def test_gymnasium_env_custom_opponent():
    env = GymnasiumMergeEnv(opponent=lambda obs, rng: 4)
    env.reset(seed=1)
    for _ in range(3000):
        obs, r, term, trunc, info = env.step(0)
        if term or trunc:
            break
    assert info["winner"] == 2  # full-throttle opponent wins vs braking ego


def test_renderer_headless_frame():
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    from merging_gym_tpu.ui.render import Renderer, snapshot

    r = Renderer(wait_ms=0)
    snap = snapshot({"pos": 100.0, "vel": 20.0, "acc": 1.0},
                    {"pos": 120.0, "vel": 25.0, "acc": -1.0}, 1.0, -2.0)
    r.render(snap, player=2, tag_right="Finished", wait=False)
    frame = r.frame_array()
    assert frame.shape == (1000, 900, 3)
    # both player views drawn -> non-background pixels on both halves
    assert (frame[:, :300] < 250).any() and (frame[:, 600:] < 250).any()
    r.close()


def test_screens_run_headless():
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    from merging_gym_tpu.ui.render import Renderer
    from merging_gym_tpu.ui.screens import ExperimentScreens

    r = Renderer(wait_ms=0)
    s = ExperimentScreens(r, time_scale=0.0)
    s.intro()
    s.prepare()
    s.feedback(1.5, -0.5)
    s.finish(3.0, 1.0)
    r.close()


def test_human_session_smoke(tmp_path):
    """Full experiment session headless with the L0 opponent, capped
    episodes: CSV logs written in the 14-column schema."""
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    from merging_gym_tpu.ui.human import ScriptedOpponent, run_session

    result = run_session(ScriptedOpponent("l0"), episodes=2,
                         log_root=str(tmp_path / "log"),
                         max_steps=50, time_scale=0.0)
    files = sorted(os.listdir(result["log_dir"]))
    assert len(files) == 2
    first = open(os.path.join(result["log_dir"], files[0])).read().splitlines()
    assert len(first[0].split(",")) == 14
    assert len(first) > 10


def test_human_session_with_dqn_opponent(tmp_path):
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    import glob

    from merging_gym_tpu.ui.human import load_opponent, run_session

    dirs = sorted(glob.glob(
        "/root/reference/test_params/dqn/*OP:L0(2.0, 1.0, -10, 0.001)"))
    if not dirs:
        pytest.skip("reference checkpoints not present")
    opp = load_opponent("dqn", dirs[0])
    result = run_session(opp, episodes=1, log_root=str(tmp_path / "log"),
                         max_steps=30, time_scale=0.0)
    assert os.path.isdir(result["log_dir"])
