"""Offline analysis tests over synthetic trajectory logs."""

import os

import numpy as np

from merging_gym_tpu.io.analysis import (COLLISION_SCORE_THRESHOLD,
                                         group_sessions, load_session,
                                         plot_reward_curves,
                                         plot_training_curves,
                                         plot_utility_bars,
                                         plot_xt_trajectories,
                                         session_summary)
from merging_gym_tpu.io.trajectory import EpisodeLogger, make_log_dir


def _write_session(root, n_episodes=3, collide_last=True):
    d = make_log_dir(root)
    for i in range(n_episodes):
        lg = EpisodeLogger(d, i, "cond_A")
        for t in range(20):
            obs = list(np.linspace(0, 1, 10) * (t + 1))
            r1 = -10.0 if (collide_last and i == n_episodes - 1 and t == 19) else -0.01
            lg.log_step(obs, 2, 3, [r1, -0.01], None)
        lg.close()
    return d


def test_session_loading_and_stats(tmp_path):
    d = _write_session(str(tmp_path / "log"))
    eps = load_session(d)
    assert len(eps) == 3
    assert eps[0]["obs"].shape == (20, 10)
    s = session_summary(d)
    assert s["episodes"] == 3
    assert s["collisions"] == 1  # last episode sums below the -7 heuristic
    assert s["scores"][-1] < COLLISION_SCORE_THRESHOLD


def test_group_and_plots(tmp_path):
    root = str(tmp_path / "sessions")
    os.makedirs(root)
    _write_session(os.path.join(root, "s1"))
    _write_session(os.path.join(root, "s2"), collide_last=False)
    # each make_log_dir nests a timestamp dir; group over those parents
    groups = {}
    for name in sorted(os.listdir(root)):
        inner = os.listdir(os.path.join(root, name))[0]
        groups.setdefault(name[:2], []).append(
            session_summary(os.path.join(root, name, inner)))
    p1 = plot_utility_bars(groups, str(tmp_path / "utility.png"))
    assert os.path.getsize(p1) > 1000

    d = os.path.join(root, "s1", os.listdir(os.path.join(root, "s1"))[0])
    assert os.path.getsize(plot_reward_curves(d)) > 1000
    assert os.path.getsize(plot_xt_trajectories(d)) > 1000


def test_training_curves(tmp_path):
    import json
    run = tmp_path / "run"
    run.mkdir()
    with open(run / "scalars.jsonl", "w") as f:
        for i in range(10):
            f.write(json.dumps({"step": i, "reward": -5 + i * 0.3,
                                "loss": 100 / (i + 1),
                                "collision_rate": 0.9 - i * 0.05,
                                "win_rate": 0.3 + i * 0.02}) + "\n")
    out = plot_training_curves(str(run))
    assert os.path.getsize(out) > 1000
