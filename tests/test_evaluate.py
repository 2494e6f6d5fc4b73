"""Head-to-head evaluation tests."""

import jax

from merging_gym_tpu.agents.evaluate import evaluate, round_robin
from merging_gym_tpu.agents.policies import constant_policy, l0_policy, random_policy
from merging_gym_tpu.core.env import EnvParams


def test_fast_beats_slow():
    # Constant full-throttle vs constant crawl: P1 should cross first in
    # essentially every finished episode without colliding.
    r = evaluate(constant_policy(4), constant_policy(1), EnvParams(),
                 jax.random.key(0), num_envs=32, min_episodes=32,
                 chunk_steps=512)
    assert r["episodes"] >= 32
    assert r["p1_first_rate"] > 0.95
    assert r["collision_rate"] < 0.05
    assert r["mean_return_p1"] > r["mean_return_p2"]


def test_mirror_matchup_collides():
    # Identical constant-speed policies stay abreast into the merge ->
    # collision every episode.
    r = evaluate(constant_policy(2), constant_policy(2), EnvParams(),
                 jax.random.key(1), num_envs=16, min_episodes=16)
    assert r["collision_rate"] > 0.95


def test_l0_vs_random_runs():
    r = evaluate(random_policy(), l0_policy(), EnvParams(),
                 jax.random.key(2), num_envs=32, min_episodes=32)
    assert r["episodes"] >= 32
    assert 0.0 <= r["p1_first_rate"] <= 1.0


def test_round_robin_keys():
    res = round_robin({"fast": constant_policy(4), "slow": constant_policy(1)},
                      EnvParams(), jax.random.key(3), num_envs=8,
                      min_episodes=8)
    assert set(res) == {"fast vs slow", "slow vs fast"}
    assert res["fast vs slow"]["p1_first_rate"] > 0.9
    assert res["slow vs fast"]["p2_first_rate"] > 0.9
