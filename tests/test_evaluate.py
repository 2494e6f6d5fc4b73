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


def test_league_loader_covers_every_zoo_entry():
    """model_zoo/make_league.build_policies must dispatch every entry's
    meta.json algo to the right param template -- load_params_npz does
    no shape validation, so acting once per policy is the check that a
    template mismatch would fail (the league rebuild crashed on hdqn
    entries once, before the loader knew all four families)."""
    import importlib.util
    import os

    import jax.numpy as jnp

    zoo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "model_zoo")
    spec = importlib.util.spec_from_file_location(
        "make_league", os.path.join(zoo, "make_league.py"))
    ml = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ml)

    policies, recurrent = ml.build_policies()
    entries = {n for n in os.listdir(zoo)
               if os.path.exists(os.path.join(zoo, n, "params.npz"))}
    assert set(policies) | set(recurrent) == entries | {"L0"}

    obs = jnp.zeros((10,), jnp.float32)
    for name, pol in policies.items():
        a = pol.act(pol.params, obs, jax.random.key(0))
        assert a.shape == (), name
    from merging_gym_tpu.nn.lstm import drqn_step, lstm_zero_carry
    for name, params in recurrent.items():
        q, _ = drqn_step(params, obs[None], lstm_zero_carry((1,)))
        assert q.shape == (1, 5), name
