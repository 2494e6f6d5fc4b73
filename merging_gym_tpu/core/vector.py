"""Vectorised auto-resetting env: the throughput workhorse.

Replaces the reference's serial one-env episode loops (scripts/main.py:
189-220, hdqn.py:276-327, ranbowdqn.py:662-685) with a ``vmap``-ped pure
step over thousands of env states in lockstep, ``jnp.where``-based
auto-reset, and ``lax.scan`` rollouts -- all inside one jit so the hot
path never touches the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from merging_gym_tpu.core import env as core_env
from merging_gym_tpu.core.env import EnvParams, EnvState, TimeStep


def reset_batch(params: EnvParams, key: jax.Array, num_envs: int,
                dtype=jnp.float32) -> EnvState:
    """Batched reset; each env gets its own PRNG key for random starts."""
    keys = jax.random.split(key, num_envs)
    return jax.vmap(lambda k: core_env.reset(params, k, dtype))(keys)


def step_batch(params: EnvParams, state: EnvState, actions: jax.Array):
    """Batched step. ``actions``: i32[num_envs, 2]."""
    return jax.vmap(partial(core_env.step, params))(state, actions)


def autoreset_step(params: EnvParams, state: EnvState, actions: jax.Array,
                   key: jax.Array):
    """Step all envs, then reset the ones that finished.

    The returned ``TimeStep`` carries the *pre-reset* terminal observation
    (what a replay buffer must store as ``next_obs``); the returned state
    is post-reset, so its observation is what the policy should see next.
    """
    next_state, ts = step_batch(params, state, actions)
    num_envs = ts.done.shape[0]
    fresh = reset_batch(params, key, num_envs, state.pos.dtype)

    def pick(new, old):
        done = ts.done.reshape((num_envs,) + (1,) * (old.ndim - 1))
        return jnp.where(done, new, old)

    return jax.tree.map(pick, fresh, next_state), ts


def observe_after_reset(params: EnvParams, state: EnvState, ts):
    """Post-auto-reset observation without re-running the trig.

    ``ts.obs`` already holds the stepped observation; only the freshly
    reset envs differ.  With deterministic starts the reset observation
    is a compile-time constant, so this replaces a full second
    ``observe`` pass (4 transcendentals per env per step) with one
    ``where`` select.  Randomised starts still need the real pass.
    """
    if params.random_start:
        return jax.vmap(core_env.observe)(state)
    fresh_obs = core_env.observe(core_env.reset(params, dtype=state.pos.dtype))
    return jnp.where(ts.done[:, None], fresh_obs.astype(ts.obs.dtype), ts.obs)


def rollout(params: EnvParams, state: EnvState, policy_fn, policy_state,
            key: jax.Array, num_steps: int, collect: str = "full",
            unroll: int = 4):
    """``lax.scan`` rollout of ``num_steps`` lockstep env steps.

    ``policy_fn(policy_state, obs_batch, key) -> (policy_state, actions)``
    where ``actions`` is i32[num_envs, 2] (use ACTION_NONE for a null
    player-2).  Returns the final carry and the stacked per-step output.

    ``collect`` controls what the scan materialises -- the rollout is
    HBM-bandwidth-bound, so narrower collection is proportionally faster:
      * ``"full"``    -- the whole TimeStep (obs, rewards, done, ...);
      * ``"rewards"`` -- ``(rewards, done)`` only (evaluation);
      * ``"none"``    -- nothing per-step (pure stepping / burn-in).
    """
    obs0 = jax.vmap(core_env.observe)(state)

    def body(carry, key):
        state, policy_state, obs = carry
        k_act, k_reset = jax.random.split(key)
        policy_state, actions = policy_fn(policy_state, obs, k_act)
        state, ts = autoreset_step(params, state, actions, k_reset)
        next_obs = observe_after_reset(params, state, ts)
        if collect == "full":
            out = ts
        elif collect == "rewards":
            out = (ts.rewards, ts.done)
        else:
            out = None
        return (state, policy_state, next_obs), out

    keys = jax.random.split(key, num_steps)
    (state, policy_state, _), traj = jax.lax.scan(
        body, (state, policy_state, obs0), keys, unroll=unroll)
    return (state, policy_state), traj
