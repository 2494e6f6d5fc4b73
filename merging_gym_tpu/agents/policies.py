"""Policy protocol: params-PyTree + pure act function.

Unifies every actor kind in the reference -- the L0 constant-velocity
"None" opponent (merging_env.py:152), random/scripted actions, epsilon-
greedy Q-nets (main.py:99-112), frozen level-k checkpoints (main.py:
164-168) and human keyboard input -- behind one batched interface so
self-play, level-k curricula and pve/pvp share a single rollout engine
(BASELINE.json north star).

Reference quirk preserved: "epsilon-greedy" draws a standard normal and
acts greedily iff ``randn() <= 0.7`` (main.py:105), i.e. P(greedy) =
Phi(0.7) ~= 0.758, constant over training.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.env import swap_obs

EPSILON = 0.7  # main.py:16 ("EPISILO")


@struct.dataclass
class Policy:
    """A single-player policy over the player's own view of the obs.

    ``act(params, obs, key) -> int32 action`` for one env; batching is
    applied by the two-player composer below.
    """

    act: Callable[[Any, jax.Array, jax.Array], jax.Array] = struct.field(pytree_node=False)
    params: Any = None


def l0_policy() -> Policy:
    """The ``action2=None`` constant-velocity opponent (merging_env.py:152)."""
    return Policy(act=lambda p, obs, key: jnp.int32(C.ACTION_NONE))


def constant_policy(action: int) -> Policy:
    return Policy(act=lambda p, obs, key: jnp.int32(action))


def random_policy(num_actions: int = C.NUM_ACTIONS) -> Policy:
    return Policy(act=lambda p, obs, key: jax.random.randint(key, (), 0, num_actions, jnp.int32))


def eps_greedy_from_q(q_values: jax.Array, key: jax.Array,
                      epsilon: float = EPSILON,
                      num_actions: int = C.NUM_ACTIONS) -> jax.Array:
    """Reference epsilon-greedy over precomputed Q-values (main.py:105-111)."""
    kg, kr = jax.random.split(key)
    greedy = jax.random.normal(kg) <= epsilon
    return jnp.where(greedy,
                     jnp.argmax(q_values, axis=-1).astype(jnp.int32),
                     jax.random.randint(kr, (), 0, num_actions, jnp.int32))


def q_policy(apply_fn, params, greedy: bool = False,
             epsilon: float = EPSILON) -> Policy:
    """Epsilon-greedy (or purely greedy) policy over a Q-net apply_fn."""
    def act(p, obs, key):
        q = apply_fn(p, obs)
        if greedy:
            return jnp.argmax(q, axis=-1).astype(jnp.int32)
        return eps_greedy_from_q(q, key, epsilon)
    return Policy(act=act, params=params)


def two_player(policy1: Policy, policy2: Policy):
    """Compose two single-player policies into a batched rollout policy_fn.

    Player 2 sees the half-swapped observation (main.py:199).  Returns a
    function with the ``core.vector.rollout`` policy signature; its state
    is the pair of policy params, so learned params can be swapped in
    per-iteration without retracing.
    """
    def policy_fn(pstate, obs, key):
        p1, p2 = pstate
        n = obs.shape[0]
        k1, k2 = jax.random.split(key)
        a1 = jax.vmap(policy1.act, in_axes=(None, 0, 0))(
            p1, obs, jax.random.split(k1, n))
        a2 = jax.vmap(policy2.act, in_axes=(None, 0, 0))(
            p2, swap_obs(obs), jax.random.split(k2, n))
        return pstate, jnp.stack([a1, a2], axis=-1)
    return policy_fn, (policy1.params, policy2.params)
