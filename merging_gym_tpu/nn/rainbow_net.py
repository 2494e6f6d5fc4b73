"""Rainbow network: dueling noisy C51 head over a small MLP trunk.

Functional counterpart of the reference ``RainbowDQN`` module
(scripts/ranbowdqn.py:498-548): 10 -> 32 -> 64 trunk (torch-default
init), then noisy value (64 -> 64 -> atoms) and noisy advantage
(64 -> 64 -> actions*atoms) streams, dueling combine, softmax over
atoms.  Noise is an explicit PyTree (see nn.noisy); ``noise=None`` is
eval mode.
"""

import jax
import jax.numpy as jnp

from merging_gym_tpu.nn.init import linear_params
from merging_gym_tpu.nn.noisy import noisy_apply, noisy_init, noisy_sample_noise

NUM_ATOMS = 51     # ranbowdqn.py:32
V_MIN, V_MAX = -10.0, 10.0  # ranbowdqn.py:33-34
TRUNK = (32, 64)   # ranbowdqn.py:508-509


def support(dtype=jnp.float32):
    return jnp.linspace(V_MIN, V_MAX, NUM_ATOMS, dtype=dtype)


def rainbow_init(key, num_inputs, num_actions, num_atoms=NUM_ATOMS,
                 std_init=0.4, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    return {
        "linear1": linear_params(ks[0], num_inputs, TRUNK[0], "torch", dtype),
        "linear2": linear_params(ks[1], TRUNK[0], TRUNK[1], "torch", dtype),
        "noisy_value1": noisy_init(ks[2], TRUNK[1], TRUNK[1], std_init, dtype),
        "noisy_value2": noisy_init(ks[3], TRUNK[1], num_atoms, std_init, dtype),
        "noisy_advantage1": noisy_init(ks[4], TRUNK[1], TRUNK[1], std_init, dtype),
        "noisy_advantage2": noisy_init(ks[5], TRUNK[1],
                                       num_atoms * num_actions, std_init, dtype),
    }


def rainbow_sample_noise(key, num_actions, num_atoms=NUM_ATOMS,
                         dtype=jnp.float32):
    """One noise PyTree for all four noisy layers (``reset_noise``,
    ranbowdqn.py:537-541)."""
    ks = jax.random.split(key, 4)
    return {
        "noisy_value1": noisy_sample_noise(ks[0], TRUNK[1], TRUNK[1], dtype),
        "noisy_value2": noisy_sample_noise(ks[1], TRUNK[1], num_atoms, dtype),
        "noisy_advantage1": noisy_sample_noise(ks[2], TRUNK[1], TRUNK[1], dtype),
        "noisy_advantage2": noisy_sample_noise(ks[3], TRUNK[1],
                                               num_atoms * num_actions, dtype),
    }


def rainbow_apply(params, x, noise=None, num_actions=5, num_atoms=NUM_ATOMS):
    """Forward pass -> f[..., actions, atoms] softmax distributions
    (ranbowdqn.py:517-535)."""
    def dense(p, h):
        return jnp.dot(h, p["w"], preferred_element_type=jnp.float32).astype(h.dtype) + p["b"]

    h = jax.nn.relu(dense(params["linear1"], x))
    h = jax.nn.relu(dense(params["linear2"], h))

    def noisy(name, h):
        return noisy_apply(params[name], h, None if noise is None else noise[name])

    value = noisy("noisy_value2", jax.nn.relu(noisy("noisy_value1", h)))
    adv = noisy("noisy_advantage2", jax.nn.relu(noisy("noisy_advantage1", h)))

    value = value[..., None, :]                                   # [..., 1, atoms]
    adv = adv.reshape(adv.shape[:-1] + (num_actions, num_atoms))  # [..., A, atoms]
    logits = value + adv - jnp.mean(adv, axis=-2, keepdims=True)
    return jax.nn.softmax(logits, axis=-1)


def rainbow_q_values(dist, sup=None):
    """E[Z] per action: the greedy-action scores (ranbowdqn.py:543-548)."""
    if sup is None:
        sup = support(dist.dtype)
    return jnp.sum(dist * sup, axis=-1)
