"""Parameter initialisers reproducing the reference's torch init schemes.

The reference Q-nets override only the weight init to U(0, 1)
(scripts/main.py:34-39, hdqn.py:42-47) -- an unusual choice that shapes
its learning curves -- while biases keep torch's nn.Linear default
U(-1/sqrt(fan_in), 1/sqrt(fan_in)).  Both are reproduced here exactly.
"""

import math

import jax
import jax.numpy as jnp


def linear_params(key, fan_in, fan_out, weight_init="uniform01", dtype=jnp.float32):
    """Init one dense layer ``{w: [fan_in, fan_out], b: [fan_out]}``.

    ``weight_init``:
      * ``"uniform01"`` -- U(0, 1), the reference Q-net scheme
        (main.py:35,37,39);
      * ``"torch"`` -- torch nn.Linear default U(-k, k), k = 1/sqrt(fan_in).
    """
    kw, kb = jax.random.split(key)
    k = 1.0 / math.sqrt(fan_in)
    if weight_init == "uniform01":
        w = jax.random.uniform(kw, (fan_in, fan_out), dtype, 0.0, 1.0)
    elif weight_init == "torch":
        w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -k, k)
    else:
        raise ValueError(f"unknown weight_init: {weight_init}")
    b = jax.random.uniform(kb, (fan_out,), dtype, -k, k)
    return {"w": w, "b": b}
