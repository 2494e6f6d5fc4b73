"""Pallas TPU kernel: Q-net forward + epsilon-greedy sampling, fused.

One kernel takes a tile of observations and emits *actions*: the 3-layer
MLP runs with all weights VMEM-resident (as in ops.fused_mlp), and the
reference's Phi(0.7)-greedy rule (main.py:105: greedy iff a standard
normal draw is <= 0.7) is applied in-kernel with the TPU's native PRNG
-- no Q-values ever leave the chip's vector memory.

Distribution equivalence, not bit equivalence: ``randn() <= eps`` is the
event ``U < Phi(eps)`` for uniform U, so the kernel draws uniform bits
via ``pltpu.prng_random_bits`` and compares against the precomputed
normal CDF value; the random arm draws uniformly over actions.  The RNG
stream differs from jax.random's threefry, so actions match the jnp
actor in distribution (verified statistically in tests) but not
sample-for-sample.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phi(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _actor_kernel(seed_ref, x_ref, w0_ref, b0_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, out_ref, *, p_greedy, num_actions):
    # Collision-free per-tile seeding: seed*num_tiles + tile, so stepping
    # the caller's seed by 1 never reuses an adjacent tile's stream.
    pltpu.prng_seed(seed_ref[0] * pl.num_programs(0) + pl.program_id(0))
    x = x_ref[:]
    h = jnp.dot(x, w0_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b0_ref[:], 0.0)
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0)
    q = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]

    n = q.shape[0]
    bits = pltpu.bitcast(pltpu.prng_random_bits((n, 2)), jnp.uint32)
    # Integer-domain compare (Mosaic has no uint32 -> f32 cast):
    # P(bits < p * 2^32) == p for uniform 32-bit draws.
    threshold = jnp.uint32(min(int(p_greedy * 4294967296.0), 4294967295))
    greedy_mask = bits[:, 0] < threshold
    rand_action = (bits[:, 1] % jnp.uint32(num_actions)).astype(jnp.int32)
    greedy_action = jnp.argmax(q, axis=-1).astype(jnp.int32)
    action = jnp.where(greedy_mask, greedy_action, rand_action)
    out_ref[:] = action[:, None]


@functools.partial(jax.jit, static_argnames=("epsilon", "block"))
def fused_eps_greedy_actions(params, obs, seed, epsilon: float = 0.7,
                             block: int = 512):
    """Actions for a batch of observations, entirely in one kernel.

    ``seed``: int32 scalar (vary per step).  Matches
    ``agents.policies.eps_greedy_from_q`` in distribution.
    """
    n = obs.shape[0]
    d_in = params["fc0"]["w"].shape[0]
    num_actions = params["fc2"]["w"].shape[1]
    p_greedy = _phi(epsilon)

    padded = ((n + block - 1) // block) * block
    if padded != n:
        obs = jnp.pad(obs, ((0, padded - n), (0, 0)))

    args = []
    for name in ("fc0", "fc1", "fc2"):
        args.append(params[name]["w"].astype(jnp.float32))
        args.append(params[name]["b"].astype(jnp.float32)[None, :])

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    kernel = functools.partial(_actor_kernel, p_greedy=p_greedy,
                               num_actions=num_actions)
    out = pl.pallas_call(
        kernel,
        grid=(padded // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed vector
            pl.BlockSpec((block, d_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(args[0].shape), full(args[1].shape),
            full(args[2].shape), full(args[3].shape),
            full(args[4].shape), full(args[5].shape),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, 1), jnp.int32),
    )(jnp.asarray(seed, jnp.int32).reshape(1), obs.astype(jnp.float32), *args)
    return out[:n, 0]
