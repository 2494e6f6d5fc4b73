"""Pallas TPU kernel: the whole Q-net forward in one fused kernel.

XLA compiles the 3-layer MLP (nn.mlp.qnet_apply) as three matmul
fusions with the intermediate activations round-tripping through HBM.
At DQN sizes every weight matrix (10x200, 200x100, 100x5 f32 ~ 88 KB
total) fits in VMEM with room to spare, so this kernel keeps *all*
weights resident, streams the observation batch through in tiles, and
applies matmul -> bias -> relu -> matmul -> ... entirely on-chip: one
kernel launch, one HBM read of x, one HBM write of q.

The batch tile (by default 512 x padded-feature) obeys the f32 (8, 128)
tiling; feature dims (10/200/100/5) are padded by Mosaic.  Used as an
optional backend for the actor's batched forward (`qnet_apply_fused`);
numerics match qnet_apply to f32 round-off, verified in
tests/test_fused_mlp.py (interpret mode) and on hardware in the bench.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref):
    x = x_ref[:]
    h = jnp.dot(x, w0_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b0_ref[:], 0.0)
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0)
    out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = out + b2_ref[:]


@functools.partial(jax.jit, static_argnames=("block",))
def qnet_apply_fused(params, x, block: int = 512):
    """Fused forward for f32 inputs of shape [B, in_dim]; matches
    nn.mlp.qnet_apply to f32 round-off."""
    assert x.ndim == 2, "fused path expects a batch"
    n = x.shape[0]
    d_in = params["fc0"]["w"].shape[0]
    d_out = params["fc2"]["w"].shape[1]

    padded = ((n + block - 1) // block) * block
    if padded != n:
        x = jnp.pad(x, ((0, padded - n), (0, 0)))

    args = []
    for name in ("fc0", "fc1", "fc2"):
        args.append(params[name]["w"].astype(jnp.float32))
        args.append(params[name]["b"].astype(jnp.float32)[None, :])

    grid = (padded // block,)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mlp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(args[0].shape), full(args[1].shape),
            full(args[2].shape), full(args[3].shape),
            full(args[4].shape), full(args[5].shape),
        ],
        out_specs=pl.BlockSpec((block, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, d_out), jnp.float32),
    )(x.astype(jnp.float32), *args)
    return out[:n]
