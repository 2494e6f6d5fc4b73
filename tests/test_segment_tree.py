"""Segment-tree ops vs a direct port of the reference implementation."""

import operator

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.ops import segment_tree as st


class RefSegmentTree:
    """Direct port of ranbowdqn.py:130-248 for oracle comparison."""

    def __init__(self, capacity, op, neutral):
        self.cap = capacity
        self.v = [neutral] * (2 * capacity)
        self.op = op

    def __setitem__(self, idx, val):
        idx += self.cap
        self.v[idx] = val
        idx //= 2
        while idx >= 1:
            self.v[idx] = self.op(self.v[2 * idx], self.v[2 * idx + 1])
            idx //= 2

    def total(self):
        return self.v[1]

    def find_prefixsum_idx(self, prefixsum):
        idx = 1
        while idx < self.cap:
            if self.v[2 * idx] > prefixsum:
                idx = 2 * idx
            else:
                prefixsum -= self.v[2 * idx]
                idx = 2 * idx + 1
        return idx - self.cap


def test_sum_tree_matches_reference():
    cap = 16
    rng = np.random.default_rng(0)
    ref = RefSegmentTree(cap, operator.add, 0.0)
    state = st.tree_init(cap, "sum")
    vals = rng.uniform(0.1, 2.0, cap).astype(np.float32)
    for i, v in enumerate(vals):
        ref[i] = float(v)
    state = st.tree_set(state, jnp.arange(cap), jnp.asarray(vals))
    np.testing.assert_allclose(float(st.tree_total(state)), ref.total(), rtol=1e-6)

    for mass in rng.uniform(0, ref.total() - 1e-3, 50):
        expect = ref.find_prefixsum_idx(float(mass))
        got = int(st.find_prefixsum_idx(state, jnp.float32(mass))[0])
        assert got == expect, (mass, got, expect)


def test_min_tree():
    cap = 8
    state = st.tree_init(cap, "min")
    vals = jnp.asarray([5.0, 3.0, 9.0, 1.0, 7.0, 2.0, 8.0, 4.0])
    state = st.tree_set(state, jnp.arange(cap), vals)
    assert float(st.tree_total(state)) == 1.0
    state = st.tree_set(state, jnp.asarray([3]), jnp.asarray([10.0]))
    assert float(st.tree_total(state)) == 2.0


def test_partial_update_rebuild():
    cap = 8
    state = st.tree_init(cap, "sum")
    state = st.tree_set(state, jnp.arange(cap), jnp.ones(cap, jnp.float32))
    assert float(st.tree_total(state)) == 8.0
    state = st.tree_set(state, jnp.asarray([2, 5]), jnp.asarray([3.0, 0.0]))
    assert float(st.tree_total(state)) == 9.0
    # batch descent
    idx = st.find_prefixsum_idx(state, jnp.asarray([0.5, 1.5, 4.9, 8.99]))
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 7])


def test_jit_and_vmap():
    cap = 32
    state = st.tree_init(cap, "sum")
    set_fn = jax.jit(st.tree_set)
    state = set_fn(state, jnp.arange(cap), jnp.arange(1.0, cap + 1.0))
    find = jax.jit(st.find_prefixsum_idx)
    masses = jnp.linspace(0.0, float(st.tree_total(state)) - 1e-3, 64)
    idx = find(state, masses)
    assert idx.shape == (64,)
    assert int(idx.min()) >= 0 and int(idx.max()) < cap
