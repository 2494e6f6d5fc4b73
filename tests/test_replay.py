"""On-device replay ring tests: wraparound, masked store, sampling gates."""

import jax
import jax.numpy as jnp
import numpy as np

from merging_gym_tpu.ops import replay as rp


def _example():
    return {"x": jnp.zeros((3,), jnp.float32), "a": jnp.zeros((), jnp.int32)}


def test_ring_wraparound():
    st = rp.replay_init(8, _example())
    for i in range(3):  # write 3 batches of 5 -> 15 writes into 8 slots
        items = {
            "x": jnp.full((5, 3), i * 5, jnp.float32) + jnp.arange(5, dtype=jnp.float32)[:, None],
            "a": jnp.arange(5, dtype=jnp.int32) + i * 5,
        }
        st = rp.add_batch(st, items)
    assert int(st.cursor) == 15
    # Slot k holds the latest write with index ≡ k (mod 8): indices 8..14
    # overwrote slots 0..6; slot 7 still holds index 7.
    np.testing.assert_array_equal(np.asarray(st.data["a"]),
                                  [8, 9, 10, 11, 12, 13, 14, 7])


def test_masked_store_skips_without_consuming_slots():
    st = rp.replay_init(8, _example())
    items = {
        "x": jnp.arange(18, dtype=jnp.float32).reshape(6, 3),
        "a": jnp.arange(6, dtype=jnp.int32),
    }
    mask = jnp.asarray([True, False, True, True, False, True])
    st = rp.add_batch(st, items, mask)
    assert int(st.cursor) == 4
    np.testing.assert_array_equal(np.asarray(st.data["a"][:4]), [0, 2, 3, 5])
    assert not bool(rp.can_learn(st))


def test_can_learn_gate_and_sampling():
    st = rp.replay_init(4, _example())
    items = {"x": jnp.ones((4, 3), jnp.float32), "a": jnp.arange(4, dtype=jnp.int32)}
    st = rp.add_batch(st, items)
    assert bool(rp.can_learn(st))
    batch, idx = rp.sample(st, jax.random.key(0), 64)
    assert batch["a"].shape == (64,)
    assert int(idx.min()) >= 0 and int(idx.max()) < 4
    # with-replacement over full capacity: all slots reachable
    assert len(np.unique(np.asarray(idx))) == 4


def test_sample_valid_respects_fill():
    st = rp.replay_init(8, _example())
    items = {"x": jnp.ones((3, 3), jnp.float32), "a": jnp.asarray([5, 6, 7], jnp.int32)}
    st = rp.add_batch(st, items)
    batch, idx = rp.sample_valid(st, jax.random.key(1), 32)
    assert int(idx.max()) < 3


def test_add_batch_jits_and_wraps_masked():
    st = rp.replay_init(4, _example())
    add = jax.jit(rp.add_batch)
    for i in range(5):
        items = {"x": jnp.full((3, 3), float(i), jnp.float32),
                 "a": jnp.full((3,), i, jnp.int32)}
        mask = jnp.asarray([True, True, i % 2 == 0])
        st = add(st, items, mask)
    # writes: i0:3, i1:2, i2:3, i3:2, i4:3 = 13
    assert int(st.cursor) == 13
