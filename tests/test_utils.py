"""utils tests: checkify wrappers, throughput timer."""

import jax
import jax.numpy as jnp
import pytest

from merging_gym_tpu.utils.debug import assert_finite, checked, validate_actions
from merging_gym_tpu.utils.profiling import ThroughputTimer, time_fn


def test_checked_catches_nan():
    def bad(x):
        assert_finite({"x": x}, "input")
        return x * 2

    fn = checked(bad)
    err, out = jax.jit(fn)(jnp.asarray([1.0, 2.0]))
    err.throw()  # no error
    err, out = jax.jit(fn)(jnp.asarray([1.0, jnp.nan]))
    with pytest.raises(Exception, match="non-finite"):
        err.throw()


def test_validate_actions():
    def f(a):
        validate_actions(a)
        return a

    fn = checked(f)
    err, _ = fn(jnp.asarray([-1, 0, 4], jnp.int32))
    err.throw()
    err, _ = fn(jnp.asarray([5], jnp.int32))
    with pytest.raises(Exception, match="out of range"):
        err.throw()


def test_throughput_timer():
    t = ThroughputTimer()
    x = jnp.ones((128, 128))
    t.start()
    y = x @ x
    t.stop(128, y)
    assert t.per_second > 0
    assert t.items == 128


def test_time_fn():
    f = jax.jit(lambda x: x * 2)
    mean_s, out = time_fn(f, jnp.ones((64,)), iters=3)
    assert mean_s > 0
    assert out.shape == (64,)
