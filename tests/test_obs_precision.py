"""f32 observation error budget (VERDICT r1, weak item 5).

The device path computes the 10-dim observation (merging_env.py:118-132)
in float32.  Two rounding sources exist:

* the ``x2 - x1`` / ``x1 - x2`` deltas (dims 0/5) subtract two
  O(1e3)-scale ``R*sin(angle)`` values (core/env.py:91); the versine fix
  (core/geometry.py:30-33) covers only the lateral ``y`` coordinate;
* the state itself is stored in f32 (pos ulp ~6e-5 at pos~950), flooring
  every position-derived dim.

This test pins the measured budget over a dense sweep of the reachable
state space against the f64 oracle (core/oracle.py:_lon2coord):

  dims 0/5 (x-deltas):    max |err| <= 4e-4   (measured 1.6e-4)
  dims 1/6 (y-deltas):    max |err| <= 1e-4   (measured 1.7e-5)
  dims 3/8 (END - pos):   max |err| <= 1e-4   (measured 4.5e-5, = f32
                                               storage ulp of pos)
  velocity dims 2/4/7/9:  max |err| <= 1e-5

Why no trig-identity delta form for dims 0/5 (the analog of the versine
fix): the achievable gain is bounded by the f32 *state storage* floor
(~6e-5) at ~3x below the current worst case, while the relative error
against the feature's O(1e2-1e3) scale is already ~1e-7 -- orders below
anything the Q-nets resolve -- and the fused kernels cache (x, y)
coordinates, not angles, so a delta form would ripple through every
kernel's state layout.  Documented in docs/PARITY.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from merging_gym_tpu.core import env as E
from merging_gym_tpu.core.oracle import _lon2coord

BUDGET = {0: 4e-4, 1: 1e-4, 2: 1e-5, 3: 1e-4, 4: 1e-5,
          5: 4e-4, 6: 1e-4, 7: 1e-5, 8: 1e-4, 9: 1e-5}


def _obs64(p1, p2, v1, v2):
    out = np.empty((p1.size, 10))
    for i in range(p1.size):
        x1, y1 = _lon2coord(p1[i], +1.0)
        x2, y2 = _lon2coord(p2[i], -1.0)
        out[i] = [x2 - x1, y2 - y1, v2[i] - v1[i], 950.0 - p1[i], v1[i],
                  x1 - x2, y1 - y2, v1[i] - v2[i], 950.0 - p2[i], v2[i]]
    return out


def _obs32(p1, p2, v1, v2):
    n = p1.size
    state = E.EnvState(
        pos=jnp.stack([p1, p2], -1).astype(jnp.float32),
        vel=jnp.stack([v1, v2], -1).astype(jnp.float32),
        acc=jnp.zeros((n, 2), jnp.float32), t=jnp.zeros(n, jnp.int32),
        winner=jnp.zeros(n, jnp.int32), done=jnp.zeros(n, bool),
        r_acc=jnp.zeros((n, 2), jnp.float32))
    return np.asarray(jax.vmap(E.observe)(state))


@pytest.mark.parametrize("sweep", ["grid", "random"])
def test_f32_obs_error_within_budget(sweep):
    if sweep == "grid":
        pos = np.linspace(50.0, 960.0, 300)
        p1, p2 = (a.ravel() for a in np.meshgrid(pos, pos))
        v1 = np.linspace(0.0, 45.0, p1.size) % 45.0
        v2 = (np.linspace(0.0, 45.0, p1.size) * 1.7) % 45.0
    else:
        rng = np.random.default_rng(0)
        p1 = rng.uniform(50.0, 960.0, 50_000)
        p2 = rng.uniform(50.0, 960.0, 50_000)
        v1 = rng.uniform(0.0, 45.0, 50_000)
        v2 = rng.uniform(0.0, 45.0, 50_000)
    # The f32 path sees f32-quantised state; quantise the oracle's inputs
    # the same way so the measurement isolates the OBS computation + the
    # storage floor rather than input-quantisation noise.
    p1, p2, v1, v2 = (x.astype(np.float32).astype(np.float64)
                      for x in (p1, p2, v1, v2))
    err = np.abs(_obs32(p1, p2, v1, v2) - _obs64(p1, p2, v1, v2))
    for d, bound in BUDGET.items():
        assert err[:, d].max() <= bound, (
            f"obs dim {d}: max f32 error {err[:, d].max():.3e} "
            f"exceeds budget {bound:.1e}")
