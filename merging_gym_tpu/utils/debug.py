"""Runtime validation: the sanitizer story for a jitted SPMD program.

The reference is single-threaded Python with no sanitizers (SURVEY.md
section 5); failure modes here are different -- NaNs silently flowing
through a fused scan, out-of-range actions scattering into replay.  This
module provides:

* :func:`checked` -- wrap a function with ``jax.experimental.checkify``
  so index/NaN/div errors inside jit surface as real errors;
* :func:`assert_finite` -- checkify assertion over a whole PyTree;
* :func:`validate_actions` -- range check for action arrays (the
  sentinel -1 is legal; anything below, or >= NUM_ACTIONS, is not).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from merging_gym_tpu.core import constants as C


def checked(fn, errors=checkify.all_checks):
    """Returns ``(err, out) = wrapped(*args)``; call ``err.throw()``."""
    return checkify.checkify(fn, errors=errors)


def assert_finite(tree, name: str = "tree"):
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            checkify.check(
                jnp.isfinite(leaf).all(),
                f"non-finite value in {name}{jax.tree_util.keystr(path)}")


def validate_actions(actions):
    checkify.check(
        (actions >= C.ACTION_NONE).all() & (actions < C.NUM_ACTIONS).all(),
        "action out of range [-1, NUM_ACTIONS)")
