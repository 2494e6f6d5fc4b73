"""Geometry unit tests: lon2coord closed form, pygame-rounding model,
collision predicate truth table (SURVEY.md section 4a)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core.geometry import is_collided, lon2coord, round_half_away
from merging_gym_tpu.core.oracle import _lon2coord, _round_half_away


def test_lon2coord_matches_oracle_f64():
    lons = np.linspace(0.0, 1100.0, 997)
    x, y = lon2coord(jnp.asarray(lons), +1.0)
    xo, yo = np.vectorize(lambda l: _lon2coord(l, +1.0))(lons)
    np.testing.assert_allclose(np.asarray(x), xo, rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(y), yo, rtol=0, atol=1e-9)


def test_lon2coord_sides_mirror():
    lon = jnp.asarray(500.0)
    _, y_ego = lon2coord(lon, +1.0)
    _, y_opp = lon2coord(lon, -1.0)
    assert float(y_ego) > C.W / 2 > float(y_opp)
    np.testing.assert_allclose(float(y_ego) - C.W / 2, C.W / 2 - float(y_opp), atol=1e-12)


def test_lanes_converge_at_merge_point():
    # The two lanes are ~0.08 m apart at END_POINT (SURVEY.md section 2.1).
    _, y1 = lon2coord(jnp.asarray(C.END_POINT), +1.0)
    _, y2 = lon2coord(jnp.asarray(C.END_POINT), -1.0)
    gap = float(y1) - float(y2)
    assert 0.05 < gap < 0.12


def test_round_half_away_matches_pygame_rect():
    """The collision model hinges on pygame's Rect centre rounding; verify
    our model against the real thing (reference merging_env.py:232-239)."""
    pygame = pytest.importorskip("pygame")
    pygame.init()
    surf = pygame.surfarray.make_surface(np.ones([4, 8]) * 255)
    rng = np.random.default_rng(0)
    xs = np.concatenate([
        rng.uniform(0, 1100, 300),
        np.arange(0, 30, 0.5),          # exact halves
        np.arange(0, 10, 0.25),
    ])
    ys = rng.uniform(100, 200, xs.shape[0])
    for x, y in zip(xs, ys):
        r = surf.get_rect(center=(y, x))  # swapped as in corners() (:232)
        assert r.centerx == int(_round_half_away(y)), (y, r.centerx)
        assert r.centery == int(_round_half_away(x)), (x, r.centery)
        assert int(round_half_away(jnp.float64(y))) == r.centerx
        assert int(round_half_away(jnp.float64(x))) == r.centery


@pytest.mark.parametrize(
    "dx,dy,expect",
    [
        (0.0, 0.0, True),
        (8.0, 4.0, True),     # boundary touch is a hit (shapely intersects)
        (8.4, 0.0, True),     # rounds to 8 -> touch
        (8.6, 0.0, False),    # rounds to 9 -> miss
        (9.0, 0.0, False),
        (0.0, 4.4, True),
        (0.0, 4.6, False),
        (0.0, 5.0, False),
        (8.0, 5.0, False),
        (9.0, 4.0, False),
    ],
)
def test_collision_truth_table(dx, dy, expect):
    x1, y1 = 500.0, 150.0
    got = bool(is_collided(jnp.float64(x1), jnp.float64(y1),
                           jnp.float64(x1 + dx), jnp.float64(y1 + dy)))
    assert got == expect


def test_collision_matches_pygame_shapely_semantics():
    """Property test: our predicate == AABB overlap of real pygame rects
    (touch-inclusive), across random coordinate pairs."""
    pygame = pytest.importorskip("pygame")
    pygame.init()
    surf = pygame.surfarray.make_surface(np.ones([4, 8]) * 255)
    rng = np.random.default_rng(1)
    for _ in range(500):
        x1, x2 = rng.uniform(40, 1000, 2)
        y1, y2 = rng.uniform(130, 170, 2)
        r1 = surf.get_rect(center=(y1, x1))
        r2 = surf.get_rect(center=(y2, x2))
        # Touch-inclusive AABB overlap of the integer rects == shapely
        # Polygon.intersects on their corners.
        overlap = (r1.left <= r2.right and r2.left <= r1.right
                   and r1.top <= r2.bottom and r2.top <= r1.bottom)
        got = bool(is_collided(jnp.float64(x1), jnp.float64(y1),
                               jnp.float64(x2), jnp.float64(y2)))
        assert got == overlap, (x1, y1, x2, y2)
