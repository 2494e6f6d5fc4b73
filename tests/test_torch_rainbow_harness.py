"""Lock the torch parity harness's re-derived C51 projection.

benchmarks/reference_torch_rainbow.py:c51_project realises the
reference's floor/ceil scatter (ranbowdqn.py:566-582) as a dense
hat-weight einsum (VERDICT r3 item 10: re-derive, don't transcribe).
The oracle here is the literal index_add_ scatter -- a DISCLOSED
transcription of the reference's projection arithmetic kept as a test
oracle (the same category as tests/test_segment_tree.py's
RefSegmentTree) -- evaluated in the same f32 torch semantics, so the
comparison is tight (1e-6).  Edge cases covered: Tz clamped at both
support ends (b = 0 exactly: the floor/ceil split assigns weight
(up-b) = (b-lo) = 0 at integral b, the faithful mass-drop quirk),
terminal transitions, signed non-distribution mass (the
support-weighting quirk).
"""

import numpy as np
import torch
import torch.nn.functional as F

from benchmarks.reference_torch_rainbow import (GAMMA, VMAX, VMIN,
                                                c51_project)


def _index_add_oracle(mass, rewards, dones, support):
    """ranbowdqn.py:566-582's scatter, on already-selected mass
    (disclosed test-oracle transcription; f32 torch arithmetic)."""
    n, atoms = mass.shape
    delta_z = (VMAX - VMIN) / (atoms - 1)
    rewards = rewards.unsqueeze(1).expand_as(mass)
    dones = dones.unsqueeze(1).expand_as(mass)
    sup = support.unsqueeze(0).expand_as(mass)
    Tz = (rewards + (1 - dones) * GAMMA * sup).clamp(VMIN, VMAX)
    b = (Tz - VMIN) / delta_z
    lo, up = b.floor().long(), b.ceil().long()
    offset = torch.linspace(0, (n - 1) * atoms, n).long() \
        .unsqueeze(1).expand(n, atoms)
    proj = torch.zeros(mass.size())
    proj.view(-1).index_add_(0, (lo + offset).view(-1),
                             (mass * (up.float() - b)).view(-1))
    proj.view(-1).index_add_(0, (up + offset).view(-1),
                             (mass * (b - lo.float())).view(-1))
    return proj


def _check(mass, rewards, dones, support):
    args = [torch.tensor(a, dtype=torch.float32)
            for a in (mass, rewards, dones, support)]
    got = c51_project(torch, F, *args)
    want = _index_add_oracle(*args)
    np.testing.assert_allclose(got.numpy(), want.numpy(),
                               rtol=1e-5, atol=1e-6)
    return got


def test_projection_matches_scatter_random():
    rng = np.random.default_rng(0)
    n, atoms = 64, 51
    support = np.linspace(VMIN, VMAX, atoms)
    # Support-weighted mass is NOT a distribution (the reference quirk):
    # signed values of magnitude up to ~10.
    mass = rng.standard_normal((n, atoms)) * 3.0
    rewards = rng.uniform(-60, 10, n)          # env rewards incl. -10-ish
    dones = (rng.random(n) < 0.3).astype(np.float64)
    _check(mass, rewards, dones, support)


def test_projection_clamp_ends_integral_b():
    """Tz clamped to VMIN gives b = 0 exactly: integral b, where the
    floor/ceil split drops the mass (weights (up-b) = (b-lo) = 0) -- the
    faithful quirk both implementations must share."""
    atoms = 51
    support = np.linspace(VMIN, VMAX, atoms)
    mass = np.full((1, atoms), 0.5)
    got = _check(mass, np.array([-100.0]), np.array([1.0]), support)
    assert float(got.abs().sum()) == 0.0       # b = 0 exactly: dropped


def test_projection_terminal_and_near_integral():
    """Terminal rewards near atom values: b lands within f32 rounding of
    an integer on some rows -- floor/ceil disagree between f64 math and
    f32 math there, so agreement must come from SAME-dtype arithmetic
    (which both implementations use)."""
    atoms = 51
    support = np.linspace(VMIN, VMAX, atoms)
    rng = np.random.default_rng(7)
    n = atoms
    mass = rng.standard_normal((n, atoms))
    rewards = support.copy()                   # every atom value exactly
    dones = np.ones(n)
    _check(mass, rewards, dones, support)
