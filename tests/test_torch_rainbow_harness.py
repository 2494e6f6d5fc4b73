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


# ---------------------------------------------------------------------------
# NoisyLinear de-transcription lock (VERDICT r4 item 7): the harness's
# disclosed NoisyLinear transcription vs the package's nn.noisy -- the
# two must agree on (a) exact forward semantics under transplanted
# params/noise, (b) the deterministic sigma fills, and (c) the
# init/noise DISTRIBUTIONS (mu range; factorized rank-1 sign*sqrt
# noise moments) -- so the measurement instrument and the package layer
# are locked to one definition.
# ---------------------------------------------------------------------------

def _torch_noisy(n_in=64, n_out=64, seed=0):
    import torch.nn as nn

    from benchmarks.reference_torch_rainbow import build_model
    torch.manual_seed(seed)
    model = build_model(torch, nn, F)()
    layer = model.noisy_value1
    assert layer.n_in == n_in and layer.n_out == n_out
    return layer


def test_noisy_forward_semantics_match_package():
    """Transplant the torch layer's (mu, sigma, eps) into nn.noisy and
    require identical outputs: the forward semantics of the disclosed
    transcription and the package layer are one function."""
    import jax
    import jax.numpy as jnp

    from merging_gym_tpu.nn.noisy import noisy_apply

    layer = _torch_noisy(seed=3)
    params = {
        "w_mu": jnp.asarray(layer.weight_mu.detach().numpy().T),
        "w_sigma": jnp.asarray(layer.weight_sigma.detach().numpy().T),
        "b_mu": jnp.asarray(layer.bias_mu.detach().numpy()),
        "b_sigma": jnp.asarray(layer.bias_sigma.detach().numpy()),
    }
    noise = {
        "w_eps": jnp.asarray(layer.weight_epsilon.numpy().T),
        "b_eps": jnp.asarray(layer.bias_epsilon.numpy()),
    }
    x = np.random.default_rng(0).standard_normal((16, 64)).astype(np.float32)
    want = layer(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(noisy_apply(params, jnp.asarray(x), noise))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # Eval mode (mu-only) too.
    got_eval = np.asarray(noisy_apply(params, jnp.asarray(x), None))
    want_eval = (x @ layer.weight_mu.detach().numpy().T
                 + layer.bias_mu.detach().numpy())
    np.testing.assert_allclose(got_eval, want_eval, rtol=1e-5, atol=1e-5)


def test_noisy_init_and_noise_statistics_match_package():
    """Init/noise distribution lock: exact sigma fills, mu uniform range,
    rank-1 factorized noise with sign*sqrt moments, on both sides."""
    import jax
    import jax.numpy as jnp

    from merging_gym_tpu.nn.noisy import noisy_init, noisy_sample_noise

    n_in = n_out = 64
    t_mu, t_beps, j_mu, j_beps = [], [], [], []
    for s in range(40):
        layer = _torch_noisy(seed=100 + s)
        jp = noisy_init(jax.random.key(s), n_in, n_out)
        jn = noisy_sample_noise(jax.random.key(1000 + s), n_in, n_out)
        # (b) deterministic sigma fills: exactly equal constants.
        np.testing.assert_array_equal(
            layer.weight_sigma.detach().numpy(),
            np.full((n_out, n_in), 0.4 / np.sqrt(n_in), np.float32))
        np.testing.assert_array_equal(
            np.asarray(jp["w_sigma"]),
            np.full((n_in, n_out), 0.4 / np.sqrt(n_in), np.float32))
        np.testing.assert_array_equal(
            layer.bias_sigma.detach().numpy(),
            np.full((n_out,), 0.4 / np.sqrt(n_out), np.float32))
        np.testing.assert_array_equal(
            np.asarray(jp["b_sigma"]),
            np.full((n_out,), 0.4 / np.sqrt(n_out), np.float32))
        # mu strictly inside +-1/sqrt(n_in) on both sides.
        r = 1.0 / np.sqrt(n_in)
        for m in (layer.weight_mu.detach().numpy(),
                  layer.bias_mu.detach().numpy(),
                  np.asarray(jp["w_mu"]), np.asarray(jp["b_mu"])):
            assert np.abs(m).max() <= r
        # (c) factorized weight noise is EXACTLY rank 1 on both sides.
        for eps in (layer.weight_epsilon.numpy(),
                    np.asarray(jn["w_eps"])):
            sv = np.linalg.svd(eps.astype(np.float64), compute_uv=False)
            assert sv[1] <= 1e-6 * max(sv[0], 1e-30)
        t_mu.append(layer.weight_mu.detach().numpy().ravel())
        j_mu.append(np.asarray(jp["w_mu"]).ravel())
        t_beps.append(layer.bias_epsilon.numpy())
        j_beps.append(np.asarray(jn["b_eps"]))
    # Distribution moments agree across the two RNG families: mu is
    # U(-r, r) (mean 0, var r^2/3); bias eps is sign*sqrt(|N(0,1)|)
    # (mean 0, second moment E|x| = sqrt(2/pi)).
    t_mu, j_mu = np.concatenate(t_mu), np.concatenate(j_mu)
    t_b, j_b = np.concatenate(t_beps), np.concatenate(j_beps)
    r = 1.0 / np.sqrt(n_in)
    for arr in (t_mu, j_mu):
        assert abs(arr.mean()) < 0.02 * r
        np.testing.assert_allclose(arr.var(), r * r / 3.0, rtol=0.05)
    for arr in (t_b, j_b):
        assert abs(arr.mean()) < 0.05
        np.testing.assert_allclose((arr ** 2).mean(), np.sqrt(2 / np.pi),
                                   rtol=0.1)
