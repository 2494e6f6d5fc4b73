"""Distributed fused-kernel trainer (local-SGD over the mesh).

Pallas interpret mode inside shard_map on the 8-device virtual CPU mesh:

* on a 1-device mesh the wrapper is EXACTLY the single-chip
  ``fused_dqn_chunk`` (same kernel, same streams) -- locked bit-for-bit;
* on 8 devices: params/moments stay replicated by construction, metrics
  aggregate over all lanes, learning proceeds (params move, loss
  finite), and the ring stays lane-sharded.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from merging_gym_tpu.agents.dqn import DQNConfig
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.ops import fused_trainer as FT
from merging_gym_tpu.parallel.spmd import (spmd_fused_dqn_chunk,
                                           spmd_fused_dqn_init)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(FT.pl, "pallas_call", patched)
    yield


_INPROC = os.environ.get("MGT_SPMD_INPROC") == "1"


def _run_in_fresh_process(test_name):
    """Run one heavy spmd lock in a fresh interpreter.

    XLA:CPU crashes (SIGSEGV or SIGABRT inside backend_compile) when
    compiling a LARGE shard_map interpret program late in a long-lived
    full-suite process: 5/5 full-suite runs died at the first such
    compile -- the drqn one-device lock four times, then (with the drqn
    trio isolated) the dqn two-device lock -- while the identical
    programs compile and pass in ANY shorter session (this file alone,
    every bisected subset).  The trigger is accumulated in-process
    compiler state crossing some threshold, not any specific program or
    predecessor (bisects over the native/ctypes, ui/io and multiprocess
    files all pass).  Until that upstream compiler bug is fixed, the
    seven largest locks here (the three drqn tests and the four
    two-device pmean tests, none of which had ever executed inside a
    full suite before round 4b) each run in a fresh interpreter; set
    MGT_SPMD_INPROC=1 to run them in-process for debugging."""
    # -n 0 -p no:cacheprovider: without them the nested pytest inherits
    # addopts "-n 2" from pyproject and spins up an xdist controller +
    # two workers for a single test (ADVICE r4) -- the isolated run must
    # be one plain fresh interpreter, which is also what the
    # MGT_SPMD_INPROC=1 debugging story promises.
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x", "-n", "0",
         "-p", "no:cacheprovider", f"{__file__}::{test_name}"],
        capture_output=True, text=True, timeout=1800,
        env=dict(os.environ, MGT_SPMD_INPROC="1"))
    assert r.returncode == 0, (
        f"isolated {test_name} failed:\n"
        f"{r.stdout[-3000:]}\n{r.stderr[-2000:]}")


def _shrink(carry):
    carry["p"] = tuple((a - jnp.mean(a)) * 0.05 for a in carry["p"])
    carry["tp"] = tuple((a - jnp.mean(a)) * 0.05 for a in carry["tp"])
    carry["opp"] = carry["p"]
    return carry


def test_one_device_mesh_equals_single_chip():
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    n, T, seed = 128, 10, 7
    cfg = DQNConfig(lr=1e-3, target_sync=4, memory_capacity=2 * n,
                    opponent=FT.OPP_SELFPLAY)
    ep = EnvParams(max_steps=25)

    dist = _shrink(spmd_fused_dqn_init(jax.random.key(0), cfg, ep, n, mesh))
    solo = _shrink(FT.fused_dqn_init(
        jax.random.key(0), cfg.replace(memory_capacity=2 * n), ep, n))

    dist = spmd_fused_dqn_chunk(mesh, cfg, ep, dist, T, seed, greedy=True)
    # The wrapper's device stream: dev_seed = seed*ndev + idx, rounds/cols
    # from fold_in(key(seed ^ 0x5EED), idx).
    kd = jax.random.fold_in(jax.random.key(seed ^ 0x5EED), 0)
    k_r, k_c = jax.random.split(kd)
    rounds = jax.random.randint(k_r, (T,), 0, solo["R"], jnp.int32)
    cols = jax.random.randint(k_c, (T,), 0, 1, jnp.int32)
    solo = FT.fused_dqn_chunk(cfg, ep, solo, T, seed=seed * 1 + 0,
                              greedy=True, rounds=rounds, cols=cols)

    for k in ("p", "tp", "m", "v"):
        for a, b in zip(dist[k], solo[k]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), k)
    np.testing.assert_array_equal(np.asarray(dist["env"]),
                                  np.asarray(solo["env"]))
    np.testing.assert_array_equal(np.asarray(dist["ring"]),
                                  np.asarray(solo["ring"]))
    for k in ("learns", "steps", "env_steps", "episodes", "collisions",
              "wins", "last_loss"):
        assert dist[k] == solo[k], k


def test_eight_device_local_sgd(devices8):
    mesh = Mesh(np.asarray(devices8), ("data",))
    n, T = 8 * 128, 8
    cfg = DQNConfig(lr=1e-3, target_sync=3, memory_capacity=2 * n,
                    opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=20)

    carry = _shrink(spmd_fused_dqn_init(jax.random.key(1), cfg, ep, n, mesh))
    p0 = carry["p"]
    carry = spmd_fused_dqn_chunk(mesh, cfg, ep, carry, T, seed=3, greedy=True)
    carry = spmd_fused_dqn_chunk(mesh, cfg, ep, carry, T, seed=4, greedy=True)

    assert carry["env_steps"] == 2 * T * n
    assert carry["steps"] == 2 * T
    assert carry["learns"] == (T - 1) + T          # R=2: warm-up once
    assert np.isfinite(carry["last_loss"])
    assert any(bool(jnp.any(a != b)) for a, b in zip(p0, carry["p"]))
    # Replication by construction: averaged params come back unsharded.
    for a in carry["p"]:
        assert a.shape[0] > 0 and not np.isnan(np.asarray(a)).any()
    assert carry["ring"].shape == (2 * FT.NUM_F, n)


def test_hdqn_one_device_mesh_equals_single_chip():
    from merging_gym_tpu.agents.hdqn import HDQNConfig
    from merging_gym_tpu.ops import fused_hdqn as FH
    from merging_gym_tpu.parallel.spmd import (spmd_fused_hdqn_chunk,
                                               spmd_fused_hdqn_init)

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    n, T, seed = 128, 8, 9
    cfg = HDQNConfig(lr=1e-3, target_sync=3, memory_capacity=2 * n,
                     goal_memory_capacity=2 * n, opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=20)

    def shrink(c):
        for k in ("u_p", "u_tp", "l_p", "l_tp"):
            c[k] = tuple((a - jnp.mean(a)) * 0.05 for a in c[k])
        c["opp_u"], c["opp_l"] = c["u_p"], c["l_p"]
        return c

    dist = shrink(spmd_fused_hdqn_init(jax.random.key(0), cfg, ep, n, mesh))
    solo = shrink(FH.fused_hdqn_init(jax.random.key(0), cfg, ep, n))

    dist = spmd_fused_hdqn_chunk(mesh, cfg, ep, dist, T, seed, greedy=True)
    kd = jax.random.fold_in(jax.random.key(seed ^ 0x4D0), 0)
    k1, k2 = jax.random.split(kd)
    lo_r = jax.random.randint(k1, (T,), 0, 2, jnp.int32)
    up_r = jax.random.randint(k2, (T,), 0, 2, jnp.int32)
    solo = FH.fused_hdqn_chunk(cfg, ep, solo, T, seed=seed * T, greedy=True,
                               lo_rounds=lo_r, up_rounds=up_r)

    for k in ("u_p", "l_p", "u_m", "l_v"):
        for a, b in zip(dist[k], solo[k]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), k)
    np.testing.assert_array_equal(np.asarray(dist["state"]),
                                  np.asarray(solo["state"]))
    np.testing.assert_array_equal(np.asarray(dist["lo_ring"]),
                                  np.asarray(solo["lo_ring"]))
    np.testing.assert_array_equal(np.asarray(dist["up_ring"]),
                                  np.asarray(solo["up_ring"]))
    for k in ("lo_learns", "steps", "env_steps", "episodes", "last_loss"):
        assert dist[k] == solo[k], k


def test_hdqn_eight_device_local_sgd(devices8):
    from merging_gym_tpu.agents.hdqn import HDQNConfig
    from merging_gym_tpu.parallel.spmd import (spmd_fused_hdqn_chunk,
                                               spmd_fused_hdqn_init)

    mesh = Mesh(np.asarray(devices8), ("data",))
    n, T = 8 * 128, 6
    cfg = HDQNConfig(lr=1e-3, target_sync=3, memory_capacity=2 * n,
                     goal_memory_capacity=2 * n, opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=20)
    carry = spmd_fused_hdqn_init(jax.random.key(1), cfg, ep, n, mesh)
    for k in ("u_p", "u_tp", "l_p", "l_tp"):
        carry[k] = tuple((a - jnp.mean(a)) * 0.05 for a in carry[k])
    carry["opp_u"], carry["opp_l"] = carry["u_p"], carry["l_p"]
    p0 = carry["l_p"]
    carry = spmd_fused_hdqn_chunk(mesh, cfg, ep, carry, T, seed=5, greedy=True)
    carry = spmd_fused_hdqn_chunk(mesh, cfg, ep, carry, T, seed=6, greedy=True)
    assert carry["env_steps"] == 2 * T * n
    assert np.isfinite(carry["last_loss"])
    assert any(bool(jnp.any(a != b)) for a, b in zip(p0, carry["l_p"]))


def test_rainbow_one_device_mesh_equals_single_chip():
    from merging_gym_tpu.agents.rainbow import RainbowConfig
    from merging_gym_tpu.ops import fused_rainbow as FRB
    from merging_gym_tpu.parallel.spmd import (spmd_fused_rainbow_chunk,
                                               spmd_fused_rainbow_init)

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    n, T, seed = 128, 8, 13
    cfg = RainbowConfig(lr=1e-3, target_sync_episodes=3,
                        memory_capacity=2 * n, obs_scale=0.01,
                        opponent=FT.OPP_SELFPLAY)
    ep = EnvParams(max_steps=15)

    dist = spmd_fused_rainbow_init(jax.random.key(0), cfg, ep, n, mesh)
    solo = FRB.fused_rainbow_init(jax.random.key(0), cfg, ep, n)
    # Same noise streams (the spmd init draws per-device noise).
    solo["eps"], solo["teps"] = tuple(dist["eps"]), tuple(dist["teps"])

    dist = spmd_fused_rainbow_chunk(mesh, cfg, ep, dist, T, seed,
                                    greedy=True)
    # Reproduce the spmd wrapper's device-0 round stream (the shared
    # draw: FRB.draw_start_rounds on the per-device split key).
    k0 = jax.random.split(jax.random.key(seed ^ 0x51C), 1)[0]
    rounds = np.asarray(FRB.draw_start_rounds(solo, T, k0, 1))
    solo = FRB.fused_rainbow_chunk(cfg, ep, solo, T, seed=seed * T,
                                   greedy=True, rounds=rounds)

    for k in ("p", "tp", "m", "v", "eps", "teps"):
        for a, b in zip(dist[k], solo[k]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), k)
    np.testing.assert_array_equal(np.asarray(dist["env"]),
                                  np.asarray(solo["env"]))
    np.testing.assert_array_equal(np.asarray(dist["ring"]),
                                  np.asarray(solo["ring"]))
    for k in ("learns", "steps", "env_steps", "episodes", "last_loss"):
        assert dist[k] == solo[k], k


def test_rainbow_eight_device_local_sgd(devices8):
    from merging_gym_tpu.agents.rainbow import RainbowConfig
    from merging_gym_tpu.parallel.spmd import (spmd_fused_rainbow_chunk,
                                               spmd_fused_rainbow_init)

    mesh = Mesh(np.asarray(devices8), ("data",))
    n, T = 8 * 128, 5
    cfg = RainbowConfig(lr=1e-3, target_sync_episodes=5,
                        memory_capacity=2 * n, obs_scale=0.01,
                        opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=15)
    carry = spmd_fused_rainbow_init(jax.random.key(1), cfg, ep, n, mesh)
    # Per-device noise shards must be distinct draws.
    e = np.asarray(carry["eps"][0])
    assert not np.array_equal(e[:, :64], e[:, 64:128])
    p0 = carry["p"]
    carry = spmd_fused_rainbow_chunk(mesh, cfg, ep, carry, T, seed=2,
                                     greedy=True)
    carry = spmd_fused_rainbow_chunk(mesh, cfg, ep, carry, T, seed=3,
                                     greedy=True)
    assert carry["env_steps"] == 2 * T * n
    assert np.isfinite(carry["last_loss"])
    assert any(bool(jnp.any(a != b)) for a, b in zip(p0, carry["p"]))
    assert carry["ring"].shape == (2 * FT.NUM_F, n)


def test_rainbow_per_nstep_one_device_mesh_equals_single_chip():
    """PER + 3-step through the SPMD wrapper: a 1-device mesh matches
    the single-chip kernel bit-for-bit (same us/priority streams)."""
    from merging_gym_tpu.agents.rainbow import RainbowConfig
    from merging_gym_tpu.ops import fused_rainbow as FRB
    from merging_gym_tpu.parallel.spmd import (spmd_fused_rainbow_chunk,
                                               spmd_fused_rainbow_init)

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    n, T, seed = 128, 10, 17
    cfg = RainbowConfig(lr=1e-3, target_sync_episodes=3,
                        memory_capacity=5 * n, obs_scale=0.01,
                        opponent=FT.OPP_SELFPLAY, per=True, n_step=3,
                        batch_size=32)
    ep = EnvParams(max_steps=15)

    dist = spmd_fused_rainbow_init(jax.random.key(0), cfg, ep, n, mesh)
    solo = FRB.fused_rainbow_init(jax.random.key(0), cfg, ep, n)
    solo["eps"], solo["teps"] = tuple(dist["eps"]), tuple(dist["teps"])

    dist = spmd_fused_rainbow_chunk(mesh, cfg, ep, dist, T, seed,
                                    greedy=True)
    # Reproduce the wrapper's device-0 us stream.
    ku = jax.random.fold_in(jax.random.key(seed ^ 0xBE7), 0)
    us = jax.random.uniform(ku, (T,), jnp.float32)
    solo = FRB.fused_rainbow_chunk(cfg, ep, solo, T, seed=seed * T,
                                   greedy=True,
                                   rounds=np.zeros(T, np.int32), us=us)

    for k in ("p", "tp", "m", "v", "eps", "teps"):
        for a, b in zip(dist[k], solo[k]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), k)
    np.testing.assert_array_equal(np.asarray(dist["env"]),
                                  np.asarray(solo["env"]))
    np.testing.assert_array_equal(np.asarray(dist["ring"]),
                                  np.asarray(solo["ring"]))
    for k in ("learns", "steps", "env_steps", "episodes", "last_loss"):
        assert dist[k] == solo[k], k


def test_rainbow_per_eight_device_local_sgd(devices8):
    """PER + 3-step over 8 devices: per-device local PER buffers
    (lane-sharded ring priorities), pmax'd running max, params move."""
    from merging_gym_tpu.agents.rainbow import RainbowConfig
    from merging_gym_tpu.parallel.spmd import (spmd_fused_rainbow_chunk,
                                               spmd_fused_rainbow_init)

    mesh = Mesh(np.asarray(devices8), ("data",))
    n, T = 8 * 128, 6
    cfg = RainbowConfig(lr=1e-3, target_sync_episodes=5,
                        memory_capacity=5 * n, obs_scale=0.01,
                        opponent=FT.OPP_L0, per=True, n_step=3,
                        batch_size=32)
    ep = EnvParams(max_steps=15)
    carry = spmd_fused_rainbow_init(jax.random.key(1), cfg, ep, n, mesh)
    p0 = carry["p"]
    carry = spmd_fused_rainbow_chunk(mesh, cfg, ep, carry, T, seed=4,
                                     greedy=True)
    carry = spmd_fused_rainbow_chunk(mesh, cfg, ep, carry, T, seed=5,
                                     greedy=True)
    assert carry["env_steps"] == 2 * T * n
    assert np.isfinite(carry["last_loss"])
    assert any(bool(jnp.any(a != b)) for a, b in zip(p0, carry["p"]))
    env = np.asarray(carry["env"])
    # The running max is globally replicated (chunk-boundary pmax) and
    # has moved off its init.
    assert np.unique(env[13]).size == 1 and env[13][0] > 1.0
    # Ring pad rows now carry priorities (some updated away from init).
    ring = np.asarray(carry["ring"])
    pri = ring[FT.NUM_F - 1::FT.NUM_F]
    assert (pri > 0).any()


# ---------------------------------------------------------------------------
# DRQN wrapper (round 4)
# ---------------------------------------------------------------------------

def test_drqn_one_device_mesh_equals_single_chip():
    if not _INPROC:
        _run_in_fresh_process("test_drqn_one_device_mesh_equals_single_chip")
        return
    from merging_gym_tpu.agents.drqn import DRQNConfig
    from merging_gym_tpu.ops import fused_drqn as FD
    from merging_gym_tpu.parallel.spmd import (spmd_fused_drqn_chunk,
                                               spmd_fused_drqn_init)

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    n, T, seed = 128, 10, 5
    cfg = DRQNConfig(lr=1e-3, target_sync=3, seq_len=4, burn_in=1,
                     memory_capacity=2 * n, opponent=FT.OPP_SELFPLAY)
    ep = EnvParams(max_steps=20)

    dist = _shrink(spmd_fused_drqn_init(jax.random.key(0), cfg, ep, n, mesh))
    solo = _shrink(FD.fused_drqn_init(jax.random.key(0), cfg, ep, n))

    dist = spmd_fused_drqn_chunk(mesh, cfg, ep, dist, T, seed, greedy=True)
    kd = jax.random.fold_in(jax.random.key(seed ^ 0xD7D7), 0)
    k_r, k_c = jax.random.split(kd)
    rounds = jax.random.randint(k_r, (T,), 0, solo["R"], jnp.int32)
    cols = jax.random.randint(k_c, (T,), 0, 1, jnp.int32)
    solo = FD.fused_drqn_chunk(cfg, ep, solo, T, seed=seed, greedy=True,
                               rounds=rounds, cols=cols)

    for k in ("p", "tp", "m", "v"):
        for a, b in zip(dist[k], solo[k]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), k)
    for k in ("env", "win", "ring"):
        np.testing.assert_array_equal(np.asarray(dist[k]),
                                      np.asarray(solo[k]), k)
    for k in ("learns", "steps", "env_steps", "episodes", "collisions",
              "wins", "last_loss"):
        assert dist[k] == solo[k], k


def test_drqn_eight_device_local_sgd(devices8):
    if not _INPROC:
        _run_in_fresh_process("test_drqn_eight_device_local_sgd")
        return
    from merging_gym_tpu.agents.drqn import DRQNConfig
    from merging_gym_tpu.parallel.spmd import (spmd_fused_drqn_chunk,
                                               spmd_fused_drqn_init)

    mesh = Mesh(np.asarray(devices8), ("data",))
    n, T = 8 * 128, 10
    cfg = DRQNConfig(lr=1e-3, target_sync=3, seq_len=4, burn_in=1,
                     memory_capacity=2 * n, opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=20)
    carry = _shrink(spmd_fused_drqn_init(jax.random.key(1), cfg, ep, n, mesh))
    p0 = carry["p"]
    carry = spmd_fused_drqn_chunk(mesh, cfg, ep, carry, T, seed=3, greedy=True)
    carry = spmd_fused_drqn_chunk(mesh, cfg, ep, carry, T, seed=4, greedy=True)
    assert carry["env_steps"] == 2 * T * n
    assert carry["steps"] == 2 * T
    # R*L - 1 = 7-step warm-up, then a learn every step.
    assert carry["learns"] == (T - 7) + T
    assert np.isfinite(carry["last_loss"])
    assert any(bool(jnp.any(a != b)) for a, b in zip(p0, carry["p"]))
    assert carry["ring"].shape == (2 * (4 + 1) * 16, n)


# ---------------------------------------------------------------------------
# Exact 2-device locks (VERDICT r3 item 5): the wrappers are deterministic
# given per-device streams, so a 2-device greedy chunk must equal the
# boundary pmean of two independently launched single-chip kernels fed each
# device's exact env/ring shard and sample streams -- bit-for-bit for the
# lane-sharded state, and to one f32 rounding of (a+b)/2 for the averaged
# learner tensors.  This locks the actual collective semantics that the
# "params move, loss finite" 8-device tests cannot.
# ---------------------------------------------------------------------------

def _mesh2():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 virtual devices")
    return Mesh(np.asarray(devs[:2]), ("data",))


def _assert_pmean(dist_t, solo_a, solo_b, name):
    for k, (d, a, b) in enumerate(zip(dist_t, solo_a, solo_b)):
        want = (np.asarray(a, np.float32) + np.asarray(b, np.float32)) / 2.0
        np.testing.assert_allclose(np.asarray(d), want, rtol=0, atol=1e-7,
                                   err_msg=f"{name}[{k}]")


def _assert_lane_concat(dist_arr, solo_a, solo_b, name):
    np.testing.assert_array_equal(
        np.asarray(dist_arr),
        np.concatenate([np.asarray(solo_a), np.asarray(solo_b)], axis=1),
        err_msg=name)


def test_dqn_two_device_equals_pmean_of_solo_kernels():
    if not _INPROC:
        _run_in_fresh_process("test_dqn_two_device_equals_pmean_of_solo_kernels")
        return
    from merging_gym_tpu.parallel.spmd import (spmd_fused_dqn_chunk,
                                               spmd_fused_dqn_init)

    mesh = _mesh2()
    n, T, seed = 2 * 128, 9, 11
    cfg = DQNConfig(lr=1e-3, target_sync=4, memory_capacity=2 * n,
                    opponent=FT.OPP_SELFPLAY)
    ep = EnvParams(max_steps=25)

    dist = _shrink(spmd_fused_dqn_init(jax.random.key(0), cfg, ep, n, mesh))
    dist = spmd_fused_dqn_chunk(mesh, cfg, ep, dist, T, seed, greedy=True)

    solos = []
    for idx in range(2):
        solo = _shrink(FT.fused_dqn_init(
            jax.random.key(0), cfg.replace(memory_capacity=n), ep, n // 2))
        kd = jax.random.fold_in(jax.random.key(seed ^ 0x5EED), idx)
        k_r, k_c = jax.random.split(kd)
        rounds = jax.random.randint(k_r, (T,), 0, solo["R"], jnp.int32)
        cols = jax.random.randint(k_c, (T,), 0, 1, jnp.int32)
        solos.append(FT.fused_dqn_chunk(cfg, ep, solo, T, seed=seed,
                                        greedy=True, rounds=rounds,
                                        cols=cols))
    a, b = solos
    for k in ("p", "tp", "m", "v"):
        _assert_pmean(dist[k], a[k], b[k], k)
    for k in ("env", "ring"):
        _assert_lane_concat(dist[k], a[k], b[k], k)
    assert dist["learns"] == a["learns"] == b["learns"]
    assert dist["episodes"] == a["episodes"] + b["episodes"]
    assert dist["collisions"] == a["collisions"] + b["collisions"]
    np.testing.assert_allclose(
        dist["last_loss"], (a["last_loss"] + b["last_loss"]) / 2.0,
        rtol=1e-6)


def test_drqn_two_device_equals_pmean_of_solo_kernels():
    if not _INPROC:
        _run_in_fresh_process("test_drqn_two_device_equals_pmean_of_solo_kernels")
        return
    from merging_gym_tpu.agents.drqn import DRQNConfig
    from merging_gym_tpu.ops import fused_drqn as FD
    from merging_gym_tpu.parallel.spmd import (spmd_fused_drqn_chunk,
                                               spmd_fused_drqn_init)

    mesh = _mesh2()
    n, T, seed = 2 * 128, 10, 21
    cfg = DRQNConfig(lr=1e-3, target_sync=3, seq_len=4, burn_in=1,
                     memory_capacity=2 * n, opponent=FT.OPP_SELFPLAY)
    ep = EnvParams(max_steps=20)

    dist = _shrink(spmd_fused_drqn_init(jax.random.key(0), cfg, ep, n, mesh))
    dist = spmd_fused_drqn_chunk(mesh, cfg, ep, dist, T, seed, greedy=True)

    solos = []
    for idx in range(2):
        solo = _shrink(FD.fused_drqn_init(
            jax.random.key(0), cfg.replace(memory_capacity=n), ep, n // 2))
        kd = jax.random.fold_in(jax.random.key(seed ^ 0xD7D7), idx)
        k_r, k_c = jax.random.split(kd)
        rounds = jax.random.randint(k_r, (T,), 0, solo["R"], jnp.int32)
        cols = jax.random.randint(k_c, (T,), 0, 1, jnp.int32)
        solos.append(FD.fused_drqn_chunk(cfg, ep, solo, T, seed=seed,
                                         greedy=True, rounds=rounds,
                                         cols=cols))
    a, b = solos
    for k in ("p", "tp", "m", "v"):
        _assert_pmean(dist[k], a[k], b[k], k)
    for k in ("env", "win", "ring"):
        _assert_lane_concat(dist[k], a[k], b[k], k)
    assert dist["learns"] == a["learns"] == b["learns"]
    assert dist["episodes"] == a["episodes"] + b["episodes"]


def test_hdqn_two_device_equals_pmean_of_solo_kernels():
    if not _INPROC:
        _run_in_fresh_process("test_hdqn_two_device_equals_pmean_of_solo_kernels")
        return
    from merging_gym_tpu.agents.hdqn import HDQNConfig
    from merging_gym_tpu.ops import fused_hdqn as FH
    from merging_gym_tpu.parallel.spmd import (spmd_fused_hdqn_chunk,
                                               spmd_fused_hdqn_init)

    mesh = _mesh2()
    n, T, seed = 2 * 128, 8, 13
    cfg = HDQNConfig(lr=1e-3, target_sync=3, memory_capacity=2 * n,
                     goal_memory_capacity=2 * n, opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=20)

    def shrink(c):
        for k in ("u_p", "u_tp", "l_p", "l_tp"):
            c[k] = tuple((arr - jnp.mean(arr)) * 0.05 for arr in c[k])
        c["opp_u"], c["opp_l"] = c["u_p"], c["l_p"]
        return c

    dist = shrink(spmd_fused_hdqn_init(jax.random.key(0), cfg, ep, n, mesh))
    dist = spmd_fused_hdqn_chunk(mesh, cfg, ep, dist, T, seed, greedy=True)

    solos = []
    for idx in range(2):
        solo = shrink(FH.fused_hdqn_init(
            jax.random.key(0),
            cfg.replace(memory_capacity=n, goal_memory_capacity=n), ep,
            n // 2))
        kd = jax.random.fold_in(jax.random.key(seed ^ 0x4D0), idx)
        k1, k2, _ = jax.random.split(kd, 3)
        lo_r = jax.random.randint(k1, (T,), 0, solo["R_lo"], jnp.int32)
        up_r = jax.random.randint(k2, (T,), 0, solo["R_up"], jnp.int32)
        solos.append(FH.fused_hdqn_chunk(cfg, ep, solo, T, seed=seed,
                                         greedy=True, lo_rounds=lo_r,
                                         up_rounds=up_r))
    a, b = solos
    for k in ("u_p", "u_tp", "u_m", "u_v", "l_p", "l_tp", "l_m", "l_v"):
        _assert_pmean(dist[k], a[k], b[k], k)
    for k in ("state", "lo_ring", "up_ring"):
        _assert_lane_concat(dist[k], a[k], b[k], k)
    assert dist["lo_learns"] == a["lo_learns"] == b["lo_learns"]


def test_rainbow_two_device_equals_pmean_of_solo_kernels():
    if not _INPROC:
        _run_in_fresh_process("test_rainbow_two_device_equals_pmean_of_solo_kernels")
        return
    from merging_gym_tpu.agents.rainbow import RainbowConfig
    from merging_gym_tpu.ops import fused_rainbow as FRB
    from merging_gym_tpu.parallel.spmd import (spmd_fused_rainbow_chunk,
                                               spmd_fused_rainbow_init)

    mesh = _mesh2()
    n, T, seed = 2 * 128, 8, 19
    cfg = RainbowConfig(lr=1e-3, target_sync_episodes=3,
                        memory_capacity=2 * n, obs_scale=0.01,
                        opponent=FT.OPP_SELFPLAY)
    ep = EnvParams(max_steps=15)

    dist = spmd_fused_rainbow_init(jax.random.key(0), cfg, ep, n, mesh)
    dist_eps = tuple(np.asarray(a) for a in dist["eps"])
    dist_teps = tuple(np.asarray(a) for a in dist["teps"])
    dist = spmd_fused_rainbow_chunk(mesh, cfg, ep, dist, T, seed,
                                    greedy=True)

    ks = jax.random.split(jax.random.key(seed ^ 0x51C), 2)
    solos = []
    for idx in range(2):
        solo = FRB.fused_rainbow_init(
            jax.random.key(0), cfg.replace(memory_capacity=n), ep, n // 2)
        # Device idx's noise shard (the spmd init concatenates per-device
        # draws lane-wise; the two packed arrays have different widths).
        widths = [np.asarray(a).shape[1] for a in solo["eps"]]
        solo["eps"] = tuple(jnp.asarray(a[:, idx * w:(idx + 1) * w])
                            for a, w in zip(dist_eps, widths))
        solo["teps"] = tuple(jnp.asarray(a[:, idx * w:(idx + 1) * w])
                             for a, w in zip(dist_teps, widths))
        rounds = np.asarray(FRB.draw_start_rounds(solo, T, ks[idx], 1))
        solos.append(FRB.fused_rainbow_chunk(cfg, ep, solo, T, seed=seed,
                                             greedy=True, rounds=rounds))
    a, b = solos
    for k in ("p", "tp", "m", "v"):
        _assert_pmean(dist[k], a[k], b[k], k)
    for k in ("env", "ring"):
        _assert_lane_concat(dist[k], a[k], b[k], k)
    for k in ("eps", "teps"):
        for j in range(2):
            _assert_lane_concat(dist[k][j], a[k][j], b[k][j], f"{k}[{j}]")
    assert dist["learns"] == a["learns"] == b["learns"]


@pytest.mark.skipif(os.environ.get("MGT_RUN_CRASH_CANARY") != "1",
                    reason="full-suite crash canary: ~10 min; set "
                           "MGT_RUN_CRASH_CANARY=1 to run")
def test_crash_canary_full_suite_inprocess():
    """Canary for the XLA:CPU backend_compile crash that forces the
    subprocess isolation above (VERDICT r4 item 8).

    Runs docs/xla_cpu_crash_repro.py -- the full suite in ONE process
    with the isolation disabled, the smallest known repro (all bisected
    subsets pass; see that script's minimization notes).  EXPECTED
    outcome while the bug exists: the child dies on SIGSEGV/SIGABRT and
    this test passes.  If the child EXITS 0, the compiler is fixed at
    this jax version and this test FAILS LOUDLY so the scaffolding
    (_run_in_fresh_process + the pyproject '-n 2' addopts) gets retired
    instead of silently ossifying."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "xla_cpu_crash_repro",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "docs", "xla_cpu_crash_repro.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.run()
    assert rc < 0, (
        "full-suite in-process run no longer crashes (exit "
        f"{rc}): the XLA:CPU compiler bug appears FIXED -- retire the "
        "subprocess scaffolding in tests/test_spmd_fused.py and the "
        "xdist addopts in pyproject.toml (see docs/xla_cpu_crash_repro.py)")
