"""END-TO-END interpret-mode lock for the fused DRQN trainer kernel.

tests/test_fused_drqn.py locks the hand-derived BPTT learner math
against jax.grad + optax; this file locks the rest of the kernel --
recurrent actor (per-env LSTM state for both seats, zeroed on reset),
env step, the synchronized window-slot accumulation and ring flush,
learn gating / target-sync timing, metric accumulation, auto-reset,
and cross-launch warm continuation -- by running whole
``fused_drqn_chunk`` chunks in Pallas interpret mode on CPU against a
step-for-step XLA reference built from independently verified
components:

  * env:      core.vector.autoreset_step (locked to the f64 oracle),
  * actor:    nn.lstm.drqn_step greedy argmax (env-first layout vs the
              kernel's env-last _cell_fwd),
  * windows:  a plain-numpy slot buffer + ring with the kernel's
              documented slab semantics,
  * learner:  ops.fused_drqn.drqn_learn_math itself (autodiff-locked),
              invoked with independently assembled window batches.

Greedy mode + host-supplied rounds/cols streams make the kernel
deterministic without the TPU PRNG (the test_fused_trainer_e2e.py
pattern).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.agents.drqn import DRQNConfig
from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core import env as core_env
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.core.geometry import lon2coord
from merging_gym_tpu.core.vector import (autoreset_step, observe_after_reset,
                                         reset_batch)
from merging_gym_tpu.nn.lstm import drqn_step, lstm_zero_carry
from merging_gym_tpu.ops import fused_drqn as FD


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(FD.pl, "pallas_call", patched)
    yield


def _shrink(p12):
    # Centred small weights: keeps Q-gaps O(1) so both argmax layouts
    # agree, and avoids the U(0,1)-init loss transient (cf.
    # test_fused_trainer_e2e._shrink).
    return tuple((a - jnp.mean(a)) * 0.05 for a in p12)


def _race_start(n, seed):
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(870.0, 948.0, n),
                    rng.uniform(870.0, 948.0, n)]).astype(np.float32)
    vel = np.stack([rng.uniform(5.0, 40.0, n),
                    rng.uniform(5.0, 40.0, n)]).astype(np.float32)
    return pos, vel


def _obs_rows(env8):
    """10 obs rows from the first 8 env rows (the kernel's formula)."""
    return np.stack([
        env8[6] - env8[4], env8[7] - env8[5], env8[3] - env8[2],
        C.END_POINT - env8[0], env8[2],
        env8[4] - env8[6], env8[5] - env8[7], env8[2] - env8[3],
        C.END_POINT - env8[1], env8[3],
    ])


def _mk(cfg, ep, n, learn_batch, seed, race=None, ring_hbm=False):
    carry = FD.fused_drqn_init(jax.random.key(seed), cfg, ep, n,
                               learn_batch=learn_batch, ring_hbm=ring_hbm)
    carry["p"] = _shrink(carry["p"])
    carry["tp"] = _shrink(carry["tp"])
    carry["opp"] = carry["p"]
    if race is not None:
        pos, vel = race
        env = np.asarray(carry["env"]).copy()
        env[0:2], env[2:4] = pos, vel
        x1, y1 = lon2coord(jnp.asarray(pos[0]), +1.0)
        x2, y2 = lon2coord(jnp.asarray(pos[1]), -1.0)
        env[4:8] = np.stack([np.asarray(x1), np.asarray(y1),
                             np.asarray(x2), np.asarray(y2)])
        carry["env"] = jnp.asarray(env)
        win = np.asarray(carry["win"]).copy()
        win[0:C.OBS_DIM] = _obs_rows(env[0:8])
        carry["win"] = jnp.asarray(win)
    return carry


def _xla_reference(cfg, ep, carry0, rounds, cols, race=None):
    """The kernel's exact training semantics from independent components."""
    n, R, B, L = carry0["n"], carry0["R"], carry0["B"], carry0["L"]
    WF = (L + 1) * FD.SLOT
    p, tp = carry0["p"], carry0["tp"]
    m, v = carry0["m"], carry0["v"]
    pd = FD.t_to_drqn_params(p)
    opp_pd = FD.t_to_drqn_params(carry0["opp"])
    win = np.asarray(carry0["win"]).copy()
    ring = np.zeros((R * WF, n), np.float32)
    env_state = reset_batch(ep, jax.random.key(0), n, jnp.float32)
    if race is not None:
        pos, vel = race
        env_state = env_state.replace(pos=jnp.asarray(pos.T),
                                      vel=jnp.asarray(vel.T))
    obs = jax.vmap(core_env.observe)(env_state)          # [n, 10] f32
    h, c = lstm_zero_carry((n,))
    h2, c2 = lstm_zero_carry((n,))
    ep_rew = np.zeros(n, np.float32)
    met = np.zeros(4, np.float64)
    learns = 0
    last_loss = 0.0

    act = jax.jit(lambda pdict, o, hc: drqn_step(pdict, o, hc))
    stepper = jax.jit(lambda s, a: autoreset_step(ep, s, a, jax.random.key(1)))
    learner = jax.jit(lambda p, tp, m, v, b, t: FD.drqn_learn_math(
        p, tp, m, v, b, t, gamma=cfg.gamma, lr=cfg.lr,
        num_actions=cfg.num_actions, seq_len=L, burn_in=cfg.burn_in))

    T = len(rounds)
    for i in range(T):
        q1, (h, c) = act(pd, obs, (h, c))
        a1 = jnp.argmax(q1, axis=-1).astype(jnp.int32)
        if cfg.opponent == FD.OPP_L0:
            a2 = jnp.full((n,), C.ACTION_NONE, jnp.int32)
        else:
            use = pd if cfg.opponent == FD.OPP_SELFPLAY else opp_pd
            q2, (h2, c2) = act(use, core_env.swap_obs(obs), (h2, c2))
            a2 = jnp.argmax(q2, axis=-1).astype(jnp.int32)
        env_state, ts = stepper(env_state, jnp.stack([a1, a2], axis=-1))

        # Window slot write (slot wl+1 <- pre-reset obs + transition).
        wl = i % L
        s0 = (wl + 1) * FD.SLOT
        win[s0:s0 + 10] = np.asarray(ts.obs).T.astype(np.float32)
        win[s0 + 10] = np.asarray(a1, np.float32)
        win[s0 + 11] = np.asarray(ts.rewards[:, 0], np.float32)
        win[s0 + 12] = np.asarray(ts.done, np.float32)

        done = np.asarray(ts.done)
        next_obs = observe_after_reset(ep, env_state, ts)

        # Recurrent state zeroed on reset, both seats.
        dcol = jnp.asarray(done)[:, None]
        h = jnp.where(dcol, 0.0, h)
        c = jnp.where(dcol, 0.0, c)
        h2 = jnp.where(dcol, 0.0, h2)
        c2 = jnp.where(dcol, 0.0, c2)

        # Synchronized flush every L steps.
        if wl == L - 1:
            r_cur = (i // L) % R
            ring[r_cur * WF:(r_cur + 1) * WF] = win
            win[0:10] = np.asarray(next_obs).T.astype(np.float32)

        # Learner (gated on ring full).
        if i >= R * L - 1:
            lc = learns
            sampled = ring[rounds[i] * WF:(rounds[i] + 1) * WF,
                           cols[i] * B:(cols[i] + 1) * B]
            batch = FD.slab_to_batch(jnp.asarray(sampled), L)
            if lc % cfg.target_sync == 0:
                tp = p                                     # pre-update sync
            p, m, v, loss = learner(p, tp, m, v, batch, jnp.int32(lc + 1))
            pd = FD.t_to_drqn_params(p)
            learns += 1
            last_loss = float(loss)

        # Metrics (agents.drqn.drqn_train_step semantics).
        ep_rew = ep_rew + np.asarray(ts.rewards[:, 0])
        won = done & (np.asarray(obs)[:, 8] > np.asarray(obs)[:, 3])
        met += [done.sum(), np.asarray(ts.collision).sum(), won.sum(),
                ep_rew[done].sum()]
        ep_rew = np.where(done, 0.0, ep_rew).astype(np.float32)

        obs = next_obs

    return {"p": p, "tp": tp, "m": m, "v": v, "win": win, "ring": ring,
            "env_state": env_state, "h": h, "c": c, "h2": h2, "c2": c2,
            "ep_rew": ep_rew, "met": met, "learns": learns,
            "last_loss": last_loss}


def _run_kernel_chunks(cfg, ep, carry, rounds, cols, splits):
    T = len(rounds)
    lo = 0
    for hi in splits + [T]:
        carry = FD.fused_drqn_chunk(cfg, ep, carry, hi - lo, seed=0,
                                    greedy=True, rounds=rounds[lo:hi],
                                    cols=cols[lo:hi])
        lo = hi
    return carry


def _check(cfg, carry, want, n):
    got_env = np.asarray(carry["env"])
    st = want["env_state"]
    np.testing.assert_allclose(got_env[0:2], np.asarray(st.pos).T,
                               rtol=0, atol=1e-4, err_msg="pos")
    np.testing.assert_allclose(got_env[2:4], np.asarray(st.vel).T,
                               rtol=0, atol=1e-4, err_msg="vel")
    np.testing.assert_array_equal(got_env[8].astype(np.int32),
                                  np.asarray(st.winner), err_msg="winner")
    np.testing.assert_array_equal(got_env[9].astype(np.int32),
                                  np.asarray(st.t), err_msg="t")
    np.testing.assert_allclose(got_env[10], want["ep_rew"],
                               rtol=0, atol=1e-4, err_msg="ep_reward")
    H = FD.HID
    for name, off, w in (("h", 11, want["h"]), ("c", 11 + H, want["c"]),
                         ("h2", 11 + 2 * H, want["h2"]),
                         ("c2", 11 + 3 * H, want["c2"])):
        np.testing.assert_allclose(got_env[off:off + H], np.asarray(w).T,
                                   rtol=1e-4, atol=1e-5, err_msg=name)

    np.testing.assert_allclose(np.asarray(carry["win"]), want["win"],
                               rtol=1e-4, atol=1e-4, err_msg="win")
    np.testing.assert_allclose(np.asarray(carry["ring"]), want["ring"],
                               rtol=1e-4, atol=1e-4, err_msg="ring")
    for name in ("p", "tp", "m", "v"):
        for k, (g, w) in enumerate(zip(carry[name], want[name])):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4,
                err_msg=f"{name}[{k}]")

    assert carry["learns"] == want["learns"]
    assert carry["episodes"] == want["met"][0]
    assert carry["collisions"] == want["met"][1]
    assert carry["wins"] == want["met"][2]
    np.testing.assert_allclose(carry["sum_ep_reward"], want["met"][3],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(carry["last_loss"], want["last_loss"],
                               rtol=2e-3, atol=1e-6)


@pytest.mark.parametrize("ring_hbm", [False, True])
def test_e2e_selfplay_full_slab(ring_hbm):
    """B == n, selfplay opponent, 3 chunks (cold + warm continuation,
    with a chunk boundary mid-window).  ring_hbm=True runs the SAME
    lock with the HBM-resident DMA ring (flush staging, sample window
    prefetch, staged-slab patch on a same-step flush hit)."""
    n, L, T = 128, 4, 26
    cfg = DRQNConfig(lr=1e-3, gamma=0.9, target_sync=5, seq_len=L,
                     burn_in=1, memory_capacity=2 * n,
                     opponent=FD.OPP_SELFPLAY)
    ep = EnvParams(max_steps=20)
    rng = np.random.default_rng(42)
    rounds = rng.integers(0, 2, T).astype(np.int32)
    cols = np.zeros(T, np.int32)

    race = _race_start(n, seed=100)
    carry = _mk(cfg, ep, n, None, seed=0, race=race, ring_hbm=ring_hbm)
    want = _xla_reference(cfg, ep, carry, rounds, cols, race=race)
    # splits=[3, 13]: the first chunk ends mid-window (3 < L) and before
    # the R*L-1 = 7 step ring warm-up, locking the cross-launch window
    # phase and the global-step learn gate.
    got = _run_kernel_chunks(cfg, ep, carry, rounds, cols, splits=[3, 13])
    assert want["met"][0] > 0, "episodes must end"
    assert want["met"][2] > 0, "ego wins must occur"
    assert want["learns"] > 0
    _check(cfg, got, want, n)


@pytest.mark.parametrize("ring_hbm", [False, True])
def test_e2e_l0_lane_window_batch(ring_hbm):
    """B < n: the dynamic lane-window slice path, L0 opponent."""
    n, B, L, T = 256, 128, 4, 20
    cfg = DRQNConfig(lr=1e-3, gamma=0.9, target_sync=3, seq_len=L,
                     burn_in=0, memory_capacity=2 * n, opponent=FD.OPP_L0)
    ep = EnvParams(max_steps=16)
    rng = np.random.default_rng(7)
    rounds = rng.integers(0, 2, T).astype(np.int32)
    cols = rng.integers(0, n // B, T).astype(np.int32)
    assert cols.min() == 0 and cols.max() == 1, "both windows exercised"

    race = _race_start(n, seed=200)
    carry = _mk(cfg, ep, n, B, seed=3, race=race, ring_hbm=ring_hbm)
    want = _xla_reference(cfg, ep, carry, rounds, cols, race=race)
    got = _run_kernel_chunks(cfg, ep, carry, rounds, cols, splits=[])
    assert want["learns"] > 0
    _check(cfg, got, want, n)


def test_e2e_frozen_opponent():
    """Frozen recurrent opponent: a second set of params drives seat 2
    with its OWN hidden state."""
    n, L, T = 128, 4, 18
    cfg = DRQNConfig(lr=1e-3, gamma=0.9, target_sync=4, seq_len=L,
                     burn_in=1, memory_capacity=2 * n,
                     opponent=FD.OPP_FROZEN)
    ep = EnvParams(max_steps=16)
    rng = np.random.default_rng(11)
    rounds = rng.integers(0, 2, T).astype(np.int32)
    cols = np.zeros(T, np.int32)

    race = _race_start(n, seed=300)
    from merging_gym_tpu.nn.lstm import drqn_init
    opp = drqn_init(jax.random.key(99), 10, 5)
    carry = FD.fused_drqn_init(jax.random.key(5), cfg, ep, n,
                               opp_params=opp)
    carry["p"] = _shrink(carry["p"])
    carry["tp"] = _shrink(carry["tp"])
    carry["opp"] = _shrink(carry["opp"])
    pos, vel = race
    env = np.asarray(carry["env"]).copy()
    env[0:2], env[2:4] = pos, vel
    x1, y1 = lon2coord(jnp.asarray(pos[0]), +1.0)
    x2, y2 = lon2coord(jnp.asarray(pos[1]), -1.0)
    env[4:8] = np.stack([np.asarray(x1), np.asarray(y1),
                         np.asarray(x2), np.asarray(y2)])
    carry["env"] = jnp.asarray(env)
    win = np.asarray(carry["win"]).copy()
    win[0:C.OBS_DIM] = _obs_rows(env[0:8])
    carry["win"] = jnp.asarray(win)

    want = _xla_reference(cfg, ep, carry, rounds, cols, race=race)
    got = _run_kernel_chunks(cfg, ep, carry, rounds, cols, splits=[9])
    _check(cfg, got, want, n)
