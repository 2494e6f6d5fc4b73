"""END-TO-END interpret-mode lock for the fused DQN trainer kernel.

tests/test_fused_trainer.py locks the hand-derived learner math
(``learn_math``) against jax.grad + optax; this file locks the OTHER
471-LoC worth of kernel machinery -- actor, env step, ring replay
(including the store-gating stale-row semantics and the B < num_envs
dynamic lane-window slice), learn gating / target-sync timing, metric
accumulation, auto-reset, and the cross-launch warm continuation --
by running whole ``fused_dqn_chunk`` training chunks in Pallas
interpret mode on CPU against a step-for-step XLA reference built from
the independently verified components:

  * env:     core.vector.autoreset_step (locked to the f64 oracle by
             tests/test_env_parity.py),
  * actor:   nn.mlp.qnet_apply greedy argmax (a different matmul
             layout than the kernel's ``_fwd``),
  * replay:  a plain-numpy ring with the kernel's documented slab
             semantics,
  * learner: ``learn_math`` itself (already autodiff-locked), invoked
             with independently assembled batches and sync/step counts.

Greedy mode (P(greedy) = 1, the ``randn() <= eps`` quirk taken to its
deterministic limit) plus host-supplied rounds/cols streams make the
kernel bit-reproducible without the TPU PRNG, mirroring the pattern of
tests/test_fused_policy_rollout.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.agents.dqn import DQNConfig
from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core import env as core_env
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.core.vector import (autoreset_step, observe_after_reset,
                                         reset_batch)
from merging_gym_tpu.nn.mlp import qnet_apply
from merging_gym_tpu.ops import fused_trainer as FT


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(FT.pl, "pallas_call", patched)
    yield


def _shrink(p6):
    # Small centred weights: Q-gaps stay O(1) (far above f32 layout-order
    # jitter, so both argmax implementations agree) and the U(0,1)-init
    # loss transient (~1e9) is avoided, keeping f32 drift between the two
    # trajectories tiny over the run.
    return tuple((a - jnp.mean(a)) * 0.05 for a in p6)


def _race_start(n, seed):
    """Mid-race start positions so the short e2e run actually exercises
    wins (and thus the store-gating stale-row path), the winner-overwrite
    state machine, collisions and auto-resets -- from START_POINT nothing
    can reach the merge within a CPU-sized step budget."""
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(870.0, 948.0, n),
                    rng.uniform(870.0, 948.0, n)]).astype(np.float32)
    vel = np.stack([rng.uniform(5.0, 40.0, n),
                    rng.uniform(5.0, 40.0, n)]).astype(np.float32)
    return pos, vel


def _mk(cfg, ep, n, learn_batch, seed, race=None, learn_rounds=1,
        ring_hbm=False):
    from merging_gym_tpu.core.geometry import lon2coord

    carry = FT.fused_dqn_init(jax.random.key(seed), cfg, ep, n,
                              learn_batch=learn_batch,
                              learn_rounds=learn_rounds,
                              ring_hbm=ring_hbm)
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
    return carry


def _xla_reference(cfg, ep, carry0, rounds, cols, race=None):
    """The kernel's exact training semantics from independent components."""
    n, R, B = carry0["n"], carry0["R"], carry0["B"]
    K = carry0.get("K", 1)
    W = B // K
    p, tp = carry0["p"], carry0["tp"]
    m, v = carry0["m"], carry0["v"]
    ring = np.zeros((R * FT.NUM_F, n), np.float32)
    env_state = reset_batch(ep, jax.random.key(0), n, jnp.float32)
    if race is not None:
        pos, vel = race
        env_state = env_state.replace(pos=jnp.asarray(pos.T),
                                      vel=jnp.asarray(vel.T))
    obs = jax.vmap(core_env.observe)(env_state)          # [n, 10] f32
    ep_rew = np.zeros(n, np.float32)
    met = np.zeros(4, np.float64)
    learns = 0
    last_loss = 0.0

    act = jax.jit(lambda pd, o: jnp.argmax(qnet_apply(pd, o), axis=-1)
                  .astype(jnp.int32))
    stepper = jax.jit(lambda s, a: autoreset_step(ep, s, a, jax.random.key(1)))
    learner = jax.jit(lambda p, tp, m, v, b, t: FT.learn_math(
        p, tp, m, v, b, t, gamma=cfg.gamma, lr=cfg.lr,
        num_actions=cfg.num_actions, mask_terminal=cfg.mask_terminal))

    T = len(rounds) // K
    for i in range(T):
        pd = FT.t_to_params(p)
        a1 = act(pd, obs)
        if cfg.opponent == FT.OPP_L0:
            a2 = jnp.full((n,), C.ACTION_NONE, jnp.int32)
        else:
            a2 = act(pd, core_env.swap_obs(obs))
        env_state, ts = stepper(env_state, jnp.stack([a1, a2], axis=-1))

        # Ring write: store-gated lanes keep their previous row.
        store = np.asarray(ts.winner != 1)
        slab = np.concatenate([
            np.asarray(obs).T.astype(np.float32),
            np.asarray(ts.obs).T.astype(np.float32),
            np.asarray(a1, np.float32)[None],
            np.asarray(ts.rewards[:, 0], np.float32)[None],
            np.asarray(ts.done, np.float32)[None],
            np.zeros((1, n), np.float32),
        ])                                                # [NUM_F, n]
        base = (i % R) * FT.NUM_F
        old = ring[base:base + FT.NUM_F]
        ring[base:base + FT.NUM_F] = np.where(store[None], slab, old)

        # Learner (gated on ring full; kernel reads the ring AFTER this
        # step's write, so the current slab is sampleable).
        if i >= R - 1:
            lc = learns
            sampled = np.concatenate(
                [ring[rounds[i * K + k] * FT.NUM_F:
                      (rounds[i * K + k] + 1) * FT.NUM_F,
                      cols[i * K + k] * W:(cols[i * K + k] + 1) * W]
                 for k in range(K)], axis=1)
            batch = {
                "obs": jnp.asarray(sampled[0:10]),
                "next_obs": jnp.asarray(sampled[10:20]),
                "action": jnp.asarray(sampled[20], jnp.int32),
                "reward": jnp.asarray(sampled[21]),
                "done": jnp.asarray(sampled[22] > 0.5),
            }
            if lc % cfg.target_sync == 0:
                tp = p                                     # pre-update sync
            p, m, v, loss = learner(p, tp, m, v, batch,
                                    jnp.int32(lc + 1))
            learns += 1
            last_loss = float(loss)

        # Metrics (agents.dqn.train_step semantics).
        done = np.asarray(ts.done)
        ep_rew = ep_rew + np.where(store, np.asarray(ts.rewards[:, 0]), 0.0)
        won = done & (np.asarray(obs)[:, 8] > np.asarray(obs)[:, 3])
        met += [done.sum(), np.asarray(ts.collision).sum(), won.sum(),
                ep_rew[done].sum()]
        ep_rew = np.where(done, 0.0, ep_rew).astype(np.float32)

        obs = observe_after_reset(ep, env_state, ts)

    return {"p": p, "tp": tp, "m": m, "v": v, "ring": ring,
            "env_state": env_state, "ep_rew": ep_rew, "met": met,
            "learns": learns, "last_loss": last_loss}


def _run_kernel_chunks(cfg, ep, carry, rounds, cols, splits):
    K = carry.get("K", 1)
    T = len(rounds) // K
    lo = 0
    for hi in splits + [T]:
        carry = FT.fused_dqn_chunk(cfg, ep, carry, hi - lo, seed=0,
                                   greedy=True,
                                   rounds=rounds[lo * K:hi * K],
                                   cols=cols[lo * K:hi * K])
        lo = hi
    return carry


def _check(cfg, ep, carry, want, n):
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

    np.testing.assert_allclose(np.asarray(carry["ring"]), want["ring"],
                               rtol=1e-4, atol=1e-4, err_msg="ring")
    for name, idx in (("p", "p"), ("tp", "tp"), ("m", "m"), ("v", "v")):
        for k, (g, w) in enumerate(zip(carry[idx], want[idx])):
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
                               rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("ring_hbm", [False, True])
def test_e2e_selfplay_full_slab(ring_hbm):
    """B == n, selfplay opponent, 2 chunks (cold + warm continuation).
    ring_hbm=True runs the SAME lock with the HBM-resident DMA ring
    (VERDICT r4 item 1) -- the semantics must be identical."""
    n, T = 128, 40
    cfg = DQNConfig(lr=1e-3, gamma=0.9, target_sync=7,
                    memory_capacity=3 * n, opponent=FT.OPP_SELFPLAY)
    ep = EnvParams(max_steps=25)
    rng = np.random.default_rng(42)
    rounds = rng.integers(0, 3, T).astype(np.int32)
    cols = np.zeros(T, np.int32)

    race = _race_start(n, seed=100)
    carry = _mk(cfg, ep, n, None, seed=0, race=race, ring_hbm=ring_hbm)
    want = _xla_reference(cfg, ep, carry, rounds, cols, race=race)
    # splits=[1, 10]: the FIRST chunk (1 step) is shorter than the R-1=2
    # step ring warm-up, locking the global-step learn gate across
    # launches (a premature warm flag would make chunk 2 learn from
    # all-zero ring rounds).
    got = _run_kernel_chunks(cfg, ep, carry, rounds, cols, splits=[1, 10])
    # The mid-race start makes the run cross every interesting boundary:
    assert want["met"][0] > 0, "episodes must end"
    assert want["met"][1] > 0, "collisions must occur"
    assert want["met"][2] > 0, "ego wins must occur (store-gating path)"
    _check(cfg, ep, got, want, n)


def test_e2e_l0_lane_window_batch():
    """B < n: the dynamic lane-window slice path (ADVICE r1, medium)."""
    n, B, T = 256, 128, 36
    cfg = DQNConfig(lr=1e-3, gamma=0.9, target_sync=5,
                    memory_capacity=2 * n, opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=30)
    rng = np.random.default_rng(7)
    rounds = rng.integers(0, 2, T).astype(np.int32)
    cols = rng.integers(0, n // B, T).astype(np.int32)
    assert cols.min() == 0 and cols.max() == 1, "both windows exercised"

    race = _race_start(n, seed=200)
    carry = _mk(cfg, ep, n, B, seed=3, race=race)
    want = _xla_reference(cfg, ep, carry, rounds, cols, race=race)
    got = _run_kernel_chunks(cfg, ep, carry, rounds, cols, splits=[])
    assert want["met"][2] > 0, "ego wins must occur (store-gating path)"
    _check(cfg, ep, got, want, n)


@pytest.mark.parametrize("ring_hbm", [False, True])
def test_e2e_age_mixed_batch(ring_hbm):
    """learn_rounds=K > 1: each learn concatenates K independent
    (round, lane-window) draws -- the de-correlated batch composition
    (VERDICT r1 item 6) -- locked against the same XLA reference.
    ring_hbm=True additionally exercises the K-window DMA prefetch and
    the merged-slab bypass when a drawn round equals the write round."""
    n, B, K, T = 256, 256, 2, 30
    cfg = DQNConfig(lr=1e-3, gamma=0.9, target_sync=6,
                    memory_capacity=3 * n, opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=30)
    rng = np.random.default_rng(21)
    rounds = rng.integers(0, 3, T * K).astype(np.int32)
    cols = rng.integers(0, n // (B // K), T * K).astype(np.int32)

    race = _race_start(n, seed=300)
    carry = _mk(cfg, ep, n, B, seed=9, race=race, learn_rounds=K,
                ring_hbm=ring_hbm)
    want = _xla_reference(cfg, ep, carry, rounds, cols, race=race)
    got = _run_kernel_chunks(cfg, ep, carry, rounds, cols, splits=[12])
    _check(cfg, ep, got, want, n)


def test_e2e_lane_window_matches_full_slab_when_pinned():
    """With cols pinned to window 0 and one ring round per draw, learning
    on a B-lane window of an n-lane slab must equal learning on a B-env
    trainer whose slab IS that window -- a pure consistency property of
    the slice path."""
    B, T = 128, 24
    cfg = DQNConfig(lr=1e-3, gamma=0.9, target_sync=4,
                    memory_capacity=2 * 256, opponent=FT.OPP_L0)
    cfg_small = cfg.replace(memory_capacity=2 * B)
    ep = EnvParams(max_steps=30)
    rng = np.random.default_rng(11)
    rounds = rng.integers(0, 2, T).astype(np.int32)
    cols = np.zeros(T, np.int32)

    big = _mk(cfg, ep, 256, B, seed=5)
    small = FT.fused_dqn_init(jax.random.key(5), cfg_small, ep, B)
    # Same net, envs of the small trainer = lanes [0:B] of the big one.
    small["p"], small["tp"] = big["p"], big["tp"]
    small["opp"] = small["p"]

    big = FT.fused_dqn_chunk(cfg, ep, big, T, seed=0, greedy=True,
                             rounds=rounds, cols=cols)
    small = FT.fused_dqn_chunk(cfg_small, ep, small, T, seed=0, greedy=True,
                               rounds=rounds, cols=np.zeros(T, np.int32))
    # Identical params: both learned on identical batches (window 0 of the
    # big ring is exactly the small trainer's slab -- envs are iid copies
    # with deterministic starts and a shared greedy policy).
    for g, w in zip(big["p"], small["p"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6)
    # Lanes [0:B] of the big ring ARE the small trainer's ring (identical
    # deterministic envs under the shared greedy policy).
    np.testing.assert_allclose(np.asarray(big["ring"])[:, :B],
                               np.asarray(small["ring"]),
                               rtol=1e-6, atol=1e-6)


def test_e2e_width_generic():
    """Non-default hidden widths (incl. non-lane-aligned 144/72): the
    kernel's learner math is shaped by the param arrays, so production
    widths run in the same kernel -- locked against the XLA reference."""
    n, T = 128, 12
    cfg = DQNConfig(lr=1e-3, gamma=0.9, target_sync=4, hidden=(144, 72),
                    memory_capacity=2 * n, opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=25)
    rng = np.random.default_rng(33)
    rounds = rng.integers(0, 2, T).astype(np.int32)
    cols = np.zeros(T, np.int32)

    race = _race_start(n, seed=400)
    carry = _mk(cfg, ep, n, None, seed=13, race=race)
    want = _xla_reference(cfg, ep, carry, rounds, cols, race=race)
    got = _run_kernel_chunks(cfg, ep, carry, rounds, cols, splits=[])
    _check(cfg, ep, got, want, n)


@pytest.mark.parametrize("ring_hbm", [False, True])
def test_e2e_bf16_matches_f32_under_decisive_actions(ring_hbm):
    """END-TO-END f32-vs-bf16 agreement (VERDICT r4 item 2): run the SAME
    fused training chunk in both compute dtypes.  The last-layer biases
    are spread 500 apart, so every argmax (actor, Double-DQN's best_a)
    stays decisive in either precision for the whole run.  (The learner
    drags the chosen action's Q down by ~(1 + sum|h2|) * lr per learn
    regardless of the spread -- Adam normalises the step -- which at
    lr=1e-3 is ~11/step and closed a 300 gap by step 27; lr=1e-4 keeps
    the total decay ~40, far inside the 500 margin.) -- both runs then take IDENTICAL actions
    and the env trajectory, replay ring and metrics must match exactly,
    isolating the precision difference to the learner: params stay within
    the accumulated per-update bf16 drift bound and masters stay f32.
    """
    n, T = 128, 40
    lr = 1e-4
    cfg32 = DQNConfig(lr=lr, gamma=0.9, target_sync=7,
                      memory_capacity=3 * n, opponent=FT.OPP_SELFPLAY)
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    ep = EnvParams(max_steps=25)
    rng = np.random.default_rng(5)
    rounds = rng.integers(0, 3, T).astype(np.int32)
    cols = np.zeros(T, np.int32)
    race = _race_start(n, seed=200)

    def mk():
        carry = _mk(cfg32, ep, n, None, seed=0, race=race, ring_hbm=ring_hbm)
        spread = jnp.arange(cfg32.num_actions, dtype=jnp.float32)[:, None] * 500.0
        carry["p"] = carry["p"][:5] + (carry["p"][5] + spread,)
        carry["tp"] = carry["tp"][:5] + (carry["tp"][5] + spread,)
        carry["opp"] = carry["p"]
        return carry

    got32 = _run_kernel_chunks(cfg32, ep, mk(), rounds, cols, splits=[10])
    got16 = _run_kernel_chunks(cfg16, ep, mk(), rounds, cols, splits=[10])

    np.testing.assert_array_equal(np.asarray(got16["env"]),
                                  np.asarray(got32["env"]))
    np.testing.assert_array_equal(np.asarray(got16["ring"]),
                                  np.asarray(got32["ring"]))
    for k in ("episodes", "collisions", "wins", "learns"):
        assert got16[k] == got32[k], k
    assert got16["learns"] > 0
    assert np.isfinite(got16["last_loss"])
    bound = 2.0 * lr * got32["learns"]  # Adam per-update |delta| <= ~lr
    for a16, a32 in zip(got16["p"] + got16["m"] + got16["v"],
                        got32["p"] + got32["m"] + got32["v"]):
        assert a16.dtype == jnp.float32
    for a16, a32 in zip(got16["p"], got32["p"]):
        d = np.abs(np.asarray(a16) - np.asarray(a32)).max()
        assert d <= bound, f"param drift {d:.2e} > {bound:.2e}"
