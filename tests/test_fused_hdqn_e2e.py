"""END-TO-END interpret-mode lock for the fused hierarchical DQN kernel.

Same pattern as tests/test_fused_trainer_e2e.py: greedy mode +
host-supplied sample streams make the kernel deterministic; whole
``fused_hdqn_chunk`` launches run under the Pallas interpreter on CPU
against a step-for-step XLA reference built from independently verified
components (core.vector env, nn.mlp actors, agents.hdqn.goal_status,
numpy slab rings, the autodiff-locked ``learn_math`` for both
learners).  Covers: option boundaries with the every-step goal
re-selection quirk, intrinsic rewards, both rings (unconditional lower
stores; option-end-gated stale-row upper stores), the data-dependent
upper learn counter, per-learner target-sync timing, warm continuation
across launches including a first chunk shorter than the ring warm-up.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.agents.hdqn import HDQNConfig, goal_status
from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core import env as core_env
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.core.vector import (autoreset_step, observe_after_reset,
                                         reset_batch)
from merging_gym_tpu.nn.mlp import qnet_apply
from merging_gym_tpu.ops import fused_hdqn as FH
from merging_gym_tpu.ops import fused_trainer as FT


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(FH.pl, "pallas_call", patched)
    yield


def _shrink6(t):
    return tuple((a - jnp.mean(a)) * 0.05 for a in t)


def _race(n, seed):
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(870.0, 948.0, n),
                    rng.uniform(870.0, 948.0, n)]).astype(np.float32)
    vel = np.stack([rng.uniform(5.0, 40.0, n),
                    rng.uniform(5.0, 40.0, n)]).astype(np.float32)
    return pos, vel


def _mk(cfg, ep, n, seed, race, learn_batch=None):
    from merging_gym_tpu.core.geometry import lon2coord

    carry = FH.fused_hdqn_init(jax.random.key(seed), cfg, ep, n,
                               learn_batch=learn_batch)
    for k in ("u_p", "u_tp", "l_p", "l_tp"):
        carry[k] = _shrink6(carry[k])
    carry["opp_u"], carry["opp_l"] = carry["u_p"], carry["l_p"]
    pos, vel = race
    st = np.asarray(carry["state"]).copy()
    st[0:2], st[2:4] = pos, vel
    x1, y1 = lon2coord(jnp.asarray(pos[0]), +1.0)
    x2, y2 = lon2coord(jnp.asarray(pos[1]), -1.0)
    st[4:8] = np.stack([np.asarray(x1), np.asarray(y1),
                        np.asarray(x2), np.asarray(y2)])
    carry["state"] = jnp.asarray(st)
    return carry


def _reference(cfg, ep, carry0, lo_rounds, up_rounds, race, cols=None):
    n, R_lo, R_up = carry0["n"], carry0["R_lo"], carry0["R_up"]
    B = carry0.get("B", n)
    u = [carry0[k] for k in ("u_p", "u_tp", "u_m", "u_v")]
    l = [carry0[k] for k in ("l_p", "l_tp", "l_m", "l_v")]
    lo_ring = np.zeros((R_lo * FH.LO_F, n), np.float32)
    up_ring = np.zeros((R_up * FH.UP_F, n), np.float32)
    env_state = reset_batch(ep, jax.random.key(0), n, jnp.float32)
    pos, vel = race
    env_state = env_state.replace(pos=jnp.asarray(pos.T),
                                  vel=jnp.asarray(vel.T))
    obs = jax.vmap(core_env.observe)(env_state)
    goal = np.zeros(n, np.int32)
    extr = np.zeros(n, np.float32)
    opt_start = np.ones(n, bool)
    ep_rew = np.zeros(n, np.float32)
    met = np.zeros(4, np.float64)
    lc_lo = lc_up = 0
    last_loss = 0.0

    act = jax.jit(lambda pd, o, A: jnp.argmax(qnet_apply(pd, o)[..., :A],
                                              axis=-1).astype(jnp.int32),
                  static_argnums=2)
    stepper = jax.jit(lambda s, a: autoreset_step(ep, s, a, jax.random.key(1)))

    def learn(state4, batch, t, num_a):
        p, tp, m, v = state4
        p, m, v, loss = FT.learn_math(
            p, tp, m, v, batch, jnp.int32(t), gamma=cfg.gamma, lr=cfg.lr,
            num_actions=num_a, mask_terminal=cfg.mask_terminal)
        return [p, tp, m, v], float(loss)

    def with_goal(g, o):
        return np.concatenate([np.asarray(g, np.float32)[None],
                               np.asarray(o).T.astype(np.float32)])

    T = len(lo_rounds)
    for i in range(T):
        u_pd = FT.t_to_params(u[0])
        l_pd = FT.t_to_params(l[0])
        goal_fresh = np.asarray(act(u_pd, obs, cfg.num_goals))
        goal = np.where(opt_start, goal_fresh, goal)
        extr = np.where(opt_start, 0.0, extr).astype(np.float32)

        gobs = jnp.concatenate([jnp.asarray(goal, obs.dtype)[:, None], obs],
                               axis=-1)
        a1 = act(l_pd, gobs, cfg.num_actions)
        a2 = jnp.full((n,), C.ACTION_NONE, jnp.int32)  # OPP_L0
        env_state, ts = stepper(env_state, jnp.stack([a1, a2], axis=-1))

        goal_new = np.asarray(act(u_pd, ts.obs, cfg.num_goals))
        intrinsic = (goal_new == np.asarray(goal_status(obs))).astype(
            np.float32)

        lo_slab = np.concatenate([
            with_goal(goal, obs), with_goal(goal_new, ts.obs),
            np.asarray(a1, np.float32)[None], intrinsic[None],
            np.asarray(ts.done, np.float32)[None],
            np.zeros((FH.LO_F - 25, n), np.float32)])
        lo_ring[(i % R_lo) * FH.LO_F:(i % R_lo + 1) * FH.LO_F] = lo_slab

        if i >= R_lo - 1:
            s = lo_ring[lo_rounds[i] * FH.LO_F:(lo_rounds[i] + 1) * FH.LO_F]
            if cols is not None:
                s = s[:, cols[2 * i] * B:(cols[2 * i] + 1) * B]
            batch = {"obs": jnp.asarray(s[0:11]),
                     "next_obs": jnp.asarray(s[11:22]),
                     "action": jnp.asarray(s[22], jnp.int32),
                     "reward": jnp.asarray(s[23]),
                     "done": jnp.asarray(s[24] > 0.5)}
            if lc_lo % cfg.target_sync == 0:
                l[1] = l[0]
            l, last_loss = learn(l, batch, lc_lo + 1, cfg.num_actions)
            lc_lo += 1

        extr = extr + np.asarray(ts.rewards[:, 0], np.float32)
        opt_end = np.asarray(ts.done) | (
            goal_new == np.asarray(goal_status(ts.obs)))
        up_slab = np.concatenate([
            np.asarray(ts.obs).T.astype(np.float32),
            np.asarray(ts.obs).T.astype(np.float32),
            np.asarray(goal_new, np.float32)[None], extr[None],
            np.asarray(ts.done, np.float32)[None],
            np.zeros((FH.UP_F - 23, n), np.float32)])
        base = (i % R_up) * FH.UP_F
        old = up_ring[base:base + FH.UP_F]
        up_ring[base:base + FH.UP_F] = np.where(opt_end[None], up_slab, old)

        if i >= R_up - 1 and opt_end.any():
            s = up_ring[up_rounds[i] * FH.UP_F:(up_rounds[i] + 1) * FH.UP_F]
            if cols is not None:
                s = s[:, cols[2 * i + 1] * B:(cols[2 * i + 1] + 1) * B]
            batch = {"obs": jnp.asarray(s[0:10]),
                     "next_obs": jnp.asarray(s[10:20]),
                     "action": jnp.asarray(s[20], jnp.int32),
                     "reward": jnp.asarray(s[21]),
                     "done": jnp.asarray(s[22] > 0.5)}
            if lc_up % cfg.target_sync == 0:
                u[1] = u[0]
            u, _ = learn(u, batch, lc_up + 1, cfg.num_goals)
            lc_up += 1

        done = np.asarray(ts.done)
        ep_rew = ep_rew + np.asarray(ts.rewards[:, 0])
        # Post-step obs: hdqn.py:342 reads state AFTER `state = next_state`.
        won = done & (np.asarray(ts.obs)[:, 8] > np.asarray(ts.obs)[:, 3])
        met += [done.sum(), np.asarray(ts.collision).sum(), won.sum(),
                ep_rew[done].sum()]
        ep_rew = np.where(done, 0.0, ep_rew).astype(np.float32)

        obs = observe_after_reset(ep, env_state, ts)
        goal = goal_new
        opt_start = opt_end
        extr = np.where(opt_end, 0.0, extr).astype(np.float32)

    return {"u": u, "l": l, "lo_ring": lo_ring, "up_ring": up_ring,
            "env_state": env_state, "goal": goal, "extr": extr,
            "opt_start": opt_start, "ep_rew": ep_rew, "met": met,
            "lc_lo": lc_lo, "lc_up": lc_up, "last_loss": last_loss}


def test_fused_hdqn_e2e_vs_xla_reference():
    n, T = 128, 26
    cfg = HDQNConfig(lr=1e-3, gamma=0.9, target_sync=4,
                     memory_capacity=2 * n, goal_memory_capacity=2 * n,
                     opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=25)
    rng = np.random.default_rng(55)
    lo_rounds = rng.integers(0, 2, T).astype(np.int32)
    up_rounds = rng.integers(0, 2, T).astype(np.int32)
    race = _race(n, 500)

    carry = _mk(cfg, ep, n, seed=2, race=race)
    want = _reference(cfg, ep, carry, lo_rounds, up_rounds, race)

    # Two launches: the first (1 step) is shorter than the R-1 warm-up.
    got = carry
    lo = 0
    for hi in (1, T):
        got = FH.fused_hdqn_chunk(cfg, ep, got, hi - lo, seed=0, greedy=True,
                                  lo_rounds=lo_rounds[lo:hi],
                                  up_rounds=up_rounds[lo:hi])
        lo = hi

    assert want["met"][0] > 0 and want["met"][2] > 0
    assert want["lc_up"] > 0, "upper learner must fire"

    st = np.asarray(got["state"])
    es = want["env_state"]
    np.testing.assert_allclose(st[0:2], np.asarray(es.pos).T, atol=1e-4)
    np.testing.assert_allclose(st[2:4], np.asarray(es.vel).T, atol=1e-4)
    np.testing.assert_array_equal(st[8].astype(np.int32),
                                  np.asarray(es.winner))
    np.testing.assert_array_equal(st[11].astype(np.int32), want["goal"])
    np.testing.assert_array_equal(st[14] > 0.5, want["opt_start"])
    np.testing.assert_allclose(st[13], want["extr"], atol=1e-4)
    np.testing.assert_allclose(st[10], want["ep_rew"], atol=1e-4)
    # st[15] carries i32 BITS in the f32 row (saturation-safe counter).
    assert int(np.asarray(st[15][0:1]).view(np.int32)[0]) == want["lc_up"]

    np.testing.assert_allclose(np.asarray(got["lo_ring"]), want["lo_ring"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["up_ring"]), want["up_ring"],
                               rtol=1e-4, atol=1e-4)
    for name, k in (("u", ("u_p", "u_tp", "u_m", "u_v")),
                    ("l", ("l_p", "l_tp", "l_m", "l_v"))):
        for j, kk in enumerate(k):
            for a, b in zip(got[kk], want[name][j]):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-3, atol=2e-4,
                                           err_msg=f"{kk}")
    assert got["lo_learns"] == want["lc_lo"]
    assert got["episodes"] == want["met"][0]
    assert got["collisions"] == want["met"][1]
    assert got["wins"] == want["met"][2]
    np.testing.assert_allclose(got["last_loss"], want["last_loss"],
                               rtol=1e-3, atol=1e-6)


def test_fused_hdqn_e2e_lane_window_batch():
    """learn_batch < n: both learners consume uniformly chosen disjoint
    lane windows (lower and upper independently), locked against the
    same XLA reference."""
    n, B, T = 256, 128, 20
    cfg = HDQNConfig(lr=1e-3, gamma=0.9, target_sync=3,
                     memory_capacity=2 * n, goal_memory_capacity=2 * n,
                     opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=20)
    rng = np.random.default_rng(77)
    lo_rounds = rng.integers(0, 2, T).astype(np.int32)
    up_rounds = rng.integers(0, 2, T).astype(np.int32)
    cols = rng.integers(0, n // B, 2 * T).astype(np.int32)
    assert cols.min() == 0 and cols.max() == 1, "both windows exercised"
    race = _race(n, 900)

    carry = _mk(cfg, ep, n, seed=6, race=race, learn_batch=B)
    want = _reference(cfg, ep, carry, lo_rounds, up_rounds, race, cols=cols)
    assert want["lc_up"] > 0, "upper learner must fire"

    got = FH.fused_hdqn_chunk(cfg, ep, carry, T, seed=0, greedy=True,
                              lo_rounds=lo_rounds, up_rounds=up_rounds,
                              cols=cols)
    for name, k in (("u", ("u_p", "u_m")), ("l", ("l_p", "l_m"))):
        idx = {"u_p": 0, "u_m": 2, "l_p": 0, "l_m": 2}
        for kk in k:
            for a, b in zip(got[kk], want[name][idx[kk]]):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-3, atol=2e-4,
                                           err_msg=kk)
    assert got["lo_learns"] == want["lc_lo"]
    assert int(np.asarray(got["state"])[15][0:1].view(np.int32)[0]) == \
        want["lc_up"]
    np.testing.assert_allclose(got["last_loss"], want["last_loss"],
                               rtol=1e-3, atol=1e-6)


def test_fused_hdqn_orbax_resume_equals_continue(tmp_path):
    """The hierarchical carry round-trips through orbax and a resumed
    run continues bit-for-bit (cf. test_fused_trainer_recovery)."""
    from merging_gym_tpu.io.checkpoint import CheckpointManager

    n, steps = 128, 6
    cfg = HDQNConfig(lr=1e-3, target_sync=3, memory_capacity=2 * n,
                     goal_memory_capacity=2 * n, opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=20)
    race = _race(n, 600)

    def chunks(carry, count, base_seed):
        for _ in range(count):
            carry = FH.fused_hdqn_chunk(cfg, ep, carry, steps,
                                        seed=base_seed + carry["steps"],
                                        greedy=True)
        return carry

    carry0 = _mk(cfg, ep, n, seed=4, race=race)
    cont = chunks(dict(carry0), 3, base_seed=11)

    mid = chunks(dict(carry0), 1, base_seed=11)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, mid, wait=True)
    fresh = FH.fused_hdqn_init(jax.random.key(4), cfg, ep, n)
    restored = FH.coerce_hdqn_carry(mgr.restore(fresh))
    mgr.close()
    resumed = chunks(restored, 2, base_seed=11)

    for k in ("u_p", "l_p", "u_m", "l_v", "state", "lo_ring", "up_ring"):
        a, b = cont[k], resumed[k]
        if isinstance(a, tuple):
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y), k)
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), k)
    for k in ("lo_learns", "steps", "env_steps", "episodes", "collisions",
              "wins", "sum_ep_reward", "last_loss"):
        assert cont[k] == resumed[k], k


def test_fused_hdqn_bf16_matches_f32_under_decisive_actions():
    """f32-vs-bf16 agreement for the hierarchical kernel (the
    test_fused_trainer_e2e decisive-bias pattern): output biases of BOTH
    nets spread 500 apart so every argmax (meta goal pick, lower action,
    both learners' best_a) is decisive in either precision -- the two
    runs then take identical goals/actions, so env state, both rings and
    all metrics must match exactly, with the learners' params inside the
    accumulated per-update drift bound and masters f32."""
    n, T = 128, 26
    lr = 1e-4
    cfg32 = HDQNConfig(lr=lr, gamma=0.9, target_sync=4,
                       memory_capacity=2 * n, goal_memory_capacity=2 * n,
                       opponent=FT.OPP_L0)
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    ep = EnvParams(max_steps=25)
    rng = np.random.default_rng(77)
    lo_rounds = rng.integers(0, 2, T).astype(np.int32)
    up_rounds = rng.integers(0, 2, T).astype(np.int32)
    race = _race(n, 700)

    def mk():
        carry = _mk(cfg32, ep, n, seed=2, race=race)
        for k, na in (("u_p", cfg32.num_goals), ("u_tp", cfg32.num_goals),
                      ("l_p", cfg32.num_actions), ("l_tp", cfg32.num_actions)):
            spread = jnp.arange(na, dtype=jnp.float32)[:, None] * 500.0
            carry[k] = carry[k][:5] + (carry[k][5] + spread,)
        carry["opp_u"], carry["opp_l"] = carry["u_p"], carry["l_p"]
        return carry

    def run(cfg):
        got, lo = mk(), 0
        for hi in (1, T):
            got = FH.fused_hdqn_chunk(cfg, ep, got, hi - lo, seed=0,
                                      greedy=True,
                                      lo_rounds=lo_rounds[lo:hi],
                                      up_rounds=up_rounds[lo:hi])
            lo = hi
        return got

    g32, g16 = run(cfg32), run(cfg16)
    np.testing.assert_array_equal(np.asarray(g16["state"]),
                                  np.asarray(g32["state"]))
    np.testing.assert_array_equal(np.asarray(g16["lo_ring"]),
                                  np.asarray(g32["lo_ring"]))
    np.testing.assert_array_equal(np.asarray(g16["up_ring"]),
                                  np.asarray(g32["up_ring"]))
    for k in ("episodes", "collisions", "wins", "lo_learns"):
        assert g16[k] == g32[k], k
    assert g16["lo_learns"] > 0
    bound = 2.0 * lr * max(g32["lo_learns"], 1)
    for grp in ("u_p", "l_p"):
        for a16, a32 in zip(g16[grp], g32[grp]):
            assert a16.dtype == jnp.float32
            d = np.abs(np.asarray(a16) - np.asarray(a32)).max()
            assert d <= bound, f"{grp} drift {d:.2e} > {bound:.2e}"
