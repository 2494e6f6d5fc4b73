"""Locks for the fused Rainbow trainer kernel (ops.fused_rainbow).

Three layers, mirroring the fused-DQN evidence chain:

  1. packing roundtrip + forward parity: the kernel's packed
     [464, 64]-block forward (`_rb_fwd`) against nn.rainbow_net's
     ``rainbow_apply`` (a different layout and matmul order), with
     noise;
  2. learner-math lock: the hand-derived backprop through CE ->
     clamp -> softmax -> dueling -> noisy layers -> trunk plus Adam
     (`rainbow_learn_math`) against jax.grad(agents.rainbow.rainbow_loss)
     + optax.adam, faithful and textbook C51, with obs_scale;
  3. end-to-end interpret-mode lock: whole ``fused_rainbow_chunk``
     launches (actor, env, unconditional ring, fill-prefix learn gating,
     episodic target sync, metrics, auto-reset, warm continuation)
     against a step-for-step XLA reference built from the independently
     verified components, in greedy (PRNG-free, fixed-noise) mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merging_gym_tpu.agents.rainbow import RainbowConfig, rainbow_loss
from merging_gym_tpu.core import constants as C
from merging_gym_tpu.core import env as core_env
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.core.vector import (autoreset_step, observe_after_reset,
                                         reset_batch)
from merging_gym_tpu.nn.rainbow_net import (rainbow_apply, rainbow_init,
                                            rainbow_q_values,
                                            rainbow_sample_noise)
from merging_gym_tpu.ops import fused_rainbow as FR
from merging_gym_tpu.ops import fused_trainer as FT


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(FR.pl, "pallas_call", patched)
    yield


def _params_noise(seed):
    kp, kn, kt = jax.random.split(jax.random.key(seed), 3)
    params = rainbow_init(kp, 10, 5)
    noise = rainbow_sample_noise(kn, 5)
    tnoise = rainbow_sample_noise(kt, 5)
    return params, noise, tnoise


def test_packed_roundtrip_and_forward_parity():
    params, noise, _ = _params_noise(0)
    p8 = FR.rainbow_params_to_packed(params)
    back = FR.rainbow_packed_to_params(p8)
    for name in params:
        for k in params[name]:
            np.testing.assert_array_equal(np.asarray(params[name][k]),
                                          np.asarray(back[name][k]),
                                          err_msg=f"{name}.{k}")

    n = 64
    x = jax.random.normal(jax.random.key(9), (n, 10), jnp.float32) * 3.0
    eps2 = FR.rainbow_noise_to_packed(noise)
    dists = FR._rb_fwd(p8, eps2, jnp.asarray(x.T))["dists"]
    ref = rainbow_apply(params, x, noise)                 # [n, A, atoms]
    for a in range(5):
        np.testing.assert_allclose(
            np.asarray(dists[a][:FR.ATOMS]), np.asarray(ref[:, a, :]).T,
            rtol=1e-5, atol=1e-7, err_msg=f"dist[{a}]")
        # Pad rows are exactly zero.
        np.testing.assert_array_equal(np.asarray(dists[a][FR.ATOMS:]),
                                      np.zeros((FR.AP - FR.ATOMS, n)))
    q = FR._rb_q(dists)
    np.testing.assert_allclose(np.asarray(q),
                               np.asarray(rainbow_q_values(ref)).T,
                               rtol=1e-4, atol=5e-6)


@pytest.mark.parametrize("faithful,obs_scale", [(True, 0.01), (False, None)])
def test_learn_math_matches_autodiff(faithful, obs_scale):
    import optax

    params, noise, tnoise = _params_noise(1)
    tparams, _, _ = _params_noise(2)
    cfg = RainbowConfig(lr=1e-3, gamma=0.9, faithful_c51=faithful,
                        obs_scale=obs_scale)
    n = 128
    rng = np.random.default_rng(5)
    batch_bn = {
        "obs": jnp.asarray(rng.normal(0, 30, (n, 10)), jnp.float32),
        "next_obs": jnp.asarray(rng.normal(0, 30, (n, 10)), jnp.float32),
        "action": jnp.asarray(rng.integers(0, 5, n), jnp.int32),
        "reward": jnp.asarray(rng.normal(0, 2, n), jnp.float32),
        "done": jnp.asarray(rng.random(n) < 0.3),
    }
    w = jnp.ones((n,), jnp.float32)

    # --- autodiff + optax reference ---------------------------------------
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)
    (loss_ref, _), grads = jax.value_and_grad(rainbow_loss, has_aux=True)(
        params, tparams, noise, tnoise, batch_bn, w, cfg)
    updates, opt_state = opt.update(grads, opt_state, params)
    params_ref = optax.apply_updates(params, updates)

    # --- kernel math --------------------------------------------------------
    p8 = FR.rainbow_params_to_packed(params)
    tp8 = FR.rainbow_params_to_packed(tparams)
    z8 = tuple(jnp.zeros_like(a) for a in p8)
    batch_rows = {
        "obs": batch_bn["obs"].T, "next_obs": batch_bn["next_obs"].T,
        "action": batch_bn["action"], "reward": batch_bn["reward"],
        "done": batch_bn["done"],
    }
    new_p, new_m, new_v, loss, _ = FR.rainbow_learn_math(
        p8, tp8, z8, z8, FR.rainbow_noise_to_packed(noise),
        FR.rainbow_noise_to_packed(tnoise), batch_rows, jnp.int32(1),
        gamma=cfg.gamma, lr=cfg.lr, obs_scale=obs_scale, faithful=faithful)

    np.testing.assert_allclose(float(loss), float(loss_ref),
                               rtol=1e-5, atol=1e-7)
    want = FR.rainbow_params_to_packed(params_ref)
    for k, (g, r) in enumerate(zip(new_p, want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=2e-5, err_msg=f"p[{k}]")
    # Second step continues to agree (Adam moment state).
    (_, _), grads = jax.value_and_grad(rainbow_loss, has_aux=True)(
        params_ref, tparams, noise, tnoise, batch_bn, w, cfg)
    updates, opt_state = opt.update(grads, opt_state, params_ref)
    params_ref2 = optax.apply_updates(params_ref, updates)
    new_p2, _, _, _, _ = FR.rainbow_learn_math(
        new_p, tp8, new_m, new_v, FR.rainbow_noise_to_packed(noise),
        FR.rainbow_noise_to_packed(tnoise), batch_rows, jnp.int32(2),
        gamma=cfg.gamma, lr=cfg.lr, obs_scale=obs_scale, faithful=faithful)
    want2 = FR.rainbow_params_to_packed(params_ref2)
    for k, (g, r) in enumerate(zip(new_p2, want2)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=3e-5, err_msg=f"p2[{k}]")


# ---------------------------------------------------------------------------
# End-to-end interpret lock
# ---------------------------------------------------------------------------

def _race_start(n, seed):
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(870.0, 948.0, n),
                    rng.uniform(870.0, 948.0, n)]).astype(np.float32)
    vel = np.stack([rng.uniform(5.0, 40.0, n),
                    rng.uniform(5.0, 40.0, n)]).astype(np.float32)
    return pos, vel


def _mk(cfg, ep, n, seed, race=None, learn_batch=None, ring_hbm=False):
    from merging_gym_tpu.core.geometry import lon2coord

    carry = FR.fused_rainbow_init(jax.random.key(seed), cfg, ep, n,
                                  learn_batch=learn_batch,
                                  ring_hbm=ring_hbm)
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


def _np_nstep(slabs, gamma):
    """Independent numpy n-step reconstruction (ops.nstep's emission
    content, locked against it by test_nstep_slab_reconstruction)."""
    ret = np.zeros_like(slabs[0][21])
    alive = np.ones_like(ret)
    nxt = np.zeros_like(slabs[0][10:20])
    n_step = len(slabs)
    for k, s in enumerate(slabs):
        d = s[22]
        ret = ret + (gamma ** k) * s[21] * alive
        sel = alive * d if k < n_step - 1 else alive
        nxt = nxt + sel[None] * s[10:20]
        alive = alive * (1.0 - d)
    return ret, nxt, alive < 0.5


def _xla_reference(cfg, ep, carry0, rounds, noise, tnoise, race=None,
                   cols=None, us=None):
    """The kernel's exact semantics from independent components: actor
    via rainbow_apply (different layout), learner via rainbow_learn_math
    (autodiff-locked above), numpy ring, episodic sync; with cfg.per, a
    fully independent numpy PER (flat searchsorted over the priority
    grid, fancy-indexing gathers, last-write priority sets)."""
    n, R = carry0["n"], carry0["R"]
    n_step = cfg.n_step
    p, tp = carry0["p"], carry0["tp"]
    m, v = carry0["m"], carry0["v"]
    eps2 = tuple(carry0["eps"])
    teps2 = tuple(carry0["teps"])
    scale = 1.0 if cfg.obs_scale is None else float(cfg.obs_scale)
    ring = np.zeros((R * FT.NUM_F, n), np.float32)
    maxp = 1.0
    env_state = reset_batch(ep, jax.random.key(0), n, jnp.float32)
    if race is not None:
        pos, vel = race
        env_state = env_state.replace(pos=jnp.asarray(pos.T),
                                      vel=jnp.asarray(vel.T))
    obs = jax.vmap(core_env.observe)(env_state)
    ep_rew = np.zeros(n, np.float32)
    met = np.zeros(4, np.float64)
    learns, synced, last_loss = 0, 0.0, 0.0

    def act_fn(params_d, o):
        dist = rainbow_apply(params_d, o * scale, noise)
        return jnp.argmax(rainbow_q_values(dist), axis=-1).astype(jnp.int32)

    act = jax.jit(act_fn)
    stepper = jax.jit(lambda s, a: autoreset_step(ep, s, a, jax.random.key(1)))
    learner = jax.jit(lambda p, tp, m, v, b, t, w: FR.rainbow_learn_math(
        p, tp, m, v, eps2, teps2, b, t, gamma=cfg.gamma, lr=cfg.lr,
        obs_scale=cfg.obs_scale, faithful=cfg.faithful_c51, weights=w))

    T = len(rounds)
    for i in range(T):
        pd = FR.rainbow_packed_to_params(p)
        a1 = act(pd, obs)
        if cfg.opponent == FT.OPP_L0:
            a2 = jnp.full((n,), C.ACTION_NONE, jnp.int32)
        else:
            roll = cfg.opponent_roll
            a2 = act(pd, jnp.concatenate([obs[:, roll:], obs[:, :roll]],
                                         axis=1))
        env_state, ts = stepper(env_state, jnp.stack([a1, a2], axis=-1))

        # Unconditional ring write (ranbowdqn.py:673); with PER the pad
        # row carries the priority init maxp ** alpha.
        pad = (np.full((1, n), maxp ** cfg.per_alpha, np.float32)
               if cfg.per else np.zeros((1, n), np.float32))
        slab = np.concatenate([
            np.asarray(obs).T.astype(np.float32),
            np.asarray(ts.obs).T.astype(np.float32),
            np.asarray(a1, np.float32)[None],
            np.asarray(ts.rewards[:, 0], np.float32)[None],
            np.asarray(ts.done, np.float32)[None],
            pad,
        ])
        ring[(i % R) * FT.NUM_F:(i % R + 1) * FT.NUM_F] = slab

        # Learner: gate = n_step + 1 stored rounds.
        if i >= n_step:
            weights, sel_rl = None, None
            if cfg.per:
                B = carry0["B"]
                stored = min(i + 1, R)
                cur = i % R
                ages = (cur - np.arange(R)) % R
                valid = (ages >= n_step - 1) & (ages <= stored - 1)
                P = ring[np.arange(R) * FT.NUM_F + FT.NUM_F - 1].copy()
                P[~valid] = 0.0
                total = P.sum(dtype=np.float32)
                u = ((np.arange(B) + us[i]) / B * total).astype(np.float32)
                idx = np.clip(np.searchsorted(np.cumsum(P.reshape(-1),
                                                        dtype=np.float32),
                                              u, side="right"),
                              0, R * n - 1)
                r_b, l_b = idx // n, idx % n
                slabs = []
                for k in range(n_step):
                    rk = (r_b + k) % R
                    slabs.append(np.stack(
                        [ring[rk[b] * FT.NUM_F:(rk[b] + 1) * FT.NUM_F,
                              l_b[b]] for b in range(B)], axis=1))
                ret, nxt, dn = _np_nstep(slabs, cfg.gamma)
                s0 = slabs[0]
                batch = {"obs": jnp.asarray(s0[0:10]),
                         "next_obs": jnp.asarray(nxt),
                         "action": jnp.asarray(s0[20], jnp.int32),
                         "reward": jnp.asarray(ret),
                         "done": jnp.asarray(dn)}
                nvalid = (stored - (n_step - 1)) * n
                probs = P.reshape(-1)[idx] / total
                w = (probs * nvalid) ** (-cfg.per_beta)
                pmin = P[P > 0].min() / total
                weights = jnp.asarray(
                    w / (pmin * nvalid) ** (-cfg.per_beta), jnp.float32)
                sel_rl = (r_b, l_b)
            else:
                slabs = []
                for k in range(n_step):
                    pk = (rounds[i] + k) % R
                    s = ring[pk * FT.NUM_F:(pk + 1) * FT.NUM_F]
                    if cols is not None:
                        B = carry0["B"]
                        s = s[:, cols[i] * B:(cols[i] + 1) * B]
                    slabs.append(s)
                ret, nxt, dn = _np_nstep(slabs, cfg.gamma)
                s0 = slabs[0]
                batch = {"obs": jnp.asarray(s0[0:10]),
                         "next_obs": jnp.asarray(nxt),
                         "action": jnp.asarray(s0[20], jnp.int32),
                         "reward": jnp.asarray(ret),
                         "done": jnp.asarray(dn)}
            p, m, v, loss, ce = learner(p, tp, m, v, batch,
                                        jnp.int32(learns + 1), weights)
            if cfg.per:
                newp = np.maximum(np.asarray(ce) + 1e-5, 1e-8)
                r_b, l_b = sel_rl
                ring[r_b * FT.NUM_F + FT.NUM_F - 1, l_b] = \
                    (newp ** cfg.per_alpha).astype(np.float32)
                maxp = max(maxp, float(newp.max()))
            learns += 1
            last_loss = float(loss)

        done = np.asarray(ts.done)
        ep_rew = ep_rew + np.asarray(ts.rewards[:, 0])
        won = done & (np.asarray(obs)[:, 8] > np.asarray(obs)[:, 3])
        met += [done.sum(), np.asarray(ts.collision).sum(), won.sum(),
                ep_rew[done].sum()]
        ep_rew = np.where(done, 0.0, ep_rew).astype(np.float32)

        # Episodic hard target sync (ranbowdqn.py:690-691), post-learn.
        chunks = np.floor(met[0] / cfg.target_sync_episodes)
        if chunks > synced:
            tp, synced = p, chunks

        obs = observe_after_reset(ep, env_state, ts)

    return {"p": p, "tp": tp, "m": m, "v": v, "ring": ring,
            "env_state": env_state, "ep_rew": ep_rew, "met": met,
            "learns": learns, "last_loss": last_loss, "maxp": maxp}


def _check(carry, want):
    got_env = np.asarray(carry["env"])
    st = want["env_state"]
    np.testing.assert_allclose(got_env[0:2], np.asarray(st.pos).T,
                               rtol=0, atol=1e-4, err_msg="pos")
    np.testing.assert_allclose(got_env[2:4], np.asarray(st.vel).T,
                               rtol=0, atol=1e-4, err_msg="vel")
    np.testing.assert_array_equal(got_env[8].astype(np.int32),
                                  np.asarray(st.winner), err_msg="winner")
    np.testing.assert_allclose(got_env[10], want["ep_rew"],
                               rtol=0, atol=1e-4, err_msg="ep_reward")
    np.testing.assert_allclose(got_env[13],
                               np.full_like(got_env[13], want["maxp"]),
                               rtol=1e-4, atol=1e-5, err_msg="max_priority")
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
                               rtol=1e-3, atol=1e-6)


def _run_chunks(cfg, ep, carry, rounds, splits, cols=None):
    lo = 0
    for hi in splits + [len(rounds)]:
        carry = FR.fused_rainbow_chunk(
            cfg, ep, carry, hi - lo, seed=0, greedy=True,
            rounds=rounds[lo:hi],
            cols=None if cols is None else cols[lo:hi])
        lo = hi
    return carry


@pytest.mark.parametrize("ring_hbm", [False, True])
def test_e2e_selfplay_faithful(ring_hbm):
    """Self-play (correct roll 5), faithful C51 + obs_scale, episodic
    target sync crossing, 2 chunks (cold + warm/noise continuation).
    ring_hbm=True runs the SAME lock with the HBM-resident DMA ring."""
    n, T = 128, 30
    cfg = RainbowConfig(lr=1e-3, gamma=0.9, target_sync_episodes=3,
                        memory_capacity=3 * n, obs_scale=0.01,
                        opponent=FT.OPP_SELFPLAY)
    ep = EnvParams(max_steps=20)
    rng = np.random.default_rng(4)
    rounds = np.minimum(rng.integers(0, 3, T),
                        np.arange(T)).astype(np.int32)

    race = _race_start(n, seed=500)
    carry = _mk(cfg, ep, n, seed=0, race=race, ring_hbm=ring_hbm)
    want = _xla_reference(cfg, ep, carry, rounds,
                          *_noise_trees(carry), race=race)
    got = _run_chunks(cfg, ep, carry, rounds, splits=[3])
    assert want["met"][0] > 0, "episodes must end"
    assert want["met"][0] >= 2 * cfg.target_sync_episodes, \
        "the episodic sync must fire (at least twice)"
    _check(got, want)


def test_e2e_l0_textbook_reference_roll():
    """L0 opponent, textbook projection, no obs scaling; single launch."""
    n, T = 128, 24
    cfg = RainbowConfig(lr=5e-4, gamma=0.99, target_sync_episodes=4,
                        memory_capacity=2 * n, obs_scale=None,
                        faithful_c51=False, opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=18)
    rng = np.random.default_rng(8)
    rounds = np.minimum(rng.integers(0, 2, T),
                        np.arange(T)).astype(np.int32)

    race = _race_start(n, seed=600)
    carry = _mk(cfg, ep, n, seed=7, race=race)
    want = _xla_reference(cfg, ep, carry, rounds,
                          *_noise_trees(carry), race=race)
    got = _run_chunks(cfg, ep, carry, rounds, splits=[])
    assert want["met"][1] > 0, "collisions must occur"
    _check(got, want)


def _noise_trees(carry):
    """Recover noise PyTrees matching the carry's packed noise (the init
    sampled them from fold_in(key, 2) splits -- rebuild identically)."""
    # The reference loop only needs the ONLINE noise tree for the actor;
    # the learner consumes the packed arrays from the carry directly.
    # Rebuild a tree from the packed arrays via the params unpacker shape
    # conventions.
    epsT, epsb = carry["eps"]
    tree = {}
    for name, off, rows in FR._SEGS:
        tree[name] = {"w_eps": epsT[off:off + rows].T,
                      "b_eps": epsb[off:off + rows, 0]}
    weT = jnp.concatenate([epsT[FR._a2_rows(a):FR._a2_rows(a) + FR.ATOMS]
                           for a in range(FR.A)])
    tree["noisy_advantage2"] = {
        "w_eps": weT.T,
        "b_eps": jnp.concatenate(
            [epsb[FR._a2_rows(a):FR._a2_rows(a) + FR.ATOMS, 0]
             for a in range(FR.A)]),
    }
    return tree, None


def test_e2e_lane_window_batch():
    """learn_batch < num_envs: the dynamic lane-window slice cutting the
    dominant C51 learner cost, locked against the same XLA reference."""
    n, B, T = 256, 128, 20
    cfg = RainbowConfig(lr=1e-3, gamma=0.9, target_sync_episodes=4,
                        memory_capacity=2 * n, obs_scale=0.01,
                        opponent=FT.OPP_L0)
    ep = EnvParams(max_steps=18)
    rng = np.random.default_rng(15)
    rounds = np.minimum(rng.integers(0, 2, T), np.arange(T)).astype(np.int32)
    cols = rng.integers(0, n // B, T).astype(np.int32)
    assert cols.min() == 0 and cols.max() == 1, "both windows exercised"

    race = _race_start(n, seed=800)
    carry = _mk(cfg, ep, n, seed=11, race=race, learn_batch=B)
    want = _xla_reference(cfg, ep, carry, rounds, *_noise_trees(carry),
                          race=race, cols=cols)
    got = _run_chunks(cfg, ep, carry, rounds, splits=[5], cols=cols)
    _check(got, want)


def test_orbax_roundtrip_resume_equals_continue(tmp_path):
    """Checkpoint/resume for the fused Rainbow trainer: an orbax
    save/restore roundtrip mid-run continues bit-for-bit (greedy
    interpret mode, global-step-derived chunk seeds -- cf.
    tests/test_fused_trainer_recovery.py)."""
    from merging_gym_tpu.io.checkpoint import CheckpointManager

    n, steps = 128, 6
    cfg = RainbowConfig(lr=1e-3, target_sync_episodes=3,
                        memory_capacity=2 * n, obs_scale=0.01,
                        opponent=FT.OPP_SELFPLAY)
    ep = EnvParams(max_steps=15)

    def chunks(carry, count):
        for _ in range(count):
            carry = FR.fused_rainbow_chunk(cfg, ep, carry, steps,
                                           seed=31 + carry["steps"],
                                           greedy=True)
        return carry

    race = _race_start(n, seed=700)
    carry0 = _mk(cfg, ep, n, seed=4, race=race)

    cont = chunks(dict(carry0), 3)

    mid = chunks(dict(carry0), 1)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, mid, wait=True)
    fresh = FR.fused_rainbow_init(jax.random.key(4), cfg, ep, n)
    restored = FR.coerce_rainbow_carry(mgr.restore(fresh))
    mgr.close()
    assert restored["steps"] == steps and restored["warm"] == 1
    resumed = chunks(restored, 2)

    for k in ("p", "tp", "m", "v", "eps", "teps"):
        for a, b in zip(cont[k], resumed[k]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=k)
    np.testing.assert_array_equal(np.asarray(cont["ring"]),
                                  np.asarray(resumed["ring"]))
    np.testing.assert_array_equal(np.asarray(cont["env"]),
                                  np.asarray(resumed["env"]))
    for k in ("learns", "steps", "env_steps", "episodes", "collisions",
              "wins", "sum_ep_reward", "last_loss"):
        assert cont[k] == resumed[k], k


# ---------------------------------------------------------------------------
# PER + n-step (round 3)
# ---------------------------------------------------------------------------

def test_per_pick_matches_flat_searchsorted():
    """per_pick's three-level count-and-one-hot == numpy flat
    searchsorted(side='right') over the round-major cdf, including
    zeroed (invalid) rounds and the clip at the top edge."""
    rng = np.random.default_rng(0)
    R, n, B = 8, 256, 64
    P = rng.random((R, n)).astype(np.float32)
    P[5:] = 0.0                           # invalid rounds masked to zero
    total = P.sum(dtype=np.float32)
    u = ((np.arange(B) + rng.random()) / B * total).astype(np.float32)
    ohR, ohL, p_sel = FR.per_pick(jnp.asarray(P),
                                  jnp.asarray(u[:, None], jnp.float32))
    idx = np.clip(np.searchsorted(np.cumsum(P.reshape(-1), dtype=np.float32),
                                  u, side="right"), 0, R * n - 1)
    np.testing.assert_array_equal(np.asarray(ohR).argmax(1), idx // n)
    np.testing.assert_array_equal(np.asarray(ohL).argmax(1), idx % n)
    assert np.asarray(ohR).sum() == B and np.asarray(ohL).sum() == B
    np.testing.assert_allclose(np.asarray(p_sel), P.reshape(-1)[idx],
                               rtol=1e-6)


def test_nstep_slab_reconstruction_matches_ops_nstep():
    """nstep_batch_from_slabs reproduces ops.nstep's emissions exactly:
    for every window start, the discounted return, done flag and
    bootstrap next_obs equal what nstep_update emitted for that
    transition (mature and done-flushed entries alike)."""
    from merging_gym_tpu.ops.nstep import nstep_init, nstep_update

    rng = np.random.default_rng(1)
    T, envs, nst, gamma = 12, 5, 3, 0.9
    obs_seq = rng.normal(size=(T, envs, 10)).astype(np.float32)
    act_seq = rng.integers(0, 5, (T, envs)).astype(np.int32)
    rew_seq = rng.normal(size=(T, envs)).astype(np.float32)
    done_seq = rng.random((T, envs)) < 0.25
    nxt_seq = rng.normal(size=(T, envs, 10)).astype(np.float32)

    st = nstep_init(nst, envs, 10)
    emitted = {}
    for t in range(T):
        st, items, mask = nstep_update(
            st, jnp.asarray(obs_seq[t]), jnp.asarray(act_seq[t]),
            jnp.asarray(rew_seq[t]), jnp.asarray(done_seq[t]),
            jnp.asarray(nxt_seq[t]), gamma)
        m = np.asarray(mask)
        it = {k: np.asarray(v) for k, v in items.items()}
        for j in np.where(m)[0]:
            key = (tuple(np.round(it["obs"][j], 5)), int(it["action"][j]))
            emitted[key] = (it["reward"][j], it["next_obs"][j],
                            bool(it["done"][j]))

    checked = 0
    for t0 in range(T - nst + 1):
        slabs = []
        for k in range(nst):
            t = t0 + k
            slabs.append(jnp.asarray(np.concatenate([
                obs_seq[t].T, nxt_seq[t].T,
                act_seq[t][None].astype(np.float32), rew_seq[t][None],
                done_seq[t][None].astype(np.float32),
                np.zeros((1, envs), np.float32)])))
        b = FR.nstep_batch_from_slabs(slabs, gamma)
        for e in range(envs):
            key = (tuple(np.round(obs_seq[t0, e], 5)), int(act_seq[t0, e]))
            if key not in emitted:
                continue
            ref_r, ref_nxt, ref_d = emitted[key]
            np.testing.assert_allclose(float(np.asarray(b["reward"])[e]),
                                       ref_r, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(b["next_obs"])[:, e],
                                       ref_nxt, rtol=1e-5, atol=1e-6)
            assert bool(np.asarray(b["done"])[e]) == ref_d
            checked += 1
    assert checked >= 40, "reconstruction must cover a dense sample"


def _run_chunks_per(cfg, ep, carry, T, us, splits):
    lo = 0
    for hi in splits + [T]:
        carry = FR.fused_rainbow_chunk(cfg, ep, carry, hi - lo, seed=0,
                                       greedy=True, us=us[lo:hi])
        lo = hi
    return carry


def test_e2e_per_3step():
    """Full PER + 3-step in ONE kernel: on-chip stratified inverse-CDF
    sampling over ring-resident priorities, importance-weighted C51
    learns, ce-priority scatter, running-max tracking, and sample-time
    n-step reconstruction -- locked whole-chunk against an independent
    numpy PER (flat searchsorted + fancy indexing) driving the
    autodiff-locked learner.  Split into 2 launches to cover warm
    continuation of priorities/maxp across chunk boundaries."""
    n, T = 128, 34
    cfg = RainbowConfig(lr=1e-3, gamma=0.9, target_sync_episodes=3,
                        memory_capacity=5 * n, obs_scale=0.01,
                        opponent=FT.OPP_SELFPLAY, per=True, n_step=3,
                        per_alpha=0.6, per_beta=0.4, batch_size=32)
    ep = EnvParams(max_steps=16)
    rng = np.random.default_rng(21)
    us = rng.random(T).astype(np.float32)
    rounds = np.zeros(T, np.int32)          # unused by the PER path

    race = _race_start(n, seed=900)
    carry = _mk(cfg, ep, n, seed=3, race=race)
    assert carry["B"] == 32
    want = _xla_reference(cfg, ep, carry, rounds, *_noise_trees(carry),
                          race=race, us=us)
    got = _run_chunks_per(cfg, ep, carry, T, us, splits=[7])
    assert want["met"][0] > 0, "episodes must end"
    assert want["maxp"] > 1.0, "the running max must have moved"
    _check(got, want)


def test_e2e_per_1step():
    """PER without n-step (the ops.per configuration), L0 opponent,
    textbook projection; single launch."""
    n, T = 128, 22
    cfg = RainbowConfig(lr=5e-4, gamma=0.99, target_sync_episodes=4,
                        memory_capacity=3 * n, obs_scale=0.01,
                        faithful_c51=False, opponent=FT.OPP_L0,
                        per=True, n_step=1, per_beta=0.5, batch_size=40)
    ep = EnvParams(max_steps=18)
    rng = np.random.default_rng(22)
    us = rng.random(T).astype(np.float32)
    rounds = np.zeros(T, np.int32)

    race = _race_start(n, seed=901)
    carry = _mk(cfg, ep, n, seed=5, race=race)
    want = _xla_reference(cfg, ep, carry, rounds, *_noise_trees(carry),
                          race=race, us=us)
    got = _run_chunks_per(cfg, ep, carry, T, us, splits=[])
    assert want["learns"] == T - 1
    _check(got, want)


@pytest.mark.parametrize("ring_hbm", [False, True])
def test_e2e_uniform_3step(ring_hbm):
    """n-step on the uniform path: host-drawn valid START rounds, the
    B-lane window slice, and the same slab-window reconstruction.
    ring_hbm=True additionally exercises the n-step window DMA prefetch
    and the staged-slab patch when a window round equals the write
    round."""
    n, B, T = 256, 128, 26
    cfg = RainbowConfig(lr=1e-3, gamma=0.9, target_sync_episodes=4,
                        memory_capacity=4 * n, obs_scale=0.01,
                        opponent=FT.OPP_L0, n_step=3)
    ep = EnvParams(max_steps=15)
    rng = np.random.default_rng(23)
    # Valid starts: at step i (fresh run) rounds 0..i are stored; a
    # 3-step window starting at s needs s+2 <= i, i.e. s <= i - 2.
    hi = np.maximum(np.arange(T) - (cfg.n_step - 1), 0)
    rounds = np.minimum(rng.integers(0, 4, T), hi).astype(np.int32)
    cols = rng.integers(0, n // B, T).astype(np.int32)

    race = _race_start(n, seed=902)
    carry = _mk(cfg, ep, n, seed=9, race=race, learn_batch=B,
                ring_hbm=ring_hbm)
    want = _xla_reference(cfg, ep, carry, rounds, *_noise_trees(carry),
                          race=race, cols=cols)
    got = _run_chunks(cfg, ep, carry, rounds, splits=[9], cols=cols)
    assert want["learns"] == T - cfg.n_step
    _check(got, want)


def test_per_resume_equals_continue(tmp_path):
    """Checkpoint/resume with PER + n-step: the ring-resident
    priorities, the max-priority env row and the n-step warm counter
    all roundtrip through orbax and continue bit-for-bit."""
    from merging_gym_tpu.io.checkpoint import CheckpointManager

    n, steps = 128, 7
    cfg = RainbowConfig(lr=1e-3, target_sync_episodes=3,
                        memory_capacity=5 * n, obs_scale=0.01,
                        opponent=FT.OPP_SELFPLAY, per=True, n_step=3,
                        batch_size=32)
    ep = EnvParams(max_steps=15)

    def chunks(carry, count):
        for _ in range(count):
            carry = FR.fused_rainbow_chunk(cfg, ep, carry, steps,
                                           seed=77 + carry["steps"],
                                           greedy=True)
        return carry

    race = _race_start(n, seed=903)
    carry0 = _mk(cfg, ep, n, seed=6, race=race)

    cont = chunks(dict(carry0), 3)

    mid = chunks(dict(carry0), 1)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, mid, wait=True)
    fresh = FR.fused_rainbow_init(jax.random.key(6), cfg, ep, n)
    restored = FR.coerce_rainbow_carry(mgr.restore(fresh))
    mgr.close()
    assert restored["steps"] == steps
    resumed = chunks(restored, 2)

    for k in ("p", "tp", "m", "v"):
        for a, b in zip(cont[k], resumed[k]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=k)
    np.testing.assert_array_equal(np.asarray(cont["ring"]),
                                  np.asarray(resumed["ring"]))
    np.testing.assert_array_equal(np.asarray(cont["env"]),
                                  np.asarray(resumed["env"]))
    for k in ("learns", "steps", "episodes"):
        assert cont[k] == resumed[k], k


def test_coerce_migrates_13_row_env():
    """Pre-PER checkpoints stored 13 env rows; coerce appends the
    max-priority row at its init value so old fused-Rainbow runs
    restore unchanged."""
    cfg = RainbowConfig(memory_capacity=2 * 128, obs_scale=0.01,
                        opponent=FT.OPP_L0)
    carry = FR.fused_rainbow_init(jax.random.key(0), cfg, EnvParams(), 128)
    old = dict(carry)
    old["env"] = carry["env"][:13]
    out = FR.coerce_rainbow_carry(old)
    assert out["env"].shape == (FR.ENV_ROWS, 128)
    np.testing.assert_array_equal(np.asarray(out["env"][13]),
                                  np.ones(128, np.float32))
