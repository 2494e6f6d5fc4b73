"""Headline benchmark: vectorised env throughput on one chip.

Measures env-steps/s of the 4096-env vectorized rollout with random
policies and full trajectory collection (BASELINE.json config 2).  On
TPU this drives the single-kernel Pallas rollout (ops/fused_rollout.py,
~1.3x the jit+vmap+scan path at this env count); the CPU fallback keeps
the XLA scan path.  The reference
runs one serial Python env with two quadprog QP solves and a shapely
polygon test per step -- order 1e3 env-steps/s on CPU at best
(BASELINE.md "implied throughput"); that 1e3 upper bound is the
``vs_baseline`` denominator.

Timing is forced-readback: every chunk ends with a host read of a scalar
reduction over the produced rewards, so the device cannot run ahead of
the clock (``block_until_ready`` alone proved unreliable on tunneled
runtimes).  The reported value is the median of several repetitions.

Robustness: the tunneled TPU of this environment can wedge (a stranded
remote chip grant hangs all execution indefinitely), so the measurement
runs in a subprocess under a watchdog; if it hangs or dies, the bench
falls back to the CPU backend and says so in the metric name rather than
hanging the caller.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import statistics
import subprocess
import sys
import time

NUM_ENVS = 4096
STEPS_PER_CHUNK = 512          # XLA scan path (CPU fallback)
CHUNKS_PER_REP = 4
# TPU reduce-on-chip kernel (ops/fused_rollout.fused_rollout_counters):
# outcome counters accumulate in VMEM, no trajectory stream, so HBM
# capacity no longer caps launch length and the ~25 ms per-launch
# dispatch (34.9% of the 20,480-step trajectory launch, roofline row 1)
# amortises over 1M steps to <1%.
COUNTERS_LAUNCH_OPTS = (1048576, 262144, 65536)
# Trajectory-mode fallback: one long launch per rep.  20,480 steps
# (~5 GB of trajectories) sits near the HBM output budget, so failures
# fall back to the next length.
FUSED_LAUNCH_OPTS = (20480, 16384)
FUSED_UNROLL = 8
REPS = 5
REFERENCE_STEPS_PER_SEC = 1e3  # BASELINE.md: implied 1e2-1e3 on CPU
WATCHDOG_S = 900


def measure(force_cpu: bool) -> float:
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from merging_gym_tpu.core import constants as C
    from merging_gym_tpu.core.env import EnvParams
    from merging_gym_tpu.core.vector import reset_batch, rollout

    params = EnvParams()

    if not force_cpu:
        # TPU: the single-kernel Pallas rollout (ops/fused_rollout.py) --
        # in-kernel random policy (distribution-equivalent to the XLA
        # path's), full trajectories (obs/rewards/done/winner/collision)
        # streamed to HBM.  One long launch per rep (16384 steps, 8-step
        # unroll): per-launch dispatch on this tunneled runtime costs
        # ~25 ms, so short launches are overhead-dominated (512-step
        # launches: 72M steps/s; 16384-step: ~1.0B steps/s for the SAME
        # per-step program -- sweep in docs/BENCHMARKS.md).
        from merging_gym_tpu.ops.fused_rollout import (fused_rollout,
                                                       fused_rollout_counters)

        def timed_rates(run, launch_steps):
            """Warmup + REPS timed launches; None if any launch fails
            (so the caller can fall back to a shorter length -- a launch
            can survive warmup and still die in a timed rep, e.g. HBM
            fragmentation)."""
            try:
                out = run(0)
                float(jnp.sum(out))  # warmup + forced sync
                rates = []
                for seed in range(1, REPS + 1):
                    t0 = time.perf_counter()
                    out = run(seed)
                    float(jnp.sum(out))  # forced readback fence
                    dt = time.perf_counter() - t0
                    rates.append(NUM_ENVS * launch_steps / dt)
                return rates
            except Exception as e:
                sys.stderr.write(f"launch {launch_steps}: {e!r:.500}, "
                                 "trying next config\n")
                return None

        for launch_steps in COUNTERS_LAUNCH_OPTS:
            def run_counters(seed):
                return fused_rollout_counters(
                    launch_steps, NUM_ENVS, seed=seed, env_params=params,
                    unroll=FUSED_UNROLL)["reward_sum"]

            rates = timed_rates(run_counters, launch_steps)
            if rates is not None:
                return statistics.median(rates)

        for launch_steps in FUSED_LAUNCH_OPTS:
            def run_traj(seed):
                return fused_rollout(launch_steps, NUM_ENVS, seed=seed,
                                     env_params=params,
                                     unroll=FUSED_UNROLL)["rewards"]

            rates = timed_rates(run_traj, launch_steps)
            if rates is not None:
                return statistics.median(rates)
        raise RuntimeError("all fused launch lengths failed")

    def policy(ps, obs, key):
        a = jax.random.randint(key, (obs.shape[0], 2), -1, C.NUM_ACTIONS)
        return ps, a

    state = reset_batch(params, jax.random.key(0), NUM_ENVS)
    run = jax.jit(lambda s, k: rollout(params, s, policy, None, k,
                                       STEPS_PER_CHUNK))
    (state, _), traj = run(state, jax.random.key(1))
    float(jnp.sum(traj.rewards))  # warmup + forced sync

    rates = []
    key_i = 2
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(CHUNKS_PER_REP):
            (state, _), traj = run(state, jax.random.key(key_i))
            key_i += 1
            float(jnp.sum(traj.rewards))  # forced readback fence
        dt = time.perf_counter() - t0
        rates.append(NUM_ENVS * STEPS_PER_CHUNK * CHUNKS_PER_REP / dt)
    return statistics.median(rates)


def main():
    if os.environ.get("_BENCH_CHILD"):
        value = measure(force_cpu=os.environ["_BENCH_CHILD"] == "cpu")
        print(json.dumps({"value": value}))
        return

    for backend in ("tpu", "cpu"):
        env = dict(os.environ)
        env["_BENCH_CHILD"] = backend
        try:
            out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 env=env, capture_output=True, text=True,
                                 timeout=WATCHDOG_S)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith('{"value"')]
            if out.returncode == 0 and line:
                value = json.loads(line[-1])["value"]
                suffix = "" if backend == "tpu" else "_CPU_FALLBACK_tpu_wedged"
                print(json.dumps({
                    "metric": f"env_steps_per_sec_1chip_4096envs{suffix}",
                    "value": round(value, 1),
                    "unit": "env-steps/s",
                    "vs_baseline": round(value / REFERENCE_STEPS_PER_SEC, 1),
                }))
                return
            sys.stderr.write(f"bench child ({backend}) failed:\n"
                             f"{out.stderr[-1500:]}\n")
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"bench child ({backend}) hit the "
                             f"{WATCHDOG_S}s watchdog (wedged device?)\n")
    print(json.dumps({
        "metric": "env_steps_per_sec_1chip_4096envs_FAILED",
        "value": 0.0, "unit": "env-steps/s", "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    main()
