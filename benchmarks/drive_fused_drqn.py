"""Drive the fused DRQN kernel on the real chip: compile, run chunks,
report env-steps/s with forced-readback fencing (the bench.py rule:
block_until_ready alone can lie on the axon tunnel)."""
import json
import time

import jax
import jax.numpy as jnp

from merging_gym_tpu.agents.drqn import DRQNConfig
from merging_gym_tpu.core.env import EnvParams
from merging_gym_tpu.ops import fused_drqn as FD

def main(num_envs=1024, learn_batch=128, steps=4096, reps=5):
    cfg = DRQNConfig(memory_capacity=4 * num_envs, opponent="selfplay",
                     seq_len=16, burn_in=4)
    ep = EnvParams()
    c = FD.fused_drqn_init(jax.random.key(0), cfg, ep, num_envs,
                           learn_batch=learn_batch)
    t0 = time.time()
    c = FD.fused_drqn_chunk(cfg, ep, c, steps, seed=0)
    fence = float(jnp.sum(c["p"][0])) + float(jnp.sum(c["env"]))
    print(f"first chunk (incl. compile): {time.time()-t0:.1f}s fence={fence:.3e}",
          flush=True)
    rates = []
    for i in range(reps):
        t0 = time.time()
        c = FD.fused_drqn_chunk(cfg, ep, c, steps, seed=i + 1)
        fence = float(jnp.sum(c["p"][0])) + float(jnp.sum(c["env"]))
        dt = time.time() - t0
        rates.append(steps * num_envs / dt)
        print(f"rep {i}: {dt:.3f}s {rates[-1]/1e6:.2f}M env-steps/s "
              f"loss={c['last_loss']:.4f} eps={c['episodes']:.0f} "
              f"coll_rate={c['collisions']/max(c['episodes'],1):.3f}",
              flush=True)
    rates.sort()
    print(json.dumps({
        "metric": "fused_drqn_env_steps_per_sec",
        "value": rates[len(rates) // 2],
        "unit": "env-steps/s", "num_envs": num_envs,
        "learn_batch": learn_batch, "chunk_steps": steps,
        "learns": c["learns"], "episodes": c["episodes"],
    }), flush=True)

if __name__ == "__main__":
    import sys
    kw = dict(a.split("=") for a in sys.argv[1:])
    main(**{k: int(v) for k, v in kw.items()})
