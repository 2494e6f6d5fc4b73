"""Render an episode to an animated GIF (headless-safe).

Replays a policy-vs-policy episode through the reference-API env and the
pygame renderer, capturing each frame -- the offline analog of the
reference's live ``env.render()`` loop (merging_env.py:241-352), usable
on machines with no display (SDL dummy driver).

    python examples/render_rollout.py --out episode.gif \
        [--p1 <params.npz|ref .pth dir|const:N>] [--p2 l0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")


def policy_action(spec, params_cache, obs, step):
    import jax.numpy as jnp
    from merging_gym_tpu.nn.mlp import qnet_apply

    if spec == "l0":
        return None
    if spec.startswith("const:"):
        return int(spec.split(":")[1])
    q = qnet_apply(params_cache[spec], jnp.asarray(obs, jnp.float32))
    return int(q.argmax())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p1", default="const:3")
    ap.add_argument("--p2", default="l0")
    ap.add_argument("--out", default="episode.gif")
    ap.add_argument("--every", type=int, default=4, help="capture every Nth frame")
    ap.add_argument("--max-steps", type=int, default=600)
    args = ap.parse_args()

    from PIL import Image

    from merging_gym_tpu.envs.gym_env import MergeEnv

    params_cache = {}
    for spec in (args.p1, args.p2):
        if spec not in ("l0",) and not spec.startswith("const:"):
            from merging_gym_tpu.cli import _load_frozen_qnet
            params_cache[spec] = _load_frozen_qnet(spec)

    env = MergeEnv()
    env._ui()
    env._renderer.wait_ms = 0
    obs = env.reset()
    frames = []
    for t in range(args.max_steps):
        a1 = policy_action(args.p1, params_cache, obs, t)
        a2 = policy_action(args.p2, params_cache, obs[5:] + obs[:5], t)
        obs, rewards, done, info = env.step(a1 if a1 is not None else 2, a2)
        if t % args.every == 0:
            env.render(player=2)
            frames.append(Image.fromarray(env._renderer.frame_array()))
        if done:
            env.render(player=2, tag_left="Finished", tag_right="Finished")
            frames.append(Image.fromarray(env._renderer.frame_array()))
            break

    frames[0].save(args.out, save_all=True, append_images=frames[1:],
                   duration=80, loop=0)
    print(f"wrote {args.out} ({len(frames)} frames, done={done}, "
          f"winner={env.winner}, collision={info['collision']})")
    env.close()


if __name__ == "__main__":
    main()
