#!/usr/bin/env python
"""Installation smoke test.

The analog of the reference's scripts/{go1,go2,b1}/test.py ("If it runs
then you have installed the gym environments correctly",
README.md:108-115): build a small world, step it with zero actions, print
progress.

    python scripts/smoke.py [--preset go1_flat] [--steps 100]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="go1_flat")
    ap.add_argument("--num-envs", type=int, default=3)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wtw_tpu.config import PRESETS
    from wtw_tpu.envs import make_legged_env

    cfg = PRESETS[args.preset](num_envs=args.num_envs)
    env = make_legged_env(cfg, seed=0)
    world = env.init_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    t0 = time.time()
    for i in range(args.steps):
        world, obs, rew, done, info = step(
            world, jnp.zeros((args.num_envs, env.num_actions)))
        if i % max(args.steps // 10, 1) == 0:
            print(f"step {i:4d} | rew {float(rew.mean()):+.4f} | "
                  f"base z {float(world.env.phys.base_pos[:, 2].mean()):.3f}")
    assert bool(jnp.isfinite(rew).all()), "NaN reward"
    print(f"OK — {args.steps} steps x {args.num_envs} envs in "
          f"{time.time()-t0:.1f}s. If this ran, the environments are "
          f"installed correctly.")


if __name__ == "__main__":
    main()
