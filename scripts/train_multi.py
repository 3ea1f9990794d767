#!/usr/bin/env python
"""Train ONE policy on a mixed multi-embodiment batch (Go1 + Go2 + ...).

The multi-embodiment showcase (BASELINE.json config #4): robots with the
same topology but different masses/geometry/leg order train in ONE batch
through the vmapped engine — the reference needs a separate Isaac process
and a copied package per robot (SURVEY.md §1).

    python scripts/train_multi.py --robots go1,go2 --num-envs 1024 \
        --iterations 800

Per-robot reward curves land in <run_dir>/metrics.csv (rew_<robot> columns:
mean per-step reward over that robot's envs this iteration).
"""
import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", default="go1,go2")
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--iterations", type=int, default=800)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-freq", type=int, default=20)
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--set", action="append", default=[], metavar="K=V")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import wtw_tpu; wtw_tpu.enable_compilation_cache()
    from wtw_tpu.config import apply_overrides, go1_flat_config
    from wtw_tpu.envs.multi_env import make_multi_legged_env
    from wtw_tpu.learn import PPOArgs
    from wtw_tpu.learn.ppo_cse import init_train_state, make_train_fns
    from wtw_tpu.models.actor_critic import ACArgs

    robots = args.robots.split(",")
    cfg = go1_flat_config(num_envs=args.num_envs)
    cfg = apply_overrides(cfg, args.set)
    env = make_multi_legged_env(cfg, robots, seed=args.seed)
    run_dir = args.run_dir or f"runs/multi_{'_'.join(robots)}"
    os.makedirs(run_dir, exist_ok=True)
    print(f"multi-embodiment: {robots} x {args.num_envs} envs -> {run_dir}")

    # per-robot masks for the reward curves
    onehot = jnp.stack([
        jnp.asarray(env.robot_assignment == r, jnp.float32)
        for r in range(len(robots))])                       # (R, N)
    counts = onehot.sum(axis=1)

    ppo_args = PPOArgs()
    ac_args = ACArgs()
    ts = init_train_state(jax.random.PRNGKey(args.seed + 1), env, ppo_args,
                          ac_args)
    world = env.init_state(jax.random.PRNGKey(args.seed))
    world, obs_dict = env.get_observations(world)

    base_fn = make_train_fns(env, ppo_args, ac_args)

    def iteration(ts, world, obs_dict):
        ts, world, obs_dict, stats = base_fn(ts, world, obs_dict)
        # mean per-step reward this iteration, split by embodiment: the
        # env keeps per-env episode reward accumulators; the per-step mean
        # uses the same step rewards the learner saw (stats carries only
        # the batch mean), so re-derive from episode_sums deltas is noisy —
        # instead act on the CURRENT state: one extra policy step's reward
        # per robot (cheap, same jit).
        from wtw_tpu.models import actor_critic as ac
        mean, _ = ac.act_student(ts.params, obs_dict["obs_history"], ac_args)
        w2, _, rew, _, _ = env.step(world, mean)
        per_robot = (onehot @ rew) / jnp.maximum(counts, 1)
        return ts, world, obs_dict, stats, per_robot

    train = jax.jit(iteration, donate_argnums=())
    csv_path = os.path.join(run_dir, "metrics.csv")
    keys = None
    t0 = time.time()
    for it in range(args.iterations):
        ts, world, obs_dict, stats, per_robot = train(ts, world, obs_dict)
        if it % args.log_freq == 0 or it == args.iterations - 1:
            stats = jax.device_get(stats)
            pr = np.asarray(jax.device_get(per_robot))
            row = {"iteration": it,
                   "wall_s": round(time.time() - t0, 1),
                   "mean_step_reward": float(stats["mean_step_reward"]),
                   "ep_rew_total": float(
                       np.asarray(stats["episode_reward_sums"])[-1]),
                   "value_loss": float(stats["value_loss"]),
                   "adaptation_loss": float(stats["adaptation_loss"])}
            for r, name in enumerate(robots):
                row[f"rew_{name}"] = float(pr[r])
            if keys is None:
                keys = list(row.keys())
                with open(csv_path, "w", newline="") as f:
                    csv.DictWriter(f, keys).writeheader()
            with open(csv_path, "a", newline="") as f:
                csv.DictWriter(f, keys).writerow(row)
            print(f"it {it:5d} | rew {row['mean_step_reward']:.4f} | " +
                  " ".join(f"{n} {row[f'rew_{n}']:.4f}" for n in robots) +
                  f" | ep_rew {row['ep_rew_total']:.2f}")
    import pickle
    with open(os.path.join(run_dir, "state_last.pkl"), "wb") as f:
        pickle.dump({"ts": jax.device_get(ts), "cfg": cfg,
                     "robots": robots}, f)
    print(f"done: {args.iterations} iterations in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
