#!/usr/bin/env python
"""Train a Go2 parkour/rough-terrain policy with Constraints-as-Terminations.

The CLI analog of the reference's Hydra entry point
(newtrain.py task=Go2Parkour train=SoloTerrainPPO):

    python scripts/train_parkour.py --num-envs 4096 --iterations 8000
    python scripts/train_parkour.py --terrain jump --easy-mode
"""
import argparse
import csv
import dataclasses
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TERRAIN_PRESETS = {
    # mirrors the proportions blocks in cfg/task/Go2Parkour.yaml:38-52
    "mixed": (("gap_parkour", 0.2), ("jump_parkour", 0.2),
              ("stairs_parkour", 0.2), ("hurdle_parkour", 0.2),
              ("crawl_parkour", 0.2), ("random_uniform", 0.0), ("flat", 0.0)),
    "jump": (("gap_parkour", 0.0), ("jump_parkour", 1.0),
             ("stairs_parkour", 0.0), ("hurdle_parkour", 0.0),
             ("crawl_parkour", 0.0), ("random_uniform", 0.0), ("flat", 0.0)),
    "gap": (("gap_parkour", 1.0), ("jump_parkour", 0.0),
            ("stairs_parkour", 0.0), ("hurdle_parkour", 0.0),
            ("crawl_parkour", 0.0), ("random_uniform", 0.0), ("flat", 0.0)),
    "flat": (("gap_parkour", 0.0), ("jump_parkour", 0.0),
             ("stairs_parkour", 0.0), ("hurdle_parkour", 0.0),
             ("crawl_parkour", 0.0), ("random_uniform", 0.0), ("flat", 1.0)),
    "stairs": (("gap_parkour", 0.0), ("jump_parkour", 0.0),
               ("stairs_parkour", 1.0), ("hurdle_parkour", 0.0),
               ("crawl_parkour", 0.0), ("random_uniform", 0.0), ("flat", 0.0)),
    "hurdle": (("gap_parkour", 0.0), ("jump_parkour", 0.0),
               ("stairs_parkour", 0.0), ("hurdle_parkour", 1.0),
               ("crawl_parkour", 0.0), ("random_uniform", 0.0), ("flat", 0.0)),
    "crawl": (("gap_parkour", 0.0), ("jump_parkour", 0.0),
              ("stairs_parkour", 0.0), ("hurdle_parkour", 0.0),
              ("crawl_parkour", 1.0), ("random_uniform", 0.0), ("flat", 0.0)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--iterations", type=int, default=8000)
    ap.add_argument("--anneal-iterations", type=int, default=None,
                    help="LR-anneal horizon in GLOBAL iterations. For "
                         "chunked runs (chunk_train.sh) set this to the "
                         "total run length; defaults to --iterations, which "
                         "is only correct for single-session runs")
    ap.add_argument("--horizon", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--terrain", default="mixed", choices=TERRAIN_PRESETS)
    ap.add_argument("--task", default="parkour",
                    choices=["parkour", "terrain"],
                    help="Go2Parkour or Go2Terrain (rough terrain + gait "
                         "clock + actuator net + full rewards)")
    ap.add_argument("--algo", default="ppo",
                    choices=["ppo", "ppo_plus", "ppornn"],
                    help="newtrain.py algo dispatch analog (:97-118)")
    ap.add_argument("--reward-mode", default=None, choices=["cat", "full"])
    ap.add_argument("--easy-mode", action="store_true")
    ap.add_argument("--soft-start", action="store_true",
                    help="soft-start terrain curriculum: trivial level-0 "
                         "obstacles ramping to FULL reference geometry at "
                         "the top rows (see ParkourTerrainCfg.soft_start)")
    ap.add_argument("--std-floor", type=float, default=0.0,
                    help="exploration std floor for the policy (0 = "
                         "reference-exact free logstd)")
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("--log-freq", type=int, default=10)
    ap.add_argument("--save-interval", type=int, default=400)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="ParkourCfg override, e.g. --set only_forwards=true"
                         " --set terrain.num_levels=6")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (e.g. smoke-test while the "
                         "TPU is held by another run)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import wtw_tpu; wtw_tpu.enable_compilation_cache()
    from wtw_tpu.envs.parkour_env import ParkourCfg, ParkourEnv
    from wtw_tpu.learn.cat_ppo import (CatPPOArgs, init_train_state,
                                       make_train_fn, rms_norm, rms_update)
    from wtw_tpu.models import load_robot
    from wtw_tpu.terrain import ParkourTerrainCfg

    extra = {}
    if args.task == "terrain":
        # Go2Terrain defaults (cfg/task/Go2Terrain.yaml): gait clock on,
        # actuator net on, CaT with tracking reward by default
        extra = dict(task="terrain", use_gait_clocks=True,
                     observe_clock_inputs=True, use_actuator_net=True)
    if args.reward_mode:
        extra["reward_mode"] = args.reward_mode
    cfg = ParkourCfg(
        num_envs=args.num_envs,
        # soft_p ramps on the persistent common_step, so chunked runs must
        # use the GLOBAL horizon or the constraint curriculum saturates
        # after the first chunk
        soft_p_total_steps=args.horizon * (args.anneal_iterations
                                           or args.iterations),
        terrain=ParkourTerrainCfg(
            proportions=TERRAIN_PRESETS[args.terrain],
            easy_mode=args.easy_mode, soft_start=args.soft_start), **extra)
    from wtw_tpu.config import apply_overrides
    cfg = apply_overrides(cfg, args.set)
    env = ParkourEnv(cfg, load_robot(cfg.robot), seed=args.seed)
    anneal_iters = args.anneal_iterations or args.iterations
    if args.algo == "ppo_plus":
        from wtw_tpu.learn import cat_ppo_plus as algo_mod
        ppo = algo_mod.PPOPlusArgs(num_steps=args.horizon,
                                   num_iterations=anneal_iters)
    elif args.algo == "ppornn":
        from wtw_tpu.learn import cat_ppornn as algo_mod
        ppo = algo_mod.RNNArgs(num_steps=args.horizon,
                               num_iterations=anneal_iters)
    else:
        algo_mod = None
        ppo = CatPPOArgs(num_steps=args.horizon,
                         num_iterations=anneal_iters,
                         std_floor=args.std_floor)

    run_dir = args.run_dir or f"runs/parkour_{args.terrain}/seed{args.seed}"
    os.makedirs(run_dir, exist_ok=True)
    print(f"parkour terrain={args.terrain} envs={args.num_envs} "
          f"obs={env.num_obs} -> {run_dir}")

    init_fn = (algo_mod.init_train_state if algo_mod is not None
               else init_train_state)
    train_fn_factory = (algo_mod.make_train_fn if algo_mod is not None
                        else make_train_fn)
    world = env.init_state(jax.random.PRNGKey(args.seed))
    ts = init_fn(jax.random.PRNGKey(args.seed + 1), env, ppo)
    obs = env.get_observations(world)
    ts = ts.replace(obs_rms=rms_update(ts.obs_rms, obs))
    obs_n = rms_norm(ts.obs_rms, obs)
    it0 = 0
    if args.resume:
        opener = (__import__("gzip").open if args.resume.endswith(".gz")
                  else open)
        with opener(args.resume, "rb") as f:
            blob = pickle.load(f)
        to_dev = lambda t: jax.tree.map(jnp.asarray, t)
        if blob.get("slim"):
            # slim checkpoint (tools/slim_checkpoint.py): learner + CaT +
            # terrain levels survive; env arrays restart fresh at the
            # promoted levels
            ts = to_dev(blob["ts"])
            n = env.num_envs

            def fit_n(a):          # adapt per-env arrays to the new env count
                a = np.asarray(a)
                return jnp.asarray(np.resize(a, (n,) + a.shape[1:]))

            ts = ts.replace(next_done=jnp.zeros((n,), jnp.float32),
                            next_true_done=jnp.zeros((n,), jnp.float32))
            world = world.replace(
                cat=to_dev(blob["cat"]),
                soft_p_progress=jnp.asarray(blob["soft_p_progress"]),
                common_step=jnp.asarray(blob["common_step"]))
            world = env.restore_terrain_state(
                world, fit_n(blob["terrain_level"]),
                fit_n(blob["terrain_type"]))
            obs_n = rms_norm(ts.obs_rms, env.get_observations(world))
        else:
            ts, world, obs_n = (to_dev(blob["ts"]), to_dev(blob["world"]),
                                to_dev(blob["obs_n"]))
        # continue global iteration numbering across resume chunks so the
        # terrain-level curve in metrics.csv is one continuous series
        it0 = int(blob.get("iteration", 0))

    # per-track-type promotion stats: map terrain COLUMN -> generator kind
    # with the same cumulated-proportions walk build_parkour uses
    # (terrainParkour.py:24-33), so the monitor/CSV can show which track
    # type blocks promotion
    tcfg = cfg.terrain
    _keys, _cum, _tot = [], [], 0.0
    for _k, _v in tcfg.proportions:
        if _v != 0.0:
            _tot += float(_v)
            _keys.append(_k)
            _cum.append(round(_tot, 2))
    col_kinds = []
    for _j in range(tcfg.num_terrains):
        _c, _k = _j / tcfg.num_terrains, 0
        while _k < len(_cum) and _c >= _cum[_k]:
            _k += 1
        col_kinds.append(_keys[_k] if _k < len(_keys) else "flat")
    kind_cols = {}
    for _j, _k in enumerate(col_kinds):
        kind_cols.setdefault(_k.replace("_parkour", ""), []).append(_j)

    train = jax.jit(train_fn_factory(env, ppo))
    csv_path = os.path.join(run_dir, "metrics.csv")
    csv_keys = None
    steps_per_iter = ppo.num_steps * env.num_envs
    t_start = time.time()
    for it in range(it0, it0 + args.iterations):
        t0 = time.time()
        ts, world, obs_n, stats = train(ts, world, obs_n)
        if it % args.log_freq == 0 or it == it0 + args.iterations - 1:
            stats = jax.device_get(stats)
            row = {
                "iteration": it,
                "steps_per_s": steps_per_iter / (time.time() - t0),
                "wall_s": time.time() - t_start,
                "mean_step_reward": float(stats["mean_step_reward"]),
                "terrain_level": float(stats.get("terrain_level_mean", 0.0)),
                "mean_episode_length": float(
                    stats.get("mean_episode_length", 0.0)),
                "value_loss": float(stats["value_loss"]),
                "pg_loss": float(stats["pg_loss"]),
                "lr": float(stats["lr"]),
            }
            if len(kind_cols) > 1:
                lvl = np.asarray(jax.device_get(world.env.terrain_level))
                typ = np.asarray(jax.device_get(world.env.terrain_type))
                cross_t = np.asarray(stats.get("crossings_by_type", []))
                dones_t = np.asarray(stats.get("dones_by_type", []))
                for kind, cols in sorted(kind_cols.items()):
                    m = np.isin(typ, cols)
                    row[f"lvl_{kind}"] = (float(lvl[m].mean())
                                          if m.any() else -1.0)
                    if cross_t.size:
                        # promotion-rule crossings (>80% of the track at
                        # done) per kind, this log window's rollout
                        d = float(dones_t[cols].sum())
                        row[f"cross_{kind}"] = (
                            float(cross_t[cols].sum()) / d if d else 0.0)
            if "episode_sums" in stats:
                ep = np.asarray(stats["episode_sums"])
                row["ep_rew_lin_vel"] = float(ep[0])
                row["ep_rew_ang_vel"] = float(ep[1])
                for i, name in enumerate(env.cstr_names):
                    row[f"cstr_{name}"] = float(ep[2 + i])
            # only write the header once per FILE (resume chunks append)
            new = csv_keys is None and not (
                os.path.exists(csv_path) and os.path.getsize(csv_path) > 0)
            if csv_keys is None:
                csv_keys = list(row.keys())
            with open(csv_path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=csv_keys, extrasaction="ignore")
                if new:
                    w.writeheader()
                w.writerow(row)
            by_type = " ".join(
                f"{k[:2]}{row[f'lvl_{k}']:.1f}" for k in sorted(kind_cols)
                if f"lvl_{k}" in row) if len(kind_cols) > 1 else ""
            print(f"it {it:5d} | {row['steps_per_s']:.0f} steps/s | "
                  f"rew {row['mean_step_reward']:.3f} | "
                  f"lvl {row['terrain_level']:.2f} "
                  f"{by_type}| eplen {row['mean_episode_length']:.1f}s | "
                  f"vloss {row['value_loss']:.3f}")
        if args.save_interval and it > it0 and it % args.save_interval == 0:
            _save(run_dir, it, ts, world, obs_n, it + 1)
    _save(run_dir, "last", ts, world, obs_n, it0 + args.iterations)


def _save(run_dir, tag, ts, world, obs_n, iteration):
    import jax
    import pickle
    path = os.path.join(run_dir, f"state_{tag}.pkl")
    with open(path, "wb") as f:
        pickle.dump({"ts": jax.device_get(ts), "world": jax.device_get(world),
                     "obs_n": jax.device_get(obs_n),
                     "iteration": int(iteration)}, f)


if __name__ == "__main__":
    main()
