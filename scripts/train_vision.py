#!/usr/bin/env python
"""Two-stage vision distillation (the reference's DDPG demos pipeline):

1. generate demos from a trained parkour PPO checkpoint
   (algos/DDPG_demos_generate.py analog):
     python scripts/train_vision.py generate --checkpoint runs/.../state_last.pkl \
         --steps 512 --out runs/demos.pkl
2. train the recurrent depth-vision student against those demos
   (algos/DDPG_demos_rnn_vision.py analog):
     python scripts/train_vision.py train --demos runs/demos.pkl \
         --env-steps 100000
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_env(num_envs, seed, terrain="mixed", easy_mode=False,
              overrides=()):
    import wtw_tpu; wtw_tpu.enable_compilation_cache()
    from wtw_tpu.envs.parkour_env import ParkourCfg, ParkourEnv
    from wtw_tpu.models import load_robot
    from wtw_tpu.config import apply_overrides
    from wtw_tpu.terrain import ParkourTerrainCfg
    from train_parkour import TERRAIN_PRESETS
    cfg = ParkourCfg(num_envs=num_envs,
                     terrain=ParkourTerrainCfg(
                         proportions=TERRAIN_PRESETS[terrain],
                         easy_mode=easy_mode))
    cfg = apply_overrides(cfg, overrides)
    return ParkourEnv(cfg, load_robot(cfg.robot), seed=seed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["generate", "train", "eval"])
    ap.add_argument("--student", default=None,
                    help="eval: vision_student.pkl from the train stage")
    ap.add_argument("--checkpoint", default=None,
                    help="parkour cat_ppo state_*.pkl for the expert")
    ap.add_argument("--demos", default=None, help="demo buffer .pkl")
    ap.add_argument("--num-envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=512,
                    help="generate: env steps of demos to record")
    ap.add_argument("--env-steps", type=int, default=100_000)
    ap.add_argument("--ring-steps", type=int, default=256,
                    help="online replay ring length in env steps (train "
                         "mode; 512 steps x 1024 envs of ring + demo "
                         "buffer + update temps OOM a 16 GB chip)")
    ap.add_argument("--actor-delay", type=int, default=None,
                    help="env steps to hold actor updates after a BC warm "
                         "start (default: DDPGArgs.actor_delay_env_steps, "
                         "capped at 12.5%% of --env-steps)")
    ap.add_argument("--bc-steps", type=int, default=0,
                    help="behavior-cloning warm-start batches on the demo "
                         "buffer before the DDPG phase (deviation, see "
                         "ddpg_demos.bc_update)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="runs/vision")
    ap.add_argument("--terrain", default="mixed",
                    help="terrain preset (must match the expert's training "
                         "terrain so obs statistics line up)")
    ap.add_argument("--easy-mode", action="store_true")
    ap.add_argument("--set", action="append", default=[],
                    metavar="FIELD=VALUE",
                    help="cfg overrides, e.g. --set only_forwards=true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU free)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from wtw_tpu.learn import ddpg_demos as D
    from wtw_tpu.learn.cat_ppo import get_action_mean, rms_norm

    env = build_env(args.num_envs, args.seed, terrain=args.terrain,
                    easy_mode=args.easy_mode, overrides=args.set)
    # keep the post-BC actor hold proportionate to the run: the 65536-step
    # default would consume most of a short DDPG phase
    delay = (args.actor_delay if args.actor_delay is not None else
             min(D.DDPGArgs.actor_delay_env_steps, args.env_steps // 8))
    # generate mode records args.steps steps, so its buffer must hold them
    # all; train mode's online ring is independently sized (--ring-steps)
    ring = max(args.steps, 64) if args.mode == "generate" \
        else max(args.ring_steps, 64)
    ddpg_args = D.DDPGArgs(buffer_steps=ring,
                           actor_delay_env_steps=delay)

    if args.mode == "generate":
        if args.checkpoint:
            opener = (__import__("gzip").open
                      if args.checkpoint.endswith(".gz") else open)
            with opener(args.checkpoint, "rb") as f:
                blob = pickle.load(f)
            ts = jax.tree.map(jnp.asarray, blob["ts"])

            def expert(obs):
                return get_action_mean(ts.params, rms_norm(ts.obs_rms, obs))
        else:
            print("WARNING: no --checkpoint, recording a zero-action expert")
            expert = lambda obs: jnp.zeros((env.num_envs, env.num_actions))
        buf = D.generate_demos(expert, env, args.steps,
                               jax.random.PRNGKey(args.seed), ddpg_args)
        out = args.demos or os.path.join(args.out, "rb_demos.pkl")
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "wb") as f:
            pickle.dump(jax.device_get(buf), f)
        print(f"demo buffer ({int(buf.filled)} steps x {env.num_envs} envs) "
              f"-> {out}")
    elif args.mode == "eval":
        # roll the depth student (or, with --checkpoint, the proprioceptive
        # expert) and report the parkour success metrics: mean episode
        # length, per-step velocity reward, and track-crossing rate
        # (dist > 0.8 track_length at termination — the promotion criterion,
        # go2_parkour.py:1158-1186)
        import json

        import numpy as np

        from wtw_tpu.envs.depth import DepthCameraCfg, make_depth_fn

        if args.student:
            with open(args.student, "rb") as f:
                sp = jax.tree.map(jnp.asarray, pickle.load(f))
            render = make_depth_fn(
                env.hf, DepthCameraCfg(height=ddpg_args.vis_hw,
                                       width=ddpg_args.vis_hw),
                model=env.model)

            @jax.jit
            def step_fn(world, obs, hidden, vlat, step):
                vobs = render(world.env.phys.base_pos,
                              world.env.phys.base_quat,
                              world.env.phys.joint_q)
                vlat = jnp.where(
                    step % ddpg_args.vision_update_interval == 0,
                    D.vision_apply(sp["vision"], vobs), vlat)
                proprio = obs[:, :ddpg_args.proprio_dim]
                acts, hidden = D.actor_apply(sp["actor"], proprio, vlat,
                                             hidden, ddpg_args)
                world, obs, rew, done, info = env.step(world, acts)
                td = info["true_dones"].astype(jnp.float32)
                hidden = hidden * (1.0 - td)[:, None]
                return (world, obs, hidden, vlat, rew, td,
                        info["dist_at_done"], info["episode_len_at_reset"])
        else:
            assert args.checkpoint, "--student or --checkpoint required"
            opener = (__import__("gzip").open
                      if args.checkpoint.endswith(".gz") else open)
            with opener(args.checkpoint, "rb") as f:
                blob = pickle.load(f)
            ts = jax.tree.map(jnp.asarray, blob["ts"])

            @jax.jit
            def step_fn(world, obs, hidden, vlat, step):
                acts = get_action_mean(ts.params, rms_norm(ts.obs_rms, obs))
                world, obs, rew, done, info = env.step(world, acts)
                td = info["true_dones"].astype(jnp.float32)
                return (world, obs, hidden, vlat, rew, td,
                        info["dist_at_done"], info["episode_len_at_reset"])

        world = env.init_state(jax.random.PRNGKey(args.seed))
        obs = env.get_observations(world)
        N = env.num_envs
        hidden = jnp.zeros((N, ddpg_args.rnn_hidden))
        vlat = jnp.zeros((N, ddpg_args.vision_latent))
        n_done = n_cross = done_len = 0.0
        rews = []
        for step in range(args.steps):
            world, obs, hidden, vlat, rew, td, dist, eplen = step_fn(
                world, obs, hidden, vlat, step)
            td, dist = np.asarray(td), np.asarray(dist)
            n_done += td.sum()
            # dist is the post-step, pre-reset distance at termination
            n_cross += (td * (dist > 0.8 * env.track_length)).sum()
            done_len += float(eplen)
            rews.append(float(jnp.mean(rew)))
        out = {
            "policy": "student" if args.student else "expert",
            "num_envs": N, "steps": args.steps,
            "mean_step_reward": round(float(np.mean(rews)), 4),
            # over COMPLETED episodes only; censored (still-alive) episodes
            # are reported separately rather than biasing the mean
            "mean_episode_len_s": round(
                float(done_len / max(n_done, 1) * env.dt), 2),
            "episodes": int(n_done),
            "censored_episodes": int(N),
            "track_cross_rate": round(float(n_cross / max(n_done, 1)), 4),
        }
        print(json.dumps(out))
    else:
        assert args.demos, "--demos required for train"
        with open(args.demos, "rb") as f:
            # bf16 storage for the wide f32 fields: two resident buffers
            # (demos + online ring) OOM a 16 GB chip at 1024 envs otherwise
            demos = D.buffer_astype(
                jax.tree.map(jnp.asarray, pickle.load(f)))
        ts, rb = D.train_vision_student(
            env, demos, total_env_steps=args.env_steps,
            key=jax.random.PRNGKey(args.seed), args=ddpg_args,
            bc_batches=args.bc_steps)
        os.makedirs(args.out, exist_ok=True)
        out = os.path.join(args.out, "vision_student.pkl")
        with open(out, "wb") as f:
            pickle.dump({"actor": jax.device_get(ts.actor),
                         "vision": jax.device_get(ts.vision)}, f)
        print(f"vision student -> {out}")


if __name__ == "__main__":
    main()
