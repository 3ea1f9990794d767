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
    ap.add_argument("mode", choices=["generate", "train"])
    ap.add_argument("--checkpoint", default=None,
                    help="parkour cat_ppo state_*.pkl for the expert")
    ap.add_argument("--demos", default=None, help="demo buffer .pkl")
    ap.add_argument("--num-envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=512,
                    help="generate: env steps of demos to record")
    ap.add_argument("--env-steps", type=int, default=100_000)
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
    ddpg_args = D.DDPGArgs(buffer_steps=max(args.steps, 64))

    if args.mode == "generate":
        if args.checkpoint:
            with open(args.checkpoint, "rb") as f:
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
    else:
        assert args.demos, "--demos required for train"
        with open(args.demos, "rb") as f:
            demos = jax.tree.map(jnp.asarray, pickle.load(f))
        ts, rb = D.train_vision_student(
            env, demos, total_env_steps=args.env_steps,
            key=jax.random.PRNGKey(args.seed), args=ddpg_args)
        os.makedirs(args.out, exist_ok=True)
        out = os.path.join(args.out, "vision_student.pkl")
        with open(out, "wb") as f:
            pickle.dump({"actor": jax.device_get(ts.actor),
                         "vision": jax.device_get(ts.vision)}, f)
        print(f"vision student -> {out}")


if __name__ == "__main__":
    main()
