#!/usr/bin/env python
"""Train a quadruped locomotion policy.

The CLI analog of the reference's per-robot train scripts
(scripts/{go1,go2,b1}/train.py) — one script, robot/task presets instead of
190-line config-mutation blocks:

    python scripts/train.py --preset go1_flat --num-envs 1024 --iterations 500
    python scripts/train.py --preset go1_mob  --num-envs 4000 --iterations 100000
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="go1_flat",
                    choices=["go1_flat", "go1_mob", "go2_flat", "go2_mob",
                             "b1_flat", "b1_mob", "mini_cheetah_flat"])
    ap.add_argument("--num-envs", type=int, default=None)
    ap.add_argument("--iterations", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("--resume", default=None, help="checkpoint .pkl to resume")
    ap.add_argument("--log-freq", type=int, default=10)
    ap.add_argument("--control", default=None, choices=["P", "actuator_net"],
                    help="override control type")
    ap.add_argument("--actuator-model-wrapper", action="store_true",
                    help="wrap the env with the Go2 actuator model "
                         "(delay/friction/LPF, the ActuatorModelWrapper "
                         "analog)")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="config override, e.g. --set rewards.sigma_rew_neg"
                         "=0.02 --set ppo.learning_rate=5e-4 --set "
                         "runner.save_interval=1000 (Hydra-override analog, "
                         "cfg/config.yaml:61-65)")
    ap.add_argument("--save-interval", type=int, default=400)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (e.g. to smoke-train while "
                         "the TPU is held by another run)")
    ap.add_argument("--algo", default="ppo_cse", choices=["ppo_cse", "rma"],
                    help="rma = the reference's go1_gym_learn/ppo/ teacher-"
                         "student RMA variant (env-factor encoder)")
    ap.add_argument("--pbt", type=int, default=0, metavar="N",
                    help="population-based training with N members "
                         "(vmapped population; exceeds the reference's "
                         "disabled PBT hook)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import wtw_tpu; wtw_tpu.enable_compilation_cache()
    from wtw_tpu import config as C
    from wtw_tpu.envs import make_legged_env
    from wtw_tpu.learn import PPOArgs, Runner, RunnerArgs
    from wtw_tpu.models import load_robot

    cfg = C.PRESETS[args.preset]()
    if args.num_envs:
        cfg = dataclasses.replace(
            cfg, env=dataclasses.replace(cfg.env, num_envs=args.num_envs))
    if args.control:
        cfg = dataclasses.replace(
            cfg, control=dataclasses.replace(cfg.control,
                                             control_type=args.control))
    # route --set overrides: 'ppo.*' -> PPOArgs, 'runner.*' -> RunnerArgs,
    # 'ac.*' -> ACArgs (e.g. ac.compute_dtype=bfloat16), rest -> the Cfg tree
    from wtw_tpu.models.actor_critic import ACArgs
    ppo_args = PPOArgs()
    cfg_sets = [s for s in args.set
                if not s.startswith(("ppo.", "runner.", "ac."))]
    ppo_sets = [s[len("ppo."):] for s in args.set if s.startswith("ppo.")]
    run_sets = [s[len("runner."):] for s in args.set
                if s.startswith("runner.")]
    ac_sets = [s[len("ac."):] for s in args.set if s.startswith("ac.")]
    cfg = C.apply_overrides(cfg, cfg_sets)
    ppo_args = C.apply_overrides(ppo_args, ppo_sets)
    ac_args = C.apply_overrides(ACArgs(), ac_sets)

    robot = cfg.asset.robot
    env = make_legged_env(cfg, seed=args.seed)
    if args.actuator_model_wrapper:
        from wtw_tpu.envs.wrappers import ActuatorModelWrapper
        env = ActuatorModelWrapper(env)
    run_dir = args.run_dir or f"runs/{args.preset}/seed{args.seed}"
    print(f"preset={args.preset} robot={robot} envs={cfg.env.num_envs} "
          f"obs={cfg.env.num_observations} algo={args.algo}"
          f"{f' pbt={args.pbt}' if args.pbt else ''} -> {run_dir}")

    if args.pbt:
        from wtw_tpu.learn.pbt import PBTArgs, train_pbt
        train_pbt(env, ppo_args, PBTArgs(population=args.pbt),
                  args.iterations, seed=args.seed, log_freq=args.log_freq)
        return

    if args.algo == "rma":
        import pickle
        import jax
        from wtw_tpu.learn import ppo_rma
        key = jax.random.PRNGKey(args.seed)
        k_env, k_train = jax.random.split(key)
        world = env.init_state(k_env)
        world, obs_dict = env.get_observations(world)
        ts = ppo_rma.init_train_state(k_train, env, ppo_args)
        train = jax.jit(ppo_rma.make_train_fn(env, ppo_args))
        os.makedirs(run_dir, exist_ok=True)
        for it in range(args.iterations):
            ts, world, obs_dict, stats = train(ts, world, obs_dict)
            if it % args.log_freq == 0 or it == args.iterations - 1:
                print(f"it {it:6d} | rew {float(stats['mean_step_reward']):.4f}"
                      f" | vloss {float(stats['value_loss']):.4f}"
                      f" | adapt {float(stats['adaptation_loss']):.5f}")
        with open(os.path.join(run_dir, "rma_state.pkl"), "wb") as f:
            pickle.dump(jax.device_get(ts), f)
        return

    runner_args = C.apply_overrides(
        RunnerArgs(run_dir=run_dir, log_freq=args.log_freq,
                   save_interval=args.save_interval,
                   resume=args.resume is not None,
                   resume_path=args.resume), run_sets)
    runner = Runner(env, args=ppo_args, runner_args=runner_args,
                    ac_args=ac_args, seed=args.seed)
    runner.learn(args.iterations)


if __name__ == "__main__":
    main()
