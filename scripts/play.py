#!/usr/bin/env python
"""Evaluate a trained checkpoint: command a trot and report metrics.

The analog of scripts/{go1,go2,b1}/play.py:89-157 (load checkpoint, command
1.5 m/s for 250 steps, report velocity tracking) + the eval_metrics DR
sweeps:

    python scripts/play.py --checkpoint runs/go1_flat/seed0/checkpoints/state_last.pkl
    python scripts/play.py --checkpoint ... --sweep rand_large
"""
import argparse
import dataclasses
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--preset", default="go1_flat")
    ap.add_argument("--num-envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--vx", type=float, default=1.5)
    ap.add_argument("--yaw", type=float, default=0.0)
    ap.add_argument("--sweep", default=None,
                    help="DR sweep preset (rand_regular, rand_large, ...)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gait", default="trot",
                    choices=["trot", "pace", "bound", "pronk"],
                    help="commanded gait for 15-dim MoB policies (phase/"
                         "offset/bound dims, scripts/go1/train.py command "
                         "space)")
    ap.add_argument("--freq", type=float, default=3.0,
                    help="commanded step frequency (Hz)")
    ap.add_argument("--footswing", type=float, default=0.08)
    ap.add_argument("--gait-stats", action="store_true",
                    help="measure duty factor / stride freq / trot phase")
    ap.add_argument("--video", default=None,
                    help="render a rollout video to this path")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (evaluate while the TPU is "
                         "held by a training run)")
    ap.add_argument("--interactive", action="store_true",
                    help="drive the policy live from the keyboard (the "
                         "joystick analog of tasks/go2_parkour.py:30-36): "
                         "WASD velocities, 1-4 gaits, see "
                         "wtw_tpu/utils/keyboard.py for the full map. "
                         "Scriptable headlessly: echo 'ww2' | play.py "
                         "--interactive --steps 200")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import wtw_tpu; wtw_tpu.enable_compilation_cache()
    from wtw_tpu.config import PRESETS
    from wtw_tpu.envs import make_legged_env
    from wtw_tpu.learn.eval_metrics import DR_SWEEPS, base_set, evaluate_policy
    from wtw_tpu.models import actor_critic as ac

    with open(args.checkpoint, "rb") as f:
        blob = pickle.load(f)
    if blob.get("cfg") is not None:
        # checkpoints written since round 2 carry the training config —
        # rebuild an obs-compatible env regardless of --preset
        cfg = blob["cfg"]
        cfg = dataclasses.replace(cfg, env=dataclasses.replace(
            cfg.env, num_envs=args.num_envs, num_eval_envs=0))
    else:
        cfg = PRESETS[args.preset](num_envs=args.num_envs)
    # eval protocol parity: the reference's play.py turns OFF every domain
    # randomization except actuator lag (scripts/go1/play.py:49-72) — r5
    # fix: evaluating under training DR inflated CoT/vx-RMSE (round-4/5
    # numbers in BASELINE.md predate this)
    cfg = dataclasses.replace(cfg, domain_rand=dataclasses.replace(
        cfg.domain_rand,
        randomize_friction=False, randomize_restitution=False,
        randomize_base_mass=False, randomize_com_displacement=False,
        randomize_motor_strength=False, randomize_motor_offset=False,
        randomize_Kp_factor=False, randomize_Kd_factor=False,
        randomize_gravity=False, randomize_lag_timesteps=True))
    if args.sweep:
        cfg = DR_SWEEPS[args.sweep](base_set(cfg))
    env = make_legged_env(cfg, seed=args.seed)
    params = jax.tree.map(jnp.asarray, blob["ts"].params)

    def policy(obs_dict):
        mean, _ = ac.act_student(params, obs_dict["obs_history"])
        return mean

    # command vector: vx, 0, yaw (+ gait defaults when 15-dim like
    # play.py:101-117: 3 Hz trot, 0.25 body height ...)
    nc = cfg.commands.num_commands
    commands = np.zeros(nc, np.float32)
    commands[0] = args.vx
    if nc > 2:
        commands[2] = args.yaw
    if nc >= 15:
        # (phase, offset, bound) per reference scripts/go1/play.py:102-105:
        # trotting=[.5,0,0], bounding=[0,.5,0], pacing=[0,0,.5]
        gait_cmd = {"trot": (0.5, 0.0, 0.0), "bound": (0.0, 0.5, 0.0),
                    "pace": (0.0, 0.0, 0.5), "pronk": (0.0, 0.0, 0.0)}
        commands[4] = args.freq                     # step frequency
        commands[5:8] = gait_cmd[args.gait]         # phase/offset/bound
        commands[8] = 0.5     # duration
        commands[9] = args.footswing                # footswing height
        commands[12] = 0.25   # stance width
        commands[13] = 0.40   # stance length (training range [0.35, 0.45];
        #                       0.0 would be out-of-distribution input)

    if args.interactive:
        # live keyboard-commanded rollout: one jitted policy step per frame,
        # commands re-pinned from the keyboard source every step
        import time

        from wtw_tpu.utils.keyboard import KeyboardCommandSource

        @jax.jit
        def step_once(world, obs, cmd):
            cmds = jnp.broadcast_to(cmd, world.env.commands.shape)
            world = world.replace(env=world.env.replace(commands=cmds))
            world, obs, rew, done, info = env.step(world, policy(obs))
            vel_b = world.env.phys.base_lin_vel
            return world, obs, (vel_b[:, 0].mean(), vel_b[:, 1].mean(),
                                world.env.phys.base_ang_vel[:, 2].mean(),
                                world.env.phys.base_pos[:, 2].mean())

        world = env.init_state(jax.random.PRNGKey(args.seed))
        world, obs = env.get_observations(world)
        src = KeyboardCommandSource(nc, vx=args.vx, freq=args.freq,
                                    footswing=args.footswing)
        src.cmd[:] = commands
        dt = env.dt
        with src:
            print("interactive: w/s vx  a/d vy  q/e yaw  1-4 gait  "
                  "z/x height  t/g pitch  f/h swing  space stop  ESC quit")
            for step in range(args.steps if args.steps > 0 else 10 ** 9):
                t0 = time.time()
                cmd = jnp.asarray(src.poll())
                if src.quit:
                    break
                world, obs, tele = step_once(world, obs, cmd)
                if step % 10 == 0:
                    vx, vy, wz, h = (float(x) for x in tele)
                    print(f"\r[{step:5d}] {src.status()} || realized "
                          f"vx {vx:+.2f} vy {vy:+.2f} yaw {wz:+.2f} "
                          f"h {h:.2f}   ", end="", flush=True)
                time.sleep(max(0.0, dt - (time.time() - t0)))
        print()
        return

    summary, traces = evaluate_policy(env, policy, steps=args.steps,
                                      seed=args.seed, commands=commands)
    summary["commanded_vx"] = args.vx
    if nc >= 15:
        summary["commanded_gait"] = args.gait
        summary["commanded_freq_hz"] = args.freq
    summary["sweep"] = args.sweep or "train-distribution"
    if args.gait_stats:
        from wtw_tpu.learn.eval_metrics import gait_stats
        summary["gait"] = gait_stats(env, policy, steps=args.steps,
                                     seed=args.seed, commands=commands)
    if args.video:
        from wtw_tpu.utils.video import record_rollout, render_trajectory
        traj = record_rollout(env, policy, steps=min(args.steps, 250),
                              seed=args.seed, commands=commands)
        summary["video"] = render_trajectory(traj, env.model, hf=env.hf,
                                             path=args.video)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
