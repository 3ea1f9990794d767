#!/usr/bin/env python
"""Commanded-gait differentiation sweep for a MoB checkpoint.

Runs the four gaits of the 15-dim command space (trot/pace/bound/pronk at
commanded frequency/duty — scripts/go1/train.py:83-205 command space) plus
a frequency sweep on the trot, and reports per-command realized gait
signatures. The flagship "walk these ways" acceptance check: each commanded
gait should dominate its own correlation axis and track the commanded
stride frequency.

    python scripts/eval_gaits.py --checkpoint runs/go1_mob_r2b/checkpoints/state_20000.pkl --cpu
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
    ap.add_argument("--num-envs", type=int, default=32)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--vx", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--freqs", default="2.0,3.0",
                    help="trot frequency sweep, comma-separated Hz")
    ap.add_argument("--out", default=None, help="append one JSON line here")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from wtw_tpu.envs import make_legged_env
    from wtw_tpu.learn.eval_metrics import METRICS_FNS, classify_contacts
    from wtw_tpu.models import actor_critic as ac

    with open(args.checkpoint, "rb") as f:
        blob = pickle.load(f)
    cfg = blob["cfg"]
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(
        cfg.env, num_envs=args.num_envs, num_eval_envs=0))
    env = make_legged_env(cfg, seed=args.seed)
    params = jax.tree.map(jnp.asarray, blob["ts"].params)
    it = int(getattr(blob["ts"], "iteration", 0))

    def policy(obs_dict):
        mean, _ = ac.act_student(params, obs_dict["obs_history"])
        return mean

    def command_vec(gait, freq):
        # (phase, offset, bound) per reference scripts/go1/play.py:102-105:
        # trotting=[.5,0,0], bounding=[0,.5,0], pacing=[0,0,.5]
        gait_cmd = {"trot": (0.5, 0.0, 0.0), "bound": (0.0, 0.5, 0.0),
                    "pace": (0.0, 0.0, 0.5), "pronk": (0.0, 0.0, 0.0)}
        c = np.zeros(cfg.commands.num_commands, np.float32)
        c[0] = args.vx
        c[4] = freq
        c[5:8] = gait_cmd[gait]
        c[8] = 0.5              # stance duration
        c[9] = 0.08             # footswing height
        c[12] = 0.25            # stance width
        return c

    # ONE jitted scan rollout shared by every commanded-gait case (commands
    # enter as a traced argument, so the 6 cases compile once)
    @jax.jit
    def rollout(cmd):
        key = jax.random.PRNGKey(args.seed)
        world0 = env.init_state(key)
        cmds = jnp.broadcast_to(cmd, world0.env.commands.shape)
        world0 = world0.replace(env=world0.env.replace(commands=cmds))
        world0, obs0 = env.get_observations(world0)

        def step(carry, _):
            world, obs = carry
            world, obs, rew, done, info = env.step(world, policy(obs))
            # re-pin the evaluation command after any resample/reset
            world = world.replace(env=world.env.replace(commands=cmds))
            vals = {name: fn(world) for name, fn in METRICS_FNS.items()}
            return (world, obs), (vals, world.env.last_contacts)

        _, (vals, contacts) = jax.lax.scan(step, (world0, obs0),
                                           None, length=args.steps)
        return vals, contacts

    rows = []
    cases = [(g, 3.0) for g in ("trot", "pace", "bound", "pronk")]
    cases += [("trot", float(f)) for f in args.freqs.split(",")
              if float(f) != 3.0]
    for gait, freq in cases:
        vals, contacts = jax.device_get(
            rollout(jnp.asarray(command_vec(gait, freq))))
        g = classify_contacts(contacts, env.dt)
        rows.append({
            "iteration": it, "cmd_gait": gait, "cmd_freq_hz": freq,
            "cmd_vx": args.vx,
            "vx_rmse": round(float(np.mean(
                np.asarray(vals["lin_vel_rmsd"]))), 4),
            "diag": round(g["diag_corr"], 3),
            "pair": round(g["pair_corr"], 3),
            "side": round(g["side_corr"], 3),
            "stride_hz": round(g["stride_freq_hz"], 2),
            "duty": round(float(np.mean(g["duty_factor"])), 3),
            "dominant": g["dominant_gait"],
            "match": g["dominant_gait"] == gait,
        })
        print(json.dumps(rows[-1]))

    n_match = sum(r["match"] for r in rows[:4])
    result = {"checkpoint": args.checkpoint, "iteration": it,
              "gaits_matched": f"{n_match}/4", "rows": rows}
    print(json.dumps({"iteration": it, "gaits_matched": f"{n_match}/4"}))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
