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
    ap.add_argument("--obedience", action="store_true",
                    help="sweep the non-gait command dims (body height/pitch, "
                         "footswing height, stance width/length, vy, yaw "
                         "rate) and report realized vs commanded")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from wtw_tpu.envs import make_legged_env
    from wtw_tpu.learn.eval_metrics import METRICS_FNS, classify_contacts
    from wtw_tpu.models import actor_critic as ac

    opener = (__import__("gzip").open if args.checkpoint.endswith(".gz")
              else open)
    with opener(args.checkpoint, "rb") as f:
        blob = pickle.load(f)
    cfg = blob["cfg"]
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(
        cfg.env, num_envs=args.num_envs, num_eval_envs=0))
    # eval protocol parity: DR off except actuator lag, like the
    # reference's play-time evals (scripts/go1/play.py:49-72)
    cfg = dataclasses.replace(cfg, domain_rand=dataclasses.replace(
        cfg.domain_rand,
        randomize_friction=False, randomize_restitution=False,
        randomize_base_mass=False, randomize_com_displacement=False,
        randomize_motor_strength=False, randomize_motor_offset=False,
        randomize_Kp_factor=False, randomize_Kd_factor=False,
        randomize_gravity=False, randomize_lag_timesteps=True))
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
        # stance length must sit INSIDE the training range [0.35, 0.45]
        # (scripts/go1/train.py:166): leaving it 0.0 feeds the policy an
        # out-of-distribution command and measurably degrades tracking
        c[13] = 0.40
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

    if args.obedience:
        # ------------------------------------------------------------------
        # Command-obedience sweep over the non-gait dims of the 15-dim MoB
        # command space (limits: /root/reference/scripts/go1/train.py:153-182;
        # layout: legged_robot.py:710-824). Roll (dim 11), duration (dim 8)
        # and the aux reward coef (dim 14) have degenerate reference ranges
        # ([-0,0], [0.5,0.5], unused) and are reported as fixed.
        # ------------------------------------------------------------------
        from wtw_tpu.physics.engine import fk
        from wtw_tpu.utils import quat as qu

        model = env.model
        base_h = cfg.rewards.base_height_target

        @jax.jit
        def rollout_traces(cmd):
            key = jax.random.PRNGKey(args.seed)
            world0 = env.init_state(key)
            cmds = jnp.broadcast_to(cmd, world0.env.commands.shape)
            world0 = world0.replace(env=world0.env.replace(commands=cmds))
            world0, obs0 = env.get_observations(world0)

            def step(carry, _):
                world, obs = carry
                world, obs, rew, done, info = env.step(world, policy(obs))
                world = world.replace(env=world.env.replace(commands=cmds))
                phys = world.env.phys

                def feet_of(bp, bq, q):
                    body_pos, body_quat, _, _ = fk(model, bp, bq, q)
                    feet_R = qu.quat_to_matrix(body_quat[model.feet_body])
                    return body_pos[model.feet_body] + jnp.einsum(
                        "lij,lj->li", feet_R, model.feet_pos)

                feet_w = jax.vmap(feet_of)(phys.base_pos, phys.base_quat,
                                           phys.joint_q)
                # yaw-frame foot positions relative to base (the raibert
                # frame, corl_rewards.py:161-202)
                rel = feet_w - phys.base_pos[:, None, :]
                qc = qu.quat_conjugate(phys.base_quat)
                feet_b = jax.vmap(lambda q, r: qu.quat_apply_yaw(
                    jnp.broadcast_to(q, (4, 4)), r))(qc, rel)
                roll, pitch, _ = jax.vmap(qu.quat_to_euler_xyz)(phys.base_quat)
                vel_b = jax.vmap(qu.quat_rotate_inverse)(phys.base_quat,
                                                         phys.base_lin_vel)
                tr = {
                    "base_z": phys.base_pos[:, 2],
                    "roll": roll, "pitch": pitch,
                    "vx": vel_b[:, 0], "vy": vel_b[:, 1],
                    "wz": phys.base_ang_vel[:, 2],
                    "foot_z": feet_w[..., 2],
                    "foot_xy": feet_b[..., :2],
                    "contact": world.env.last_contacts,
                }
                return (world, obs), tr

            _, traces = jax.lax.scan(step, (world0, obs0), None,
                                     length=args.steps)
            return traces

        # shared, unit-tested estimators (validated against scripted-gait
        # ground truth in tests/test_utils.py::TestObedienceEstimators)
        from wtw_tpu.learn.eval_metrics import obedience_stats as stats

        # (dim, label, values, target_fn, realized_key)
        sweeps = [
            (3, "body_height", [-0.15, 0.0, 0.10],
             lambda v: base_h + v, "base_z"),
            # desired pitch resolved through the reward's own convention:
            # orientation_control builds the desired base quat from
            # -pitch_cmd about +y (corl_rewards.py:148-159), so the euler
            # pitch it drives toward is euler(quat(-cmd, y)).
            (10, "body_pitch", [-0.3, 0.0, 0.3],
             lambda v: float(qu.quat_to_euler_xyz(qu.quat_from_angle_axis(
                 jnp.float32(-v), jnp.array([0.0, 1.0, 0.0])))[1]), "pitch"),
            (9, "footswing_height", [0.06, 0.15, 0.30],
             lambda v: v + 0.02, "foot_apex"),
            (12, "stance_width", [0.15, 0.25, 0.40],
             lambda v: v, "stance_width"),
            (13, "stance_length", [0.35, 0.45], lambda v: v, "stance_length"),
            (1, "vy", [-0.4, 0.4], lambda v: v, "vy"),
            (2, "yaw_rate", [-0.8, 0.8], lambda v: v, "wz"),
        ]
        rows = []
        for dim, label, values, target_fn, key in sweeps:
            for v in values:
                cmd = command_vec("trot", 3.0)
                cmd[dim] = v
                tr = rollout_traces(jnp.asarray(cmd))
                st = stats(tr)
                target = float(target_fn(v))
                realized = st[key]
                rows.append({
                    "iteration": it, "dim": dim, "command": label,
                    "value": round(v, 3), "target": round(target, 3),
                    "realized": round(realized, 4),
                    "err": round(realized - target, 4),
                    "vx_err": round(st["vx"] - args.vx, 3),
                })
                print(json.dumps(rows[-1]))
        fixed = {"gait_duration(8)": 0.5, "body_roll(11)": 0.0,
                 "aux_reward_coef(14)": 0.0}
        result = {"checkpoint": args.checkpoint, "iteration": it,
                  "obedience": rows, "fixed_reference_dims": fixed}
        print(json.dumps({"iteration": it, "n_cases": len(rows)}))
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(result) + "\n")
        return

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
