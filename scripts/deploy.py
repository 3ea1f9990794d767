#!/usr/bin/env python
"""Deploy a trained policy on the real robot (or the C++ sim bridge).

The analog of go1_gym_deploy/scripts/deploy_policy.py:1-74. The on-robot
C++ bridge (cpp/lcm_position_bridge) must be running; for a dry run without
hardware start it with --sim:

    ./cpp/lcm_position_bridge --sim &
    python scripts/deploy.py --policy runs/go1_mob/seed0/checkpoints/policy_last.npz

Control flow: R2 to stand up, R2 again to stop (dead-man gating,
deployment_runner.py:111-115).

B1 deployment: the reference's B1 path (deploy_policy.py:13-14,70-74)
drives the 55 kg B1 through the external B1Py LCM bridge instead of the
Go1 SDK bridge. B1Py is an out-of-repo dependency; the integration here is
schema-level: run this script with `--preset b1_mob` (b1 kp/kd and joint
defaults come from the preset) against a bridge that speaks the same four
LCM channels (state_estimator_data, leg_control_data, rc_command,
pd_plustau_targets — wtw_tpu/deploy/lcm_types.py). cpp/lcm_position_bridge
--sim emulates that contract for HIL testing; on real B1 hardware, point
B1Py's LCM relay at the same multicast addr/port.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", required=True, help="policy_*.npz export")
    ap.add_argument("--preset", default="go1_mob")
    ap.add_argument("--addr", default="239.255.76.67")
    ap.add_argument("--port", type=int, default=7667)
    ap.add_argument("--max-vel", type=float, default=1.0)
    ap.add_argument("--max-yaw-vel", type=float, default=1.0)
    ap.add_argument("--no-wait", action="store_true",
                    help="skip the R2 gate (sim bridge testing)")
    ap.add_argument("--max-steps", type=int, default=10_000_000,
                    help="policy steps before exiting (HIL sessions)")
    ap.add_argument("--trace", default=None,
                    help="write a per-step jsonl HIL session log "
                         "(commands/actions/joint state) to this path")
    args = ap.parse_args()

    from wtw_tpu.config import PRESETS
    from wtw_tpu.deploy import (LCM, DeployedPolicy, DeploymentRunner,
                                LCMAgent, RCControllerProfile, StateEstimator)

    cfg = PRESETS[args.preset]()
    lc = LCM(addr=(args.addr, args.port))
    se = StateEstimator(lc)
    se.spin()
    profile = RCControllerProfile(dt=cfg.control.decimation * cfg.sim.dt,
                                  state_estimator=se,
                                  x_scale=args.max_vel, y_scale=0.6,
                                  yaw_scale=args.max_yaw_vel)
    default_q = np.array([a for _, a in cfg.init_state.default_joint_angles])
    agent = LCMAgent(cfg, lc, se, profile, default_joint_angles=default_q)
    policy = DeployedPolicy(args.policy)
    runner = DeploymentRunner(agent, policy, se,
                              num_obs_history=cfg.env.num_observation_history)
    if args.no_wait:
        se.right_lower_right_switch_pressed = True
    trace = [] if args.trace else None
    try:
        runner.run(max_steps=args.max_steps, trace=trace)
    finally:
        se.close()
        if trace:
            import json
            with open(args.trace, "w") as f:
                for row in trace:
                    f.write(json.dumps(row) + "\n")
            hz = ((len(trace) - 1) / max(trace[-1]["t"] - trace[0]["t"], 1e-9)
                  if len(trace) > 1 else 0.0)
            print(f"trace: {len(trace)} steps -> {args.trace} "
                  f"| achieved {hz:.1f} Hz")


if __name__ == "__main__":
    main()
