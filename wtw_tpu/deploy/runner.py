"""Deployment state machine: calibration, dead-man gating, emergency stop.

Re-design of go1_gym_deploy/utils/deployment_runner.py:1-222:
- calibrate(): slow interpolation from the current pose to the nominal
  standing pose, gated on the R2 switch (:65-122);
- run(): main policy loop with obs-history ring, button logging hooks, and
  emergency crouch when |roll| or |pitch| > 1.6 rad (:125-222).
"""
from __future__ import annotations

import time

import numpy as np


class DeploymentRunner:
    def __init__(self, agent, policy, state_estimator,
                 num_obs_history: int = 30, log_fn=print):
        self.agent = agent
        self.policy = policy
        self.se = state_estimator
        self.num_obs_history = num_obs_history
        self.log = log_fn
        self.obs_history = None

    # ------------------------------------------------------------------
    def calibrate(self, wait=True, low=False, max_steps=200):
        """Stand up (or crouch if low=True) by interpolating joint targets
        (:65-122). Returns when the pose is reached."""
        agent = self.agent
        self.log("Calibrating: waiting for R2 to stand up..." if wait
                 else "Calibrating...")
        while wait and not self.se.right_lower_right_switch_pressed:
            time.sleep(0.05)
        self.se.right_lower_right_switch_pressed = False

        if low:
            nominal = np.array([0.0, 1.4, -2.5] * 4)
        else:
            nominal = agent.default_dof_pos.copy()
        dof_pos = self.se.get_dof_pos()
        # 2 cm/step joint-space interpolation (:88-95)
        n_steps = max(1, int(np.max(np.abs(nominal - dof_pos)) / 0.02))
        n_steps = min(n_steps, max_steps)
        targets = np.linspace(dof_pos, nominal, n_steps)
        for tgt in targets:
            # publish raw joint targets (action space inverse transform)
            action = (tgt - agent.default_dof_pos) / agent.cfg.control.action_scale
            action[[0, 3, 6, 9]] /= agent.cfg.control.hip_scale_reduction
            agent.step(action)
        self.log("Calibration complete.")

    # ------------------------------------------------------------------
    def run(self, max_steps: int = 10_000_000, trace=None):
        """Main loop (:125-222): R2-gated start, policy stepping, emergency
        recovery on extreme orientation. trace: optional list — one dict per
        policy step (wall time, live 15-dim command, action, rpy) for HIL
        session logging."""
        agent = self.agent
        obs = agent.reset()
        self.obs_history = np.tile(obs, self.num_obs_history)
        self.calibrate(wait=True, low=False)
        self.log("Starting policy... press R2 again to stop.")

        t_run0 = time.time()
        for step in range(max_steps):
            action = np.asarray(self.policy(self.obs_history))
            obs = agent.step(action)
            self.obs_history = np.concatenate(
                [self.obs_history[len(obs):], obs])
            if trace is not None:
                trace.append({
                    "t": round(time.time() - t_run0, 4), "step": step,
                    "commands": np.asarray(agent.commands).round(4).tolist(),
                    "action": action.round(3).tolist(),
                    "q": self.se.get_dof_pos().round(3).tolist(),
                    "rpy": self.se.get_rpy().round(3).tolist(),
                })

            rpy = self.se.get_rpy()
            if abs(rpy[0]) > 1.6 or abs(rpy[1]) > 1.6:     # :160-162
                self.log("EMERGENCY: extreme orientation, crouching")
                self.calibrate(wait=False, low=True)
                self.obs_history = np.tile(agent.get_obs(),
                                           self.num_obs_history)
            if self.se.right_lower_right_switch_pressed:   # dead-man stop
                self.se.right_lower_right_switch_pressed = False
                self.log("R2 pressed: stopping policy, crouching")
                self.calibrate(wait=False, low=True)
                return step
        return max_steps
