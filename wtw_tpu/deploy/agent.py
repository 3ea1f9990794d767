"""Hardware environment: the robot as a gym-like env over LCM.

Re-design of go1_gym_deploy/envs/lcm_agent.py:31-301 — obs assembly with
the SAME layout as the sim's compute_observations (so a policy trained in
wtw_tpu deploys unchanged), action -> PD target publication with action
scaling and hip reduction, 50 Hz wall-clock pacing, on-board gait-clock
replication.
"""
from __future__ import annotations

import time

import numpy as np

from ..config import Cfg
from .lcm_types import pd_tau_targets_lcmt


class LCMAgent:
    def __init__(self, cfg: Cfg, lc, state_estimator, command_profile,
                 default_joint_angles: np.ndarray,
                 p_gains=None, d_gains=None):
        self.cfg = cfg
        self.lc = lc
        self.se = state_estimator
        self.command_profile = command_profile
        self.dt = cfg.control.decimation * cfg.sim.dt
        self.timestep = 0
        self.time = time.time()
        self.num_commands = cfg.commands.num_commands
        self.default_dof_pos = np.asarray(default_joint_angles, np.float64)
        self.p_gains = (np.full(12, cfg.control.stiffness)
                        if p_gains is None else np.asarray(p_gains))
        self.d_gains = (np.full(12, cfg.control.damping)
                        if d_gains is None else np.asarray(d_gains))
        self.commands = np.zeros(self.num_commands)
        self.actions = np.zeros(12)
        self.last_actions = np.zeros(12)
        self.gait_indices = 0.0
        self.clock_inputs = np.zeros(4)
        self.joint_pos_target = self.default_dof_pos.copy()
        self.joint_vel_target = np.zeros(12)
        self.is_currently_probing = False

        # commands scale in plain numpy — the robot-side process must not
        # import JAX (device init can stall / collide with a TPU session;
        # mirrors envs/observations.commands_scale)
        s = cfg.obs_scales
        full = np.array([
            s.lin_vel, s.lin_vel, s.ang_vel, s.body_height_cmd,
            s.gait_freq_cmd, s.gait_phase_cmd, s.gait_phase_cmd,
            s.gait_phase_cmd, s.gait_phase_cmd, s.footswing_height_cmd,
            s.body_pitch_cmd, s.body_roll_cmd, s.stance_width_cmd,
            s.stance_length_cmd, s.aux_reward_cmd])
        self.commands_scale = full[:self.num_commands]
        self.obs_scales = cfg.obs_scales

    # ------------------------------------------------------------------
    def get_obs(self) -> np.ndarray:
        """Mirror of compute_observations (lcm_agent.py:125-184)."""
        cfg = self.cfg
        gravity = self.se.get_gravity_vector()
        cmds, reset_timer = self.command_profile.get_command(
            self.timestep * self.dt, probe=self.is_currently_probing)
        self.commands[:] = cmds[:self.num_commands]
        if reset_timer:
            self.reset_gait_indices()
        dof_pos = self.se.get_dof_pos()
        dof_vel = self.se.get_dof_vel()

        ob = np.concatenate([
            gravity,
            self.commands * self.commands_scale,
            (dof_pos - self.default_dof_pos) * self.obs_scales.dof_pos,
            dof_vel * self.obs_scales.dof_vel,
            np.clip(self.actions, -cfg.normalization.clip_actions,
                    cfg.normalization.clip_actions),
        ])
        if cfg.env.observe_two_prev_actions:
            ob = np.concatenate([ob, self.last_actions])
        if cfg.env.observe_clock_inputs:
            ob = np.concatenate([ob, self.clock_inputs])
        if cfg.env.observe_vel:
            ob = np.concatenate([
                self.se.get_body_linear_vel() * self.obs_scales.lin_vel,
                self.se.get_body_angular_vel() * self.obs_scales.ang_vel, ob])
        if cfg.env.observe_only_lin_vel:
            ob = np.concatenate([
                self.se.get_body_linear_vel() * self.obs_scales.lin_vel, ob])
        if cfg.env.observe_yaw:
            ob = np.concatenate([ob, [self.se.get_yaw()]])
        if cfg.env.observe_contact_states:
            ob = np.concatenate([ob, self.se.get_contact_state()])
        return ob.astype(np.float32)

    def _step_gait_clocks(self):
        """On-board gait clock (lcm_agent.py:238-263 mirrors the sim's
        _step_contact_targets)."""
        if not self.cfg.env.observe_clock_inputs or self.num_commands < 9:
            return
        frequencies = self.commands[4]
        phases, offsets, bounds = (self.commands[5], self.commands[6],
                                   self.commands[7])
        self.gait_indices = (self.gait_indices
                             + self.dt * frequencies) % 1.0
        foot_indices = np.array([
            self.gait_indices + phases + offsets + bounds,
            self.gait_indices + offsets,
            self.gait_indices + bounds,
            self.gait_indices + phases]) % 1.0
        self.clock_inputs = np.sin(2 * np.pi * foot_indices)

    # ------------------------------------------------------------------
    def publish_action(self, action, hard_reset=False):
        """(lcm_agent.py:189-217)."""
        cfg = self.cfg
        tgt = np.asarray(action[:12], np.float64) * cfg.control.action_scale
        tgt[[0, 3, 6, 9]] *= cfg.control.hip_scale_reduction
        self.joint_pos_target = tgt + self.default_dof_pos

        msg = pd_tau_targets_lcmt(
            q_des=list(self.joint_pos_target),
            qd_des=[0.0] * 12,
            tau_ff=[0.0] * 12,
            kp=list(self.p_gains),
            kd=list(self.d_gains),
            timestamp_us=int(time.time() * 1e6),
            id=-1 if hard_reset else 0,
            robot_id=0,
            se_contactState=[0.0] * 4)
        self.lc.publish("pd_plustau_targets", msg.encode())

    def reset(self):
        self.actions = np.zeros(12)
        self.time = time.time()
        self.timestep = 0
        return self.get_obs()

    def reset_gait_indices(self):
        self.gait_indices = 0.0

    def step(self, actions, hard_reset=False):
        """(lcm_agent.py:228-236): publish, pace to 50 Hz, observe."""
        clip = self.cfg.normalization.clip_actions
        self.last_actions = self.actions.copy()
        self.actions = np.clip(np.asarray(actions).reshape(-1)[:12],
                               -clip, clip)
        self.publish_action(self.actions, hard_reset=hard_reset)
        time.sleep(max(self.dt - (time.time() - self.time), 0))
        self.time = time.time()
        self._step_gait_clocks()
        obs = self.get_obs()
        self.timestep += 1
        return obs
