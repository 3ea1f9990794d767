"""Robot state estimation from LCM telemetry.

Re-design of go1_gym_deploy/utils/cheetah_state_estimator.py:51-406: an LCM
subscriber that turns the bridge's `state_estimator_data` /
`leg_control_data` / `rc_command` streams into the quantities the policy
consumes (body-frame gravity, smoothed gyro, joint states, contact
estimates) and maps the RC transmitter onto the 15-dim command space with
mode cycling and gait buttons (get_command :148-221).
"""
from __future__ import annotations

import time

import numpy as np

from .lcm_types import (leg_control_data_lcmt, rc_command_lcmt,
                        state_estimator_lcmt)

# sim joint order <-> SDK joint order (reference joint_idxs,
# cheetah_state_estimator.py:60-63: identical FR/FL/RR/RL blocks)
JOINT_IDXS = np.arange(12)
CONTACT_IDXS = np.array([1, 0, 3, 2])  # :64


def rpy_to_R(rpy):
    """Rotation matrix from roll-pitch-yaw (get_rotation_matrix_from_rpy,
    cheetah_state_estimator.py:13-48)."""
    r, p, y = rpy
    Rx = np.array([[1, 0, 0],
                   [0, np.cos(r), -np.sin(r)],
                   [0, np.sin(r), np.cos(r)]])
    Ry = np.array([[np.cos(p), 0, np.sin(p)],
                   [0, 1, 0],
                   [-np.sin(p), 0, np.cos(p)]])
    Rz = np.array([[np.cos(y), -np.sin(y), 0],
                   [np.sin(y), np.cos(y), 0],
                   [0, 0, 1]])
    return Rz @ Ry @ Rx


class StateEstimator:
    def __init__(self, lc, smoothing_length: int = 30,
                 smoothing_ratio: float = 0.2):
        self.lc = lc
        self.joint_pos = np.zeros(12)
        self.joint_vel = np.zeros(12)
        self.tau_est = np.zeros(12)
        self.world_lin_vel = np.zeros(3)
        self.world_ang_vel = np.zeros(3)
        self.euler = np.zeros(3)
        self.R = np.eye(3)
        self.contact_state = np.ones(4) * -1
        self.body_ang_vel = np.zeros(3)
        self.smoothing_length = smoothing_length
        self.deuler_history = np.zeros((smoothing_length, 3))
        self.dt_history = np.ones((smoothing_length, 1)) * 0.01
        self.euler_prev = np.zeros(3)
        self.timuprev = time.time()
        self.buf_idx = 0
        self.smoothing_ratio = smoothing_ratio

        # RC state
        self.mode = 0
        self.ctrlmode_left = 0
        self.ctrlmode_right = 0
        self.left_stick = [0.0, 0.0]
        self.right_stick = [0.0, 0.0]
        self.left_upper_switch = 0
        self.left_upper_switch_pressed = False
        self.right_upper_switch = 0
        self.right_upper_switch_pressed = False
        self.left_lower_left_switch = 0
        self.left_lower_left_switch_pressed = False
        self.left_lower_right_switch = 0
        self.left_lower_right_switch_pressed = False
        self.right_lower_left_switch = 0
        self.right_lower_left_switch_pressed = False
        self.right_lower_right_switch = 0
        self.right_lower_right_switch_pressed = False

        self.cmd_phase, self.cmd_offset = 0.5, 0.0
        self.cmd_bound, self.cmd_duration = 0.0, 0.5

        self.init_time = time.time()
        self.received_first_legdata = False

        lc.subscribe("state_estimator_data", self._legdata_imu_cb)
        lc.subscribe("leg_control_data", self._legdata_cb)
        lc.subscribe("rc_command", self._rc_command_cb)

    # ------------------------------------------------------------------
    def get_body_linear_vel(self):
        return self.R.T @ self.world_lin_vel

    def get_body_angular_vel(self):
        """Smoothed finite-difference gyro (:133-136)."""
        self.body_ang_vel = (
            self.smoothing_ratio
            * np.mean(self.deuler_history / self.dt_history, axis=0)
            + (1 - self.smoothing_ratio) * self.body_ang_vel)
        return self.body_ang_vel

    def get_gravity_vector(self):
        return self.R.T @ np.array([0.0, 0.0, -1.0])

    def get_contact_state(self):
        return self.contact_state[CONTACT_IDXS]

    def get_rpy(self):
        return self.euler

    def get_dof_pos(self):
        return self.joint_pos[JOINT_IDXS]

    def get_dof_vel(self):
        return self.joint_vel[JOINT_IDXS]

    def get_tau_est(self):
        return self.tau_est[JOINT_IDXS]

    def get_yaw(self):
        return self.euler[2]

    def get_buttons(self):
        return np.array([self.left_lower_left_switch,
                         self.left_upper_switch,
                         self.right_lower_right_switch,
                         self.right_upper_switch])

    # ------------------------------------------------------------------
    def get_command(self):
        """RC transmitter -> 15-dim command vector with mode cycling
        (:148-221). Returns a 19-dim array like the reference (tail zeros)."""
        MODES_LEFT = ["body_height", "lat_vel", "stance_width"]
        MODES_RIGHT = ["step_frequency", "footswing_height", "body_pitch"]
        if self.left_upper_switch_pressed:
            self.ctrlmode_left = (self.ctrlmode_left + 1) % 3
            self.left_upper_switch_pressed = False
        if self.right_upper_switch_pressed:
            self.ctrlmode_right = (self.ctrlmode_right + 1) % 3
            self.right_upper_switch_pressed = False
        mode_left = MODES_LEFT[self.ctrlmode_left]
        mode_right = MODES_RIGHT[self.ctrlmode_right]

        cmd_x = 1 * self.left_stick[1]
        cmd_yaw = -1 * self.right_stick[0]
        cmd_y, cmd_height = 0.0, 0.0
        cmd_footswing, cmd_stance_width = 0.08, 0.33
        cmd_stance_length = 0.40
        cmd_ori_pitch, cmd_ori_roll = 0.0, 0.0
        cmd_freq = 3.0
        if mode_left == "body_height":
            cmd_height = 0.3 * self.left_stick[0]
        elif mode_left == "lat_vel":
            cmd_y = 0.6 * self.left_stick[0]
        elif mode_left == "stance_width":
            cmd_stance_width = 0.275 + 0.175 * self.left_stick[0]
        if mode_right == "step_frequency":
            cmd_freq = (1 + self.right_stick[1]) / 2 * 2.0 + 2.0
        elif mode_right == "footswing_height":
            cmd_footswing = max(0, self.right_stick[1]) * 0.32 + 0.03
        elif mode_right == "body_pitch":
            cmd_ori_pitch = -0.4 * self.right_stick[1]

        # gait buttons: trot / pronk / bound / pace (:193-219; the offset
        # dim commands bounding and the bound dim pacing — see the gait
        # dicts in reference scripts/go1/play.py:102-105)
        gaits = {0: (0.5, 0.0, 0.0), 1: (0.0, 0.0, 0.0),
                 2: (0.0, 0.5, 0.0), 3: (0.0, 0.0, 0.5)}
        self.cmd_phase, self.cmd_offset, self.cmd_bound = gaits.get(
            self.mode, (0.5, 0.0, 0.0))
        self.cmd_duration = 0.5

        return np.array([
            cmd_x, cmd_y, cmd_yaw, cmd_height, cmd_freq, self.cmd_phase,
            self.cmd_offset, self.cmd_bound, self.cmd_duration,
            cmd_footswing, cmd_ori_pitch, cmd_ori_roll, cmd_stance_width,
            cmd_stance_length, 0, 0, 0, 0, 0])

    # ------------------------------------------------------------------
    # LCM callbacks
    # ------------------------------------------------------------------
    def _legdata_cb(self, channel, data):
        msg = leg_control_data_lcmt.decode(data)
        if not self.received_first_legdata:
            self.received_first_legdata = True
        self.joint_pos = np.array(msg.q)
        self.joint_vel = np.array(msg.qd)
        self.tau_est = np.array(msg.tau_est)

    def _legdata_imu_cb(self, channel, data):
        msg = state_estimator_lcmt.decode(data)
        self.euler = np.array(msg.rpy)
        self.R = rpy_to_R(self.euler)
        self.contact_state = 1.0 * (np.array(msg.contact_estimate) > 200)
        self.world_lin_vel = np.array(msg.vWorld)
        # smoothed angular velocity from euler deltas (:272-282)
        now = time.time()
        self.deuler_history[self.buf_idx] = self.euler - self.euler_prev
        self.dt_history[self.buf_idx] = max(now - self.timuprev, 1e-4)
        self.buf_idx = (self.buf_idx + 1) % self.smoothing_length
        self.timuprev = now
        self.euler_prev = self.euler.copy()

    def _rc_command_cb(self, channel, data):
        msg = rc_command_lcmt.decode(data)
        self.left_upper_switch_pressed |= bool(
            msg.left_upper_switch and not self.left_upper_switch)
        self.right_upper_switch_pressed |= bool(
            msg.right_upper_switch and not self.right_upper_switch)
        self.left_lower_left_switch_pressed |= bool(
            msg.left_lower_left_switch and not self.left_lower_left_switch)
        self.right_lower_right_switch_pressed |= bool(
            msg.right_lower_right_switch and not self.right_lower_right_switch)
        self.mode = msg.mode
        self.left_stick = list(msg.left_stick)
        self.right_stick = list(msg.right_stick)
        self.left_upper_switch = msg.left_upper_switch
        self.right_upper_switch = msg.right_upper_switch
        self.left_lower_left_switch = msg.left_lower_left_switch
        self.left_lower_right_switch = msg.left_lower_right_switch
        self.right_lower_left_switch = msg.right_lower_left_switch
        self.right_lower_right_switch = msg.right_lower_right_switch

    def spin(self):
        self.lc.spin()

    def close(self):
        self.lc.stop()
