"""Command sources for deployment.

Re-design of go1_gym_deploy/utils/command_profile.py:1-231: scripted and
RC-controlled 15-dim command profiles feeding LCMAgent.get_obs.
"""
from __future__ import annotations

import numpy as np


class CommandProfile:
    def __init__(self, dt, max_time_s=10.0):
        self.dt = dt
        self.max_timestep = int(max_time_s / dt)
        self.commands = np.zeros((self.max_timestep, 9))
        self.start_time = 0

    def get_command(self, t, probe=False):
        timestep = int((t - self.start_time) / self.dt)
        timestep = min(timestep, self.max_timestep - 1)
        return self.commands[timestep], False

    def reset(self, reset_time):
        self.start_time = reset_time


class ConstantAccelerationProfile(CommandProfile):
    """(command_profile.py:24-38)."""

    def __init__(self, dt, max_speed, accel_time, zero_buf_time=0):
        super().__init__(dt)
        zero_buf_timesteps = int(zero_buf_time / dt)
        accel_timesteps = int(accel_time / dt)
        self.commands[:zero_buf_timesteps] = 0
        self.commands[zero_buf_timesteps:zero_buf_timesteps
                      + accel_timesteps, 0] = np.arange(accel_timesteps) \
            / accel_timesteps * max_speed
        self.commands[zero_buf_timesteps + accel_timesteps:, 0] = max_speed


class ConstantVelocityProfile(CommandProfile):
    def __init__(self, dt, speed, max_time_s=10.0):
        super().__init__(dt, max_time_s)
        self.commands[:, 0] = speed


class RCControllerProfile:
    """Live RC commands via the StateEstimator (command_profile.py:98-150),
    with optional scripted probe commands and reset triggers."""

    def __init__(self, dt, state_estimator, x_scale=1.0, y_scale=1.0,
                 yaw_scale=1.0, probe_vel_multiplier=1.0):
        self.dt = dt
        self.se = state_estimator
        self.x_scale = x_scale
        self.y_scale = y_scale
        self.yaw_scale = yaw_scale
        self.probe_vel_multiplier = probe_vel_multiplier
        self.triggered_commands = {i: None for i in range(4)}
        self.currently_triggered = [0, 0, 0, 0]
        self.button_states = [0, 0, 0, 0]

    def get_command(self, t, probe=False):
        command = self.se.get_command()
        command[0] *= self.x_scale
        command[1] *= self.y_scale
        command[2] *= self.yaw_scale
        reset_timer = False
        if probe:
            command[0] *= self.probe_vel_multiplier
            command[2] *= self.probe_vel_multiplier
        # button-triggered scripted profiles (:119-142)
        buttons = self.se.get_buttons()
        for i in range(4):
            if buttons[i] and self.button_states[i] == 0:
                if self.triggered_commands[i] is not None:
                    self.currently_triggered[i] = \
                        not self.currently_triggered[i]
                    reset_timer = True
            self.button_states[i] = buttons[i]
            if self.currently_triggered[i] and \
                    self.triggered_commands[i] is not None:
                command, _ = self.triggered_commands[i].get_command(t)
        return command, reset_timer

    def add_triggered_command(self, button_idx, command_profile):
        self.triggered_commands[button_idx] = command_profile

    def reset(self, reset_time):
        pass
