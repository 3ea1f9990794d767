"""Observation assembly.

Mirrors compute_observations (go1_gym/envs/base/legged_robot.py:302-491):
flag-driven concatenation of observation blocks, a static noise-scale vector
(_get_noise_scale_vec, :1053-1120), and privileged observations built from
the domain-randomization parameters.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import Cfg


def commands_scale(cfg: Cfg) -> np.ndarray:
    """legged_robot.py:1196-1203."""
    s = cfg.obs_scales
    full = np.array([
        s.lin_vel, s.lin_vel, s.ang_vel, s.body_height_cmd, s.gait_freq_cmd,
        s.gait_phase_cmd, s.gait_phase_cmd, s.gait_phase_cmd, s.gait_phase_cmd,
        s.footswing_height_cmd, s.body_pitch_cmd, s.body_roll_cmd,
        s.stance_width_cmd, s.stance_length_cmd, s.aux_reward_cmd])
    return full[:cfg.commands.num_commands]


def build_obs(cfg: Cfg, *, projected_gravity, commands, joint_q, joint_qd,
              default_joint_q, actions, last_actions, clock_inputs,
              gait_index, base_lin_vel, base_ang_vel, base_quat,
              contact_states) -> jnp.ndarray:
    """One env's scalar observation vector (order = reference :305-372)."""
    s = cfg.obs_scales
    blocks = [projected_gravity]
    if cfg.env.observe_command:
        blocks.append(commands * jnp.asarray(commands_scale(cfg), jnp.float32))
    blocks.append((joint_q - default_joint_q) * s.dof_pos)
    blocks.append(joint_qd * s.dof_vel)
    blocks.append(actions)
    if cfg.env.observe_two_prev_actions:
        blocks.append(last_actions)
    if cfg.env.observe_timing_parameter:
        blocks.append(gait_index[None])
    if cfg.env.observe_clock_inputs:
        blocks.append(clock_inputs)
    if cfg.env.observe_vel:
        blocks = [base_lin_vel * s.lin_vel, base_ang_vel * s.ang_vel] + blocks
    if cfg.env.observe_only_ang_vel:
        blocks = [base_ang_vel * s.ang_vel] + blocks
    if cfg.env.observe_only_lin_vel:
        blocks = [base_lin_vel * s.lin_vel] + blocks
    if cfg.env.observe_yaw:
        from ..utils.quat import quat_yaw
        blocks.append(quat_yaw(base_quat)[None])
    if cfg.env.observe_contact_states:
        blocks.append(contact_states.astype(jnp.float32))
    return jnp.concatenate(blocks)


def noise_scale_vec(cfg: Cfg) -> np.ndarray:
    """Static noise amplitude per obs dim (legged_robot.py:1053-1120)."""
    ns, s = cfg.noise, cfg.obs_scales
    lvl = ns.noise_level
    nj = cfg.env.num_actions
    parts = [np.full(3, ns.gravity * lvl)]
    if cfg.env.observe_command:
        parts.append(np.zeros(cfg.commands.num_commands))
    parts.append(np.full(nj, ns.dof_pos * lvl * s.dof_pos))
    parts.append(np.full(nj, ns.dof_vel * lvl * s.dof_vel))
    parts.append(np.zeros(nj))  # actions
    if cfg.env.observe_two_prev_actions:
        parts.append(np.zeros(nj))
    if cfg.env.observe_timing_parameter:
        parts.append(np.zeros(1))
    if cfg.env.observe_clock_inputs:
        parts.append(np.zeros(4))
    vec = np.concatenate(parts)
    if cfg.env.observe_vel:
        vec = np.concatenate([np.full(3, ns.lin_vel * lvl * s.lin_vel),
                              np.full(3, ns.ang_vel * lvl * s.ang_vel), vec])
    if cfg.env.observe_only_ang_vel:
        vec = np.concatenate([np.full(3, ns.ang_vel * lvl * s.ang_vel), vec])
    if cfg.env.observe_only_lin_vel:
        vec = np.concatenate([np.full(3, ns.lin_vel * lvl * s.lin_vel), vec])
    if cfg.env.observe_yaw:
        vec = np.concatenate([vec, np.zeros(1)])
    if cfg.env.observe_contact_states:
        vec = np.concatenate([vec, np.full(4, ns.contact_states * lvl)])
    return vec.astype(np.float32)


def _scale_shift(rng):
    """get_scale_shift (go1_gym/utils/math_utils.py:35-38)."""
    scale = 2.0 / (rng[1] - rng[0])
    shift = (rng[0] + rng[1]) / 2.0
    return scale, shift


def build_privileged_obs(cfg: Cfg, *, friction, restitution, payload,
                         com_displacement, motor_strength, motor_offset,
                         Kp_factor, Kd_factor, base_lin_vel, base_height,
                         gravity_offset, clock_inputs,
                         desired_contact_states) -> jnp.ndarray:
    """Privileged (teacher) observation (legged_robot.py:380-491). Block
    order follows the reference's if-chain."""
    n = cfg.normalization
    blocks = []
    if cfg.env.priv_observe_friction:
        sc, sh = _scale_shift(n.friction_range)
        blocks.append(((friction - sh) * sc)[None])
    if cfg.env.priv_observe_restitution:
        sc, sh = _scale_shift(n.restitution_range)
        blocks.append(((restitution - sh) * sc)[None])
    if cfg.env.priv_observe_base_mass:
        sc, sh = _scale_shift(n.added_mass_range)
        blocks.append(((payload - sh) * sc)[None])
    if cfg.env.priv_observe_com_displacement:
        sc, sh = _scale_shift(n.com_displacement_range)
        blocks.append((com_displacement - sh) * sc)
    if cfg.env.priv_observe_motor_strength:
        sc, sh = _scale_shift(n.motor_strength_range)
        blocks.append((motor_strength - sh) * sc)
    if cfg.env.priv_observe_motor_offset:
        sc, sh = _scale_shift(n.motor_offset_range)
        blocks.append((motor_offset - sh) * sc)
    if cfg.env.priv_observe_Kp_factor:
        sc, sh = _scale_shift(n.Kp_factor_range)
        blocks.append((Kp_factor - sh) * sc)
    if cfg.env.priv_observe_Kd_factor:
        sc, sh = _scale_shift(n.Kd_factor_range)
        blocks.append((Kd_factor - sh) * sc)
    if cfg.env.priv_observe_body_height:
        sc, sh = _scale_shift(n.body_height_range)
        blocks.append(((base_height - sh) * sc)[None])
    if cfg.env.priv_observe_body_velocity:
        sc, sh = _scale_shift(n.body_velocity_range)
        blocks.append((base_lin_vel - sh) * sc)
    if cfg.env.priv_observe_gravity:
        sc, sh = _scale_shift(n.gravity_range)
        blocks.append((gravity_offset - sh) * sc)
    if cfg.env.priv_observe_clock_inputs:
        blocks.append(clock_inputs)
    if cfg.env.priv_observe_desired_contact_states:
        blocks.append(desired_contact_states)
    out = jnp.concatenate(blocks) if blocks else jnp.zeros(0)
    return out
