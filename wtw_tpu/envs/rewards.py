"""CoRL reward stack.

Re-implementation of go1_gym/envs/rewards/corl_rewards.py:15-202 as pure
functions of a per-env RewardCtx. The env resolves active terms from the
nonzero reward scales through REWARD_FNS — the functional analog of the
reference's `_reward_<name>` reflection (_prepare_reward_function,
legged_robot.py:1385-1412): scales with no implemented function are warned
about and dropped, matching reference behavior (go1's `base_height` and
`feet_air_time` scales are silently inactive there because CoRLRewards does
not define them; we do implement feet_air_time/base_height for completeness,
so presets that want reference-exact behavior set their scales to 0).

All functions: (ctx, cfg) -> scalar for ONE env; the env vmaps.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from ..utils import quat as quat_util


@struct.dataclass
class RewardCtx:
    # body-frame kinematics (legged_robot.py:106-115)
    base_pos: jnp.ndarray
    base_quat: jnp.ndarray
    base_lin_vel: jnp.ndarray       # body frame
    base_ang_vel: jnp.ndarray       # body frame
    projected_gravity: jnp.ndarray
    commands: jnp.ndarray           # (num_commands,)
    joint_q: jnp.ndarray
    joint_qd: jnp.ndarray
    last_joint_qd: jnp.ndarray
    torques: jnp.ndarray
    actions: jnp.ndarray
    last_actions: jnp.ndarray
    last_last_actions: jnp.ndarray
    joint_pos_target: jnp.ndarray
    last_joint_pos_target: jnp.ndarray
    last_last_joint_pos_target: jnp.ndarray
    default_joint_q: jnp.ndarray
    soft_pos_limits: jnp.ndarray    # (nj, 2)
    foot_forces: jnp.ndarray        # (4, 3)
    foot_velocities: jnp.ndarray    # (4, 3)
    prev_foot_velocities: jnp.ndarray
    foot_positions: jnp.ndarray     # (4, 3) world
    desired_contact_states: jnp.ndarray  # (4,)
    foot_indices: jnp.ndarray       # (4,) unwarped gait phase
    contact_filt: jnp.ndarray       # (4,) bool, contact | last_contact
    thigh_contact: jnp.ndarray      # (4,) force norms
    calf_contact: jnp.ndarray
    feet_air_time: jnp.ndarray      # (4,) accumulated air time (s)
    first_contact: jnp.ndarray      # (4,) bool touchdown events
    dt: jnp.ndarray
    # per-foot lateral side (+1 left / -1 right), derived from the robot
    # model's hip y offsets — robots list legs in different orders (go1
    # FR-first, go2 FL-first), so the raibert stance-width nominal must
    # follow the model, not a hardcoded pattern
    foot_side: jnp.ndarray          # (4,)


def _cmd(ctx, i, default=0.0):
    n = ctx.commands.shape[0]
    return ctx.commands[i] if i < n else jnp.float32(default)


def tracking_lin_vel(ctx, cfg):
    err = jnp.sum(jnp.square(ctx.commands[:2] - ctx.base_lin_vel[:2]))
    return jnp.exp(-err / cfg.rewards.tracking_sigma)


def tracking_ang_vel(ctx, cfg):
    err = jnp.square(ctx.commands[2] - ctx.base_ang_vel[2])
    return jnp.exp(-err / cfg.rewards.tracking_sigma_yaw)


def lin_vel_z(ctx, cfg):
    return jnp.square(ctx.base_lin_vel[2])


def ang_vel_xy(ctx, cfg):
    return jnp.sum(jnp.square(ctx.base_ang_vel[:2]))


def orientation(ctx, cfg):
    return jnp.sum(jnp.square(ctx.projected_gravity[:2]))


def torques(ctx, cfg):
    return jnp.sum(jnp.square(ctx.torques))


def dof_vel(ctx, cfg):
    return jnp.sum(jnp.square(ctx.joint_qd))


def dof_acc(ctx, cfg):
    return jnp.sum(jnp.square((ctx.last_joint_qd - ctx.joint_qd) / ctx.dt))


def action_rate(ctx, cfg):
    return jnp.sum(jnp.square(ctx.last_actions - ctx.actions))


def collision(ctx, cfg):
    # penalized bodies = thigh + calf (go1_config.py:42)
    forces = jnp.concatenate([ctx.thigh_contact, ctx.calf_contact])
    return jnp.sum(1.0 * (forces > 0.1))


def dof_pos_limits(ctx, cfg):
    lo = -jnp.clip(ctx.joint_q - ctx.soft_pos_limits[:, 0], max=0.0)
    hi = jnp.clip(ctx.joint_q - ctx.soft_pos_limits[:, 1], min=0.0)
    return jnp.sum(lo + hi)


def jump(ctx, cfg):
    body_height = ctx.base_pos[2]
    target = _cmd(ctx, 3) + cfg.rewards.base_height_target
    return -jnp.square(body_height - target)


def base_height(ctx, cfg):
    # legged_gym-style height penalty (active in presets that enable it)
    return jnp.square(ctx.base_pos[2] - cfg.rewards.base_height_target)


def tracking_contacts_shaped_force(ctx, cfg):
    forces = jnp.linalg.norm(ctx.foot_forces, axis=-1)
    desired = ctx.desired_contact_states
    r = -(1 - desired) * (1 - jnp.exp(-forces ** 2 / cfg.rewards.gait_force_sigma))
    return jnp.sum(r) / 4


def tracking_contacts_shaped_vel(ctx, cfg):
    vels = jnp.linalg.norm(ctx.foot_velocities, axis=-1)
    desired = ctx.desired_contact_states
    r = -(desired * (1 - jnp.exp(-vels ** 2 / cfg.rewards.gait_vel_sigma)))
    return jnp.sum(r) / 4


def dof_pos(ctx, cfg):
    return jnp.sum(jnp.square(ctx.joint_q - ctx.default_joint_q))


def action_smoothness_1(ctx, cfg):
    diff = jnp.square(ctx.joint_pos_target - ctx.last_joint_pos_target)
    diff = diff * (ctx.last_actions != 0)   # ignore first step
    return jnp.sum(diff)


def action_smoothness_2(ctx, cfg):
    diff = jnp.square(ctx.joint_pos_target - 2 * ctx.last_joint_pos_target
                      + ctx.last_last_joint_pos_target)
    diff = diff * (ctx.last_actions != 0)
    diff = diff * (ctx.last_last_actions != 0)
    return jnp.sum(diff)


def feet_slip(ctx, cfg):
    xy_speed_sq = jnp.square(jnp.linalg.norm(ctx.foot_velocities[:, :2], axis=-1))
    return jnp.sum(ctx.contact_filt * xy_speed_sq)


def feet_contact_forces(ctx, cfg):
    f = jnp.linalg.norm(ctx.foot_forces, axis=-1)
    return jnp.sum(jnp.clip(f - cfg.rewards.max_contact_force, min=0.0))


def feet_clearance_cmd_linear(ctx, cfg):
    phases = 1 - jnp.abs(1.0 - jnp.clip(ctx.foot_indices * 2.0 - 1.0, 0.0, 1.0) * 2.0)
    foot_height = ctx.foot_positions[:, 2]
    target = _cmd(ctx, 9, cfg.rewards.footswing_height) * phases + 0.02
    r = jnp.square(target - foot_height) * (1 - ctx.desired_contact_states)
    return jnp.sum(r)


def feet_impact_vel(ctx, cfg):
    prev_vz = ctx.prev_foot_velocities[:, 2]
    contact = jnp.linalg.norm(ctx.foot_forces, axis=-1) > 1.0
    return jnp.sum(contact * jnp.square(jnp.clip(prev_vz, -100.0, 0.0)))


def feet_contact_vel(ctx, cfg):
    """Penalize foot speed near the ground (corl_rewards.py:115-120)."""
    near_ground = ctx.foot_positions[:, 2] < 0.03
    foot_speed_sq = jnp.sum(jnp.square(ctx.foot_velocities), axis=-1)
    return jnp.sum(near_ground * foot_speed_sq)


def feet_air_time(ctx, cfg):
    # legged_gym classic (not present in CoRLRewards; kept for parity with
    # the legged_gym lineage the reference forks)
    rew = jnp.sum((ctx.feet_air_time - 0.5) * ctx.first_contact)
    return rew * (jnp.linalg.norm(ctx.commands[:2]) > 0.1)


def orientation_control(ctx, cfg):
    roll_cmd = _cmd(ctx, 11)
    pitch_cmd = _cmd(ctx, 10)
    quat_roll = quat_util.quat_from_angle_axis(-roll_cmd, jnp.array([1.0, 0, 0]))
    quat_pitch = quat_util.quat_from_angle_axis(-pitch_cmd, jnp.array([0.0, 1, 0]))
    desired_quat = quat_util.quat_mul(quat_roll, quat_pitch)
    desired_pg = quat_util.quat_rotate_inverse(desired_quat, jnp.array([0.0, 0, -1.0]))
    return jnp.sum(jnp.square(ctx.projected_gravity[:2] - desired_pg[:2]))


def raibert_heuristic(ctx, cfg):
    # corl_rewards.py:161-202 (nominal footholds: FR, FL, RR, RL)
    translated = ctx.foot_positions - ctx.base_pos[None, :]
    q_conj = quat_util.quat_conjugate(ctx.base_quat)
    feet_body = quat_util.quat_apply_yaw(
        jnp.broadcast_to(q_conj, (4, 4)), translated)

    n = ctx.commands.shape[0]
    w = ctx.commands[12] if n >= 13 else jnp.float32(0.3)
    l = ctx.commands[13] if n >= 14 else jnp.float32(0.45)
    # ADJUDICATED SIGN FIX (round 4): the reference writes ys_nom =
    # [+w/2, -w/2, +w/2, -w/2] over its OWN FR-first foot order
    # (corl_rewards.py:169-175; URDF link order FR, FL, RR, RL — FR's hip
    # sits at y = -0.047), i.e. it commands the RIGHT feet to the LEFT
    # side. Under a squared error the optimum of that cross-legged target
    # is feet squeezed to the centerline — measured on our 100k policy as
    # realized stance width pinned at ~0.125 m regardless of the commanded
    # 0.15/0.25/0.40, while stance LENGTH (whose xs_nom signs are
    # consistent) obeys. ys_nom follows each foot's OWN side (ctx.foot_side,
    # derived from the model's hip y offsets) so the commanded width is the
    # optimum — the documented intent of the 15-dim command space
    # (paper/README stance-width RC mode;
    # tests/test_env.py::test_raibert_nominal_is_optimal_at_command).
    ys_nom = ctx.foot_side * (w / 2)
    # front/rear from the same model-derived convention (legs are listed
    # front-first by every supported robot; kept explicit for clarity)
    xs_nom = jnp.stack([l / 2, l / 2, -l / 2, -l / 2])

    phases = jnp.abs(1.0 - ctx.foot_indices * 2.0) * 1.0 - 0.5
    freq = ctx.commands[4] if n > 4 else jnp.float32(3.0)
    x_vel_des = ctx.commands[0]
    yaw_vel_des = ctx.commands[2]
    y_vel_des = yaw_vel_des * l / 2
    ys_off = phases * y_vel_des * (0.5 / freq)
    ys_off = ys_off.at[2:].multiply(-1.0)
    xs_off = phases * x_vel_des * (0.5 / freq)

    err = jnp.stack([xs_nom + xs_off, ys_nom + ys_off], axis=-1) - feet_body[:, :2]
    return jnp.sum(jnp.square(jnp.abs(err)))


REWARD_FNS = {
    "tracking_lin_vel": tracking_lin_vel,
    "tracking_ang_vel": tracking_ang_vel,
    "lin_vel_z": lin_vel_z,
    "ang_vel_xy": ang_vel_xy,
    "orientation": orientation,
    "orientation_control": orientation_control,
    "torques": torques,
    "dof_vel": dof_vel,
    "dof_acc": dof_acc,
    "action_rate": action_rate,
    "collision": collision,
    "dof_pos_limits": dof_pos_limits,
    "dof_pos": dof_pos,
    "jump": jump,
    "base_height": base_height,
    "tracking_contacts_shaped_force": tracking_contacts_shaped_force,
    "tracking_contacts_shaped_vel": tracking_contacts_shaped_vel,
    "action_smoothness_1": action_smoothness_1,
    "action_smoothness_2": action_smoothness_2,
    "feet_slip": feet_slip,
    "feet_contact_forces": feet_contact_forces,
    "feet_clearance_cmd_linear": feet_clearance_cmd_linear,
    "feet_impact_vel": feet_impact_vel,
    "feet_contact_vel": feet_contact_vel,
    "feet_air_time": feet_air_time,
    "raibert_heuristic": raibert_heuristic,
}


def active_reward_terms(cfg) -> list:
    """(name, scale*dt) for nonzero scales with an implementation, mirroring
    _prepare_reward_function (legged_robot.py:1394-1412)."""
    out = []
    for name, scale in cfg.reward_scales.items():
        if name == "termination" or scale == 0.0:
            continue
        if name not in REWARD_FNS:
            print(f"Warning: reward '{name}' has nonzero scale but no "
                  f"implementation — dropped (reference does the same).")
            continue
        out.append((name, scale * cfg.dt))
    return out
