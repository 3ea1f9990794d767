"""The one robot-parameterized legged environment.

Replaces the reference's five copied packages (go1_gym/go2_gym/b1_gym envs +
wrappers; SURVEY.md §1 "code-duplication fact") with a single pure-function
env over explicit state:

    world' , (obs, priv_obs, obs_history), rew, done, info = env.step(world, actions)

Everything the reference does imperatively across LeggedRobot.step /
post_physics_step / reset_idx / HistoryWrapper (legged_robot.py:60-239,
history_wrapper.py:18-30) happens here as fixed-shape masked array ops:
in-scan resets, masked command resampling with the on-device curriculum,
domain randomization from threaded RNG keys, gait clocks, reward stack,
observation assembly with history ring, per-episode metric accumulators.

vmap is over the env axis; the decimation loop is a lax.scan of 4 physics
steps (legged_robot.py:74-81).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import Cfg
from ..models.robot import RobotModel, default_joint_angles
from ..physics import EngineParams, HeightField, PhysicsState, flat_heightfield
from ..physics.engine import physics_step
from ..physics.batched import physics_step_batched
from ..utils import quat as quat_util
from . import curriculum as curr
from . import gait, observations
from .rewards import RewardCtx, REWARD_FNS, active_reward_terms

# command_sums metric tail (legged_robot.py:1425-1429)
EXTRA_CMD_METRICS = ("lin_vel_raw", "ang_vel_raw", "lin_vel_residual",
                     "ang_vel_residual", "ep_timesteps")


@struct.dataclass
class EnvState:
    """Per-env state (leading batch dim N everywhere)."""
    phys: PhysicsState
    rng: jax.Array
    episode_length: jnp.ndarray        # int32
    commands: jnp.ndarray              # (nc,)
    env_bin: jnp.ndarray               # int32 curriculum cell
    env_category: jnp.ndarray          # int32 gait category
    # gait clocks
    gait_index: jnp.ndarray
    clock_inputs: jnp.ndarray          # (4,)
    doubletime_clock: jnp.ndarray
    halftime_clock: jnp.ndarray
    foot_indices: jnp.ndarray
    desired_contact_states: jnp.ndarray
    # action / target history
    actions: jnp.ndarray
    last_actions: jnp.ndarray
    last_last_actions: jnp.ndarray
    joint_pos_target: jnp.ndarray
    last_joint_pos_target: jnp.ndarray
    last_last_joint_pos_target: jnp.ndarray
    last_joint_qd: jnp.ndarray
    torques: jnp.ndarray
    lag_buffer: jnp.ndarray            # (lag+1, nj)
    # actuator-net history (legged_robot.py:1255-1258)
    joint_pos_err_last: jnp.ndarray
    joint_pos_err_last_last: jnp.ndarray
    joint_vel_last: jnp.ndarray
    joint_vel_last_last: jnp.ndarray
    # domain randomization draws
    friction: jnp.ndarray
    restitution: jnp.ndarray
    payload: jnp.ndarray
    com_displacement: jnp.ndarray      # (3,)
    motor_strength: jnp.ndarray        # (nj,)
    motor_offset: jnp.ndarray
    Kp_factor: jnp.ndarray
    Kd_factor: jnp.ndarray
    # contact bookkeeping
    last_contacts: jnp.ndarray         # (4,) bool
    feet_air_time: jnp.ndarray         # (4,)
    prev_foot_velocities: jnp.ndarray  # (4,3)
    # metrics
    episode_sums: jnp.ndarray          # (n_terms + 1,) incl. total
    command_sums: jnp.ndarray          # (n_terms + 5,)
    env_origin: jnp.ndarray            # (3,)
    timed_out: jnp.ndarray             # bool


@struct.dataclass
class WorldState:
    env: EnvState                      # batched (N, ...)
    curriculum: curr.CurriculumState
    obs_history: jnp.ndarray           # (N, H * num_obs)
    gravity_offset: jnp.ndarray        # (3,) global gravity randomization
    common_step: jnp.ndarray           # int32 global counter


class LeggedEnv:
    """Static env definition; all methods are pure and jit-compatible."""

    def __init__(self, cfg: Cfg, model: RobotModel,
                 heightfield: HeightField | None = None,
                 env_origins: np.ndarray | None = None,
                 axis_name: str | None = None,
                 physics_backend: str = "auto",
                 default_joint_q_override: jnp.ndarray | None = None,
                 per_env_control: dict | None = None):
        # per_env_control: multi-embodiment per-env control constants
        # (envs.multi_env) — optional keys 'p_gains'/'d_gains' (N, nj) and
        # 'init_pos' (N, 3); robots as different as Go1 (kp 20) and B1
        # (kp 100, init z 0.8) need their own gains/spawn heights or the
        # heavy embodiments are born collapsed.
        # axis_name: mesh axis the env batch is sharded over (None = single
        # device). Cross-shard state (curriculum weights, reward-sign test)
        # is psum-synchronized so replicated leaves stay identical.
        self.axis_name = axis_name
        # physics_backend: 'vmap' (per-env engine, CPU default — fast XLA:CPU
        # compiles), 'xla' (env-minor batched), 'pallas' (batched + fused
        # Pallas dynamics kernel, TPU default — ~8x faster substep).
        if physics_backend == "auto":
            import os as _os
            physics_backend = _os.environ.get(
                "WTW_PHYSICS_BACKEND",
                "pallas" if jax.default_backend() == "tpu" else "vmap")
        # multi-embodiment batch (models/multi.py): a per-env RobotModel
        # (leading env axis on every array leaf) mixes Go1/Go2/B1 in one
        # batch — the reference needs one Isaac process per asset. The
        # per-env engine (vmap backend) maps over the model too.
        self.multi = getattr(model.mass, "ndim", 1) == 2
        if self.multi:
            physics_backend = "vmap"
            assert cfg.control.control_type == "P", \
                "multi-embodiment batch uses PD control (per-robot " \
                "actuator nets would need per-env weight stacking)"
            assert default_joint_q_override is not None, \
                "pass per-env default joint angles (robot leg orders " \
                "differ) — use envs.multi_env.make_multi_legged_env"
        self.physics_backend = physics_backend
        self.cfg = cfg
        self.model = model
        # static joint count (model.nj reads an array shape, which is the
        # env axis on a stacked multi-embodiment model)
        self._nj = len(model.joint_names)
        # vmap in_axes for per-env model/defaults (None = shared, classic)
        self._m_ax = 0 if self.multi else None
        self.hf = heightfield if heightfield is not None else flat_heightfield()
        self.num_envs = cfg.env.num_envs
        # eval split: the LAST num_eval_envs envs (base_task.py:43-46)
        self.num_eval_envs = min(cfg.env.num_eval_envs, cfg.env.num_envs - 1)
        self.num_train_envs = self.num_envs - self.num_eval_envs
        self.num_obs = cfg.env.num_observations
        self.num_privileged_obs = cfg.env.num_privileged_obs
        self.num_actions = cfg.env.num_actions
        self.num_obs_history = cfg.env.num_observation_history * self.num_obs
        self.dt = cfg.dt

        self.engine_params = EngineParams(
            dt=jnp.float32(cfg.sim.dt),
            gravity=jnp.asarray(cfg.sim.gravity, jnp.float32),
            contact_stiffness=jnp.float32(cfg.sim.contact_stiffness),
            contact_damping=jnp.float32(cfg.sim.contact_damping),
            friction_vel_eps=jnp.float32(cfg.sim.friction_vel_eps),
            armature=jnp.float32(cfg.sim.armature),
            max_depenetration_velocity=jnp.float32(
                cfg.sim.max_depenetration_velocity))

        self.default_joint_q = (
            jnp.asarray(default_joint_q_override)
            if default_joint_q_override is not None
            else default_joint_angles(
                model, dict(cfg.init_state.default_joint_angles)))
        self._dq_ax = 0 if self.default_joint_q.ndim == 2 else None
        pec = per_env_control or {}
        self.p_gains = (jnp.asarray(pec["p_gains"], jnp.float32)
                        if "p_gains" in pec
                        else jnp.full((self._nj,), cfg.control.stiffness))
        self.d_gains = (jnp.asarray(pec["d_gains"], jnp.float32)
                        if "d_gains" in pec
                        else jnp.full((self._nj,), cfg.control.damping))
        self._pg_ax = 0 if self.p_gains.ndim == 2 else None
        self._init_pos_override = (
            jnp.asarray(pec["init_pos"], jnp.float32)
            if "init_pos" in pec else None)
        # soft position limits (legged_robot.py:603-607)
        m = (model.joint_lower + model.joint_upper) / 2
        r = model.joint_upper - model.joint_lower
        self.soft_pos_limits = jnp.stack(
            [m - 0.5 * r * cfg.rewards.soft_dof_pos_limit,
             m + 0.5 * r * cfg.rewards.soft_dof_pos_limit], axis=-1)
        # hip action scaling mask (legged_robot.py:919-920)
        hip_mask = np.zeros(self._nj, np.float32)
        hip_mask[[0, 3, 6, 9]] = 1.0
        self.action_scale_vec = jnp.asarray(
            cfg.control.action_scale *
            (hip_mask * cfg.control.hip_scale_reduction + (1 - hip_mask)))

        # per-foot lateral side (+1 left / -1 right) from the hip joint y
        # offsets — legs are joints (0,3,6,9) in each robot's own leg order
        # (go1 FR-first, go2 FL-first); consumed by the raibert stance-width
        # nominal (rewards.raibert_heuristic, round-4 sign adjudication).
        # Shape (4,) single-robot, (N, 4) for a multi-embodiment batch.
        self.foot_side = jnp.sign(model.joint_pos[..., (0, 3, 6, 9), 1])

        self.noise_vec = jnp.asarray(observations.noise_scale_vec(cfg))
        self.reward_terms = active_reward_terms(cfg)   # [(name, scale*dt)]
        self.reward_names = [n for n, _ in self.reward_terms]
        self.n_terms = len(self.reward_terms)
        # which command_sums metrics get the +scale bias (legged_robot.py:280-283)
        self.shaped_bias = jnp.asarray(
            [s if n in ("tracking_contacts_shaped_force",
                        "tracking_contacts_shaped_vel") else 0.0
             for n, s in self.reward_terms], jnp.float32)
        self.term_scales = jnp.asarray([s for _, s in self.reward_terms])

        # curriculum machinery
        self.grid = curr.build_grid(cfg.commands)
        self.n_categories = (len(curr.CATEGORIES)
                             if cfg.commands.gaitwise_curricula else 1)
        # success metrics for curriculum update (legged_robot.py:727-732)
        self.curr_metric_idx = []
        self.curr_thresholds = []
        thr = cfg.curriculum_thresholds
        for key, t in [("tracking_lin_vel", thr.tracking_lin_vel),
                       ("tracking_ang_vel", thr.tracking_ang_vel),
                       ("tracking_contacts_shaped_force",
                        thr.tracking_contacts_shaped_force),
                       ("tracking_contacts_shaped_vel",
                        thr.tracking_contacts_shaped_vel)]:
            if key in self.reward_names:
                i = self.reward_names.index(key)
                self.curr_metric_idx.append(i)
                self.curr_thresholds.append(t * float(self.term_scales[i]))
        self.curr_metric_idx = tuple(self.curr_metric_idx)
        self.curr_thresholds = jnp.asarray(self.curr_thresholds)

        # timing (in policy steps; _parse_cfg legged_robot.py:1716-1732)
        self.max_episode_length = cfg.max_episode_length
        # clamp to int32: eval presets use resampling_time=1e9 to freeze
        # commands (eval_metrics.base_set), which must not overflow the
        # int32 episode counters
        _i32 = 2 ** 31 - 1
        self.resample_interval = min(
            int(cfg.commands.resampling_time / self.dt), _i32)
        self.rand_interval = min(
            int(np.ceil(cfg.domain_rand.rand_interval_s / self.dt)), _i32)
        self.push_interval = min(
            int(np.ceil(cfg.domain_rand.push_interval_s / self.dt)), _i32)
        self.grav_interval = min(int(np.ceil(
            cfg.domain_rand.gravity_rand_interval_s / self.dt)), _i32)
        self.grav_duration = int(np.ceil(
            self.grav_interval * cfg.domain_rand.gravity_impulse_duration))
        self.ep_len_for_curriculum = min(self.max_episode_length,
                                         self.resample_interval)

        # env origins: grid for plane (legged_robot.py:1705-1714), terrain
        # origins otherwise (supplied by the terrain generator)
        if env_origins is None:
            n = self.num_envs
            cols = int(np.floor(np.sqrt(n)))
            xx, yy = np.meshgrid(np.arange(int(np.ceil(n / cols))), np.arange(cols),
                                 indexing="ij")
            spacing = 3.0
            org = np.zeros((n, 3), np.float32)
            org[:, 0] = spacing * xx.flatten()[:n]
            org[:, 1] = spacing * yy.flatten()[:n]
            env_origins = org
        self.env_origins = jnp.asarray(env_origins, jnp.float32)

        # init pose height from config (per-env override for mixed batches)
        self.base_init_pos = (
            self._init_pos_override if self._init_pos_override is not None
            else jnp.asarray(cfg.init_state.pos, jnp.float32))
        self._ip_ax = 0 if self.base_init_pos.ndim == 2 else None

        # actuator net (legged_robot.py:1238-1253: torch.jit.load of
        # resources/actuator_nets/unitree_<robot>.pt — here converted .npz
        # weights, see tools/convert_actuator_net.py)
        self.actuator_params = None
        if cfg.control.control_type == "actuator_net":
            from ..models.actuator_net import load_actuator_net
            try:
                self.actuator_params = load_actuator_net(
                    f"actuator_{model.name}")
            except FileNotFoundError:
                self.actuator_params = load_actuator_net(
                    f"actuator_{cfg.asset.robot}")

    # ------------------------------------------------------------------
    # initial state
    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array) -> WorldState:
        cfg = self.cfg
        N = self.num_envs
        nj = self._nj
        keys = jax.random.split(key, N + 1)
        env_keys = keys[1:]

        def init_one(k, origin, dq, ip):
            k, k_dr, k_reset = jax.random.split(k, 3)
            dr = self._sample_rigid_dr(k_dr)
            motor = self._sample_dof_dr(jax.random.fold_in(k_dr, 1))
            phys = self._reset_phys(k_reset, origin, default_q=dq,
                                    init_pos=ip)
            zero_j = jnp.zeros(nj)
            return EnvState(
                phys=phys, rng=k,
                episode_length=jnp.int32(0),
                commands=jnp.zeros(cfg.commands.num_commands),
                env_bin=jnp.int32(0), env_category=jnp.int32(0),
                gait_index=jnp.float32(0.0),
                clock_inputs=jnp.zeros(4), doubletime_clock=jnp.zeros(4),
                halftime_clock=jnp.zeros(4), foot_indices=jnp.zeros(4),
                desired_contact_states=jnp.zeros(4),
                actions=zero_j, last_actions=zero_j, last_last_actions=zero_j,
                joint_pos_target=zero_j, last_joint_pos_target=zero_j,
                last_last_joint_pos_target=zero_j, last_joint_qd=zero_j,
                torques=zero_j,
                lag_buffer=jnp.zeros((cfg.domain_rand.lag_timesteps + 1, nj)),
                joint_pos_err_last=zero_j, joint_pos_err_last_last=zero_j,
                joint_vel_last=zero_j, joint_vel_last_last=zero_j,
                **dr, **motor,
                last_contacts=jnp.zeros(4, bool), feet_air_time=jnp.zeros(4),
                prev_foot_velocities=jnp.zeros((4, 3)),
                episode_sums=jnp.zeros(self.n_terms + 1),
                command_sums=jnp.zeros(self.n_terms + len(EXTRA_CMD_METRICS)),
                env_origin=origin, timed_out=jnp.bool_(False),
            )

        env = jax.vmap(init_one, in_axes=(0, 0, self._dq_ax, self._ip_ax))(
            env_keys, self.env_origins, self.default_joint_q,
            self.base_init_pos)
        world = WorldState(
            env=env,
            curriculum=curr.init_state(cfg.commands, self.grid),
            obs_history=jnp.zeros((N, self.num_obs_history)),
            gravity_offset=jnp.zeros(3),
            common_step=jnp.int32(0),
        )
        # initial command resample for every env (reference reset at startup)
        world = self._resample_commands(world, jnp.ones(N, bool))
        return world

    # ------------------------------------------------------------------
    # domain randomization draws
    # ------------------------------------------------------------------
    def _sample_rigid_dr(self, k) -> Dict[str, jnp.ndarray]:
        """_randomize_rigid_body_props (legged_robot.py:611-633)."""
        dr = self.cfg.domain_rand
        k1, k2, k3, k4 = jax.random.split(k, 4)
        u = lambda kk, lo, hi, shape=(): jax.random.uniform(
            kk, shape, minval=lo, maxval=hi)
        friction = jnp.where(dr.randomize_friction,
                             u(k1, *dr.friction_range), 1.0)
        restitution = jnp.where(dr.randomize_restitution,
                                u(k2, *dr.restitution_range), 0.0)
        payload = jnp.where(dr.randomize_base_mass,
                            u(k3, *dr.added_mass_range), 0.0)
        com = jnp.where(dr.randomize_com_displacement,
                        u(k4, *dr.com_displacement_range, (3,)), jnp.zeros(3))
        return dict(friction=friction, restitution=restitution,
                    payload=payload, com_displacement=com)

    def _sample_dof_dr(self, k) -> Dict[str, jnp.ndarray]:
        """_randomize_dof_props (legged_robot.py:645-665). Motor strength and
        Kp/Kd factors are per-env scalars broadcast over joints (reference
        draws one value per env); motor offset is per-joint."""
        dr = self.cfg.domain_rand
        nj = self._nj
        k1, k2, k3, k4 = jax.random.split(k, 4)
        ms = jnp.where(dr.randomize_motor_strength,
                       jax.random.uniform(k1, (), minval=dr.motor_strength_range[0],
                                          maxval=dr.motor_strength_range[1]), 1.0)
        mo = jnp.where(dr.randomize_motor_offset,
                       jax.random.uniform(k2, (nj,), minval=dr.motor_offset_range[0],
                                          maxval=dr.motor_offset_range[1]),
                       jnp.zeros(nj))
        kp = jnp.where(dr.randomize_Kp_factor,
                       jax.random.uniform(k3, (), minval=dr.Kp_factor_range[0],
                                          maxval=dr.Kp_factor_range[1]), 1.0)
        kd = jnp.where(dr.randomize_Kd_factor,
                       jax.random.uniform(k4, (), minval=dr.Kd_factor_range[0],
                                          maxval=dr.Kd_factor_range[1]), 1.0)
        return dict(motor_strength=jnp.full((nj,), 1.0) * ms,
                    motor_offset=mo,
                    Kp_factor=jnp.full((nj,), 1.0) * kp,
                    Kd_factor=jnp.full((nj,), 1.0) * kd)

    def _reset_phys(self, k, origin, default_q=None,
                    init_pos=None) -> PhysicsState:
        """_reset_dofs + _reset_root_states (legged_robot.py:948-1001).
        default_q / init_pos: per-env overrides when called under vmap in
        a multi-embodiment batch (fall back to the shared vectors)."""
        cfg = self.cfg
        nj = self._nj
        if default_q is None:
            default_q = self.default_joint_q
        if init_pos is None:
            init_pos = self.base_init_pos
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        joint_q = default_q * jax.random.uniform(
            k1, (nj,), minval=0.5, maxval=1.5)
        xy = jax.random.uniform(
            k2, (2,),
            minval=jnp.array([-cfg.terrain.x_init_range, -cfg.terrain.y_init_range]),
            maxval=jnp.array([cfg.terrain.x_init_range, cfg.terrain.y_init_range]))
        pos = origin + init_pos + jnp.concatenate(
            [xy + jnp.array([cfg.terrain.x_init_offset, cfg.terrain.y_init_offset]),
             jnp.zeros(1)])
        yaw = jax.random.uniform(k3, (), minval=-cfg.terrain.yaw_init_range,
                                 maxval=cfg.terrain.yaw_init_range)
        quat = quat_util.quat_from_angle_axis(yaw, jnp.array([0.0, 0, 1.0]))
        vel6 = jax.random.uniform(k4, (6,), minval=-0.5, maxval=0.5)
        return PhysicsState(
            base_pos=pos, base_quat=quat,
            base_lin_vel=vel6[:3], base_ang_vel=vel6[3:],
            joint_q=joint_q, joint_qd=jnp.zeros(nj))

    # ------------------------------------------------------------------
    # command resampling + curriculum update (legged_robot.py:710-824)
    # ------------------------------------------------------------------
    def _resample_commands(self, world: WorldState, mask: jnp.ndarray
                           ) -> WorldState:
        env = world.env
        cfg = self.cfg

        # 1. curriculum update from masked envs' command_sums
        if cfg.commands.command_curriculum and len(self.curr_metric_idx) > 0:
            metrics = env.command_sums[:, jnp.asarray(self.curr_metric_idx)]
            rates = metrics / self.ep_len_for_curriculum
            success = jnp.all(rates > self.curr_thresholds[None, :], axis=-1)
            new_curr = curr.update_weights(
                self.grid, world.curriculum, env.env_category, env.env_bin,
                success, mask, axis_name=self.axis_name)
        else:
            new_curr = world.curriculum

        # 2. new categories + commands for masked envs — batched (same
        # per-env key splits/draws as the vmapped form, asserted by
        # tests/test_curriculum.py::test_batched_sampler_matches_vmap)
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 17))(env.rng)
        ks3 = jax.vmap(lambda k: jax.random.split(k, 3))(keys)   # (N, 3, 2)
        cat = jax.vmap(lambda k: jax.random.randint(
            k, (), 0, self.n_categories))(ks3[:, 0])
        cmd, bin_idx = curr.sample_commands_batched(
            self.grid, new_curr, cat, ks3[:, 1])
        cmd = cmd[:, :cfg.commands.num_commands]
        if cfg.commands.num_commands > 5 and cfg.commands.gaitwise_curricula:
            cmd = curr.apply_gait_category_batched(
                cmd, cat, cfg.commands.binary_phases)
        # zero small xy commands (:820)
        cmd = cmd * jnp.where(
            (jnp.arange(cmd.shape[1]) < 2)[None, :]
            & (jnp.linalg.norm(cmd[:, :2], axis=1)
               <= cfg.commands.vel_deadband)[:, None], 0.0, 1.0)
        new_cmd = jnp.where(mask[:, None], cmd, env.commands)
        new_bin = jnp.where(mask, bin_idx.astype(jnp.int32), env.env_bin)
        new_cat = jnp.where(mask, cat.astype(jnp.int32), env.env_category)

        # 3. zero command_sums for masked envs (:822-824)
        new_cmd_sums = jnp.where(mask[:, None], 0.0, env.command_sums)

        env = env.replace(commands=new_cmd, env_bin=new_bin,
                          env_category=new_cat, command_sums=new_cmd_sums)
        return world.replace(env=env, curriculum=new_curr)

    # ------------------------------------------------------------------
    # torque model (legged_robot.py:907-946)
    # ------------------------------------------------------------------
    def _compute_torques(self, s: EnvState, actions_scaled: jnp.ndarray,
                         batched: bool = False, default_q=None,
                         effort_limit=None, p_gains=None, d_gains=None):
        """One decimation substep's torques; returns (torques, updated lag
        buffer, joint_pos_target, actuator history updates). All math
        broadcasts over an optional leading env axis (batched=True shifts
        the lag-buffer axis). default_q/effort_limit: per-env overrides for
        multi-embodiment batches (callers under vmap thread them)."""
        cfg = self.cfg
        if default_q is None:
            default_q = self.default_joint_q
        if effort_limit is None:
            effort_limit = self.model.effort_limit
        if p_gains is None:
            p_gains = self.p_gains
        if d_gains is None:
            d_gains = self.d_gains
        if cfg.domain_rand.randomize_lag_timesteps:
            if batched:
                lag = jnp.concatenate(
                    [s.lag_buffer[:, 1:], actions_scaled[:, None]], axis=1)
                target = lag[:, 0] + default_q
            else:
                lag = jnp.concatenate(
                    [s.lag_buffer[1:], actions_scaled[None]], axis=0)
                target = lag[0] + default_q
        else:
            lag = s.lag_buffer
            target = actions_scaled + default_q

        q, qd = s.phys.joint_q, s.phys.joint_qd
        if cfg.control.control_type == "actuator_net":
            from ..models.actuator_net import apply_actuator_net
            pos_err = q - target + s.motor_offset
            tau = apply_actuator_net(
                self.actuator_params, pos_err, s.joint_pos_err_last,
                s.joint_pos_err_last_last, qd, s.joint_vel_last,
                s.joint_vel_last_last)
            hist = dict(joint_pos_err_last=pos_err,
                        joint_pos_err_last_last=s.joint_pos_err_last,
                        joint_vel_last=qd,
                        joint_vel_last_last=s.joint_vel_last)
        else:
            tau = (p_gains * s.Kp_factor * (target - q + s.motor_offset)
                   - d_gains * s.Kd_factor * qd)
            hist = {}
        tau = tau * s.motor_strength
        tau = jnp.clip(tau, -effort_limit, effort_limit)
        return tau, lag, target, hist

    # ------------------------------------------------------------------
    # the step
    # ------------------------------------------------------------------
    def step(self, world: WorldState, actions: jnp.ndarray):
        """Vectorized env step. actions: (N, nj). Returns
        (world', obs_dict, rew (N,), done (N,), info dict)."""
        cfg = self.cfg
        model = self.model
        clip_act = cfg.normalization.clip_actions
        actions = jnp.clip(actions, -clip_act, clip_act)

        grav_off = world.gravity_offset

        if self.physics_backend != "vmap":
            # batched env-minor engine (TPU hot path): one call for all envs
            prev_foot_vel = world.env.prev_foot_velocities
            k_next = jax.vmap(lambda k: jax.random.fold_in(k, 3))(
                world.env.rng)
            actions_scaled = actions * self.action_scale_vec

            def substep_b(carry, _, hf_cache=None, return_hf_cache=False):
                s_in = carry
                tau, lag, target, hist = self._compute_torques(
                    s_in, actions_scaled, batched=True)
                res = physics_step_batched(
                    model, self.hf, self.engine_params, s_in.phys, tau,
                    s_in.friction, s_in.restitution,
                    payload_mass=s_in.payload,
                    com_offset=s_in.com_displacement,
                    external_accel=grav_off,
                    backend=self.physics_backend,
                    hf_cache=hf_cache, return_hf_cache=return_hf_cache)
                phys, cinfo = res[0], res[1]
                s_out = s_in.replace(phys=phys, lag_buffer=lag,
                                     joint_pos_target=target, torques=tau,
                                     **hist)
                if return_hf_cache:
                    return s_out, cinfo, res[2]
                return s_out, cinfo

            if getattr(cfg.control, "hf_substep_cache", True) \
                    and not self.hf.is_flat:
                # Python-unrolled substeps: gather terrain corners at
                # substep 0, reuse for the rest of the policy step
                s_c = world.env.replace(actions=actions)
                s_c, cinfo, hfc = substep_b(s_c, None, return_hf_cache=True)
                for _ in range(cfg.control.decimation - 1):
                    s_c, cinfo = substep_b(s_c, None, hf_cache=hfc)
                env = s_c
            else:
                # flat terrain: the gather is a compile-time constant —
                # keep the compact scan form
                env, cinfos = jax.lax.scan(
                    substep_b, world.env.replace(actions=actions), None,
                    length=cfg.control.decimation)
                cinfo = jax.tree.map(lambda x: x[-1], cinfos)
        else:
            def env_step(s: EnvState, action: jnp.ndarray, m: RobotModel,
                         dq: jnp.ndarray, pg: jnp.ndarray, dg: jnp.ndarray):
                k_next = jax.random.fold_in(s.rng, 3)
                prev_foot_vel = s.prev_foot_velocities

                actions_scaled = action * self.action_scale_vec

                def substep(carry, _):
                    s_in = carry
                    tau, lag, target, hist = self._compute_torques(
                        s_in, actions_scaled, default_q=dq,
                        effort_limit=m.effort_limit, p_gains=pg, d_gains=dg)
                    phys, cinfo = physics_step(
                        m, self.hf, self.engine_params, s_in.phys, tau,
                        s_in.friction, s_in.restitution,
                        payload_mass=s_in.payload,
                        com_offset=s_in.com_displacement,
                        external_accel=grav_off)
                    s_out = s_in.replace(phys=phys, lag_buffer=lag,
                                         joint_pos_target=target, torques=tau,
                                         **hist)
                    return s_out, cinfo

                s2, cinfos = jax.lax.scan(substep, s.replace(actions=action),
                                          None, length=cfg.control.decimation)
                cinfo = jax.tree.map(lambda x: x[-1], cinfos)
                return s2, cinfo, prev_foot_vel, k_next

            # multi-embodiment: the per-env model/defaults map with the env
            # axis (in_axes 0); classic single-robot batches pass them
            # unmapped (in_axes None) — identical lowering to the closure
            env, cinfo, prev_foot_vel, k_next = jax.vmap(
                env_step, in_axes=(0, 0, self._m_ax, self._dq_ax,
                                   self._pg_ax, self._pg_ax))(
                world.env, actions, model, self.default_joint_q,
                self.p_gains, self.d_gains)
        env = env.replace(rng=k_next,
                          episode_length=env.episode_length + 1)
        common_step = world.common_step + 1
        world = world.replace(env=env, common_step=common_step)

        # ---- body-frame quantities (legged_robot.py:106-115) ----
        phys = env.phys
        base_lin_vel = quat_util.quat_rotate_inverse(phys.base_quat,
                                                     phys.base_lin_vel)
        base_ang_vel = quat_util.quat_rotate_inverse(phys.base_quat,
                                                     phys.base_ang_vel)
        g_world = jnp.asarray(cfg.sim.gravity) + world.gravity_offset
        g_unit = g_world / jnp.linalg.norm(g_world)
        projected_gravity = quat_util.quat_rotate_inverse(
            phys.base_quat, jnp.broadcast_to(g_unit, phys.base_quat.shape[:-1] + (3,)))

        # ---- callback: resample + gait + push + DR (legged_robot.py:675-708) ----
        resample_mask = (env.episode_length % self.resample_interval) == 0
        world = self._resample_commands(world, resample_mask)
        env = world.env

        if cfg.env.observe_gait_commands:
            g_idx, f_idx, clock, dclock, hclock, desired = jax.vmap(
                lambda gi, c: gait.step_gait(gi, c, self.dt,
                                             cfg.rewards.kappa_gait_probs,
                                             cfg.commands.pacing_offset))(
                env.gait_index, env.commands)
            env = env.replace(gait_index=g_idx, foot_indices=f_idx,
                              clock_inputs=clock, doubletime_clock=dclock,
                              halftime_clock=hclock,
                              desired_contact_states=desired)

        # pushes (legged_robot.py:1017-1026)
        if cfg.domain_rand.push_robots:
            push_mask = (env.episode_length % self.push_interval) == 0
            kp = jax.vmap(lambda k: jax.random.fold_in(k, 5))(env.rng)
            push_vel = jax.vmap(lambda k: jax.random.uniform(
                k, (2,), minval=-cfg.domain_rand.max_push_vel_xy,
                maxval=cfg.domain_rand.max_push_vel_xy))(kp)
            new_lin = jnp.where(push_mask[:, None],
                                jnp.concatenate([push_vel,
                                                 env.phys.base_lin_vel[:, 2:]], -1),
                                env.phys.base_lin_vel)
            env = env.replace(phys=env.phys.replace(base_lin_vel=new_lin))

        # edge wrap-around teleport (_teleport_robots, legged_robot.py:1028-1051)
        if cfg.terrain.teleport_robots and cfg.terrain.mesh_type == "heightfield":
            thresh = cfg.terrain.teleport_thresh
            span_x = cfg.terrain.terrain_length * (cfg.terrain.num_rows - 1)
            hi_x = cfg.terrain.terrain_length * cfg.terrain.num_rows
            span_y = cfg.terrain.terrain_width * (cfg.terrain.num_cols - 1)
            hi_y = cfg.terrain.terrain_width * cfg.terrain.num_cols
            pos = env.phys.base_pos
            x = pos[:, 0] + span_x * (pos[:, 0] < thresh) \
                - span_x * (pos[:, 0] > hi_x - thresh)
            y = pos[:, 1] + span_y * (pos[:, 1] < thresh) \
                - span_y * (pos[:, 1] > hi_y - thresh)
            env = env.replace(phys=env.phys.replace(
                base_pos=jnp.stack([x, y, pos[:, 2]], axis=-1)))

        # periodic dof-property re-randomization (legged_robot.py:697-699)
        dr_mask = (env.episode_length % self.rand_interval) == 0
        kdr = jax.vmap(lambda k: jax.random.fold_in(k, 7))(env.rng)
        new_dof_dr = jax.vmap(self._sample_dof_dr)(kdr)
        dof_upd = {}
        for name, v in new_dof_dr.items():
            dof_upd[name] = jnp.where(dr_mask[:, None], v, getattr(env, name))
        env = env.replace(**dof_upd)

        # global gravity randomization (legged_robot.py:701-705)
        grav_offset = world.gravity_offset
        if cfg.domain_rand.randomize_gravity:
            kg = jax.random.fold_in(jax.random.PRNGKey(0), common_step)
            new_grav = jax.random.uniform(
                kg, (3,), minval=cfg.domain_rand.gravity_range[0],
                maxval=cfg.domain_rand.gravity_range[1])
            grav_offset = jnp.where(common_step % self.grav_interval == 0,
                                    new_grav, grav_offset)
            grav_offset = jnp.where(
                (common_step - self.grav_duration) % self.grav_interval == 0,
                jnp.zeros(3), grav_offset)

        # ---- contact-derived foot state ----
        foot_contact = cinfo.foot_forces[..., 2] > 1.0
        contact_filt = jnp.logical_or(foot_contact, env.last_contacts)
        air_time = env.feet_air_time + self.dt
        first_contact = (air_time > 0) & contact_filt
        new_air_time = jnp.where(contact_filt, 0.0, air_time)

        # ---- termination (legged_robot.py:138-148 + train.py:109-113) ----
        term_contact = cinfo.base_contact > 1.0
        timed_out = env.episode_length >= self.max_episode_length
        reset = term_contact | timed_out
        if cfg.rewards.use_terminal_body_height:
            # measured_heights = 0 unless terrain height sensing is enabled
            body_height = phys.base_pos[:, 2]
            if cfg.terrain.measure_heights:
                hpts = self._height_points(phys.base_pos, phys.base_quat)
                from ..physics.heightfield import height_min3
                mh = jax.vmap(lambda p: height_min3(self.hf, p))(hpts[..., :2])
                body_height = phys.base_pos[:, 2] - jnp.mean(mh, axis=-1)
            reset |= body_height < cfg.rewards.terminal_body_height
        if cfg.rewards.use_terminal_roll_pitch:
            roll, pitch, _ = quat_util.quat_to_euler_xyz(phys.base_quat)
            reset |= (jnp.abs(roll) > cfg.rewards.terminal_body_ori) | (
                jnp.abs(pitch) > cfg.rewards.terminal_body_ori)

        # ---- rewards ----
        ctx = RewardCtx(
            base_pos=phys.base_pos, base_quat=phys.base_quat,
            base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
            projected_gravity=projected_gravity, commands=env.commands,
            joint_q=phys.joint_q, joint_qd=phys.joint_qd,
            last_joint_qd=env.last_joint_qd, torques=env.torques,
            actions=env.actions, last_actions=env.last_actions,
            last_last_actions=env.last_last_actions,
            joint_pos_target=env.joint_pos_target,
            last_joint_pos_target=env.last_joint_pos_target,
            last_last_joint_pos_target=env.last_last_joint_pos_target,
            default_joint_q=jnp.broadcast_to(self.default_joint_q,
                                             phys.joint_q.shape),
            soft_pos_limits=jnp.broadcast_to(
                self.soft_pos_limits, phys.joint_q.shape + (2,)),
            foot_forces=cinfo.foot_forces,
            foot_velocities=cinfo.foot_velocities,
            prev_foot_velocities=prev_foot_vel,
            foot_positions=cinfo.foot_positions,
            desired_contact_states=env.desired_contact_states,
            foot_indices=env.foot_indices, contact_filt=contact_filt,
            thigh_contact=cinfo.thigh_contact, calf_contact=cinfo.calf_contact,
            feet_air_time=air_time, first_contact=first_contact,
            dt=jnp.broadcast_to(jnp.float32(self.dt), phys.base_pos.shape[:-1]),
            foot_side=jnp.broadcast_to(self.foot_side,
                                       phys.base_pos.shape[:-1] + (4,)))

        def one_env_rewards(c):
            vals = [REWARD_FNS[name](c, cfg) for name, _ in self.reward_terms]
            return jnp.stack(vals) if vals else jnp.zeros(0)

        raw_terms = jax.vmap(one_env_rewards)(ctx)           # (N, n_terms)
        scaled = raw_terms * self.term_scales[None, :]

        # ji22-style positive/negative split decided by batch-total sign
        # (legged_robot.py:271-287); under sharding the sign test uses the
        # GLOBAL batch total so all shards agree.
        term_totals = jnp.sum(scaled, axis=0)                # (n_terms,)
        if self.axis_name is not None:
            term_totals = jax.lax.psum(term_totals, self.axis_name)
        term_sign_pos = term_totals >= 0.0
        rew_pos = jnp.sum(jnp.where(term_sign_pos[None, :], scaled, 0.0), -1)
        rew_neg = jnp.sum(jnp.where(term_sign_pos[None, :], 0.0, scaled), -1)
        if cfg.rewards.only_positive_rewards:
            rew = jnp.clip(rew_pos + rew_neg, min=0.0)
        elif cfg.rewards.only_positive_rewards_ji22_style:
            sigma = cfg.rewards.sigma_rew_neg
            if cfg.rewards.sigma_rew_neg_init is not None:
                # annealed penalty sharpness (see RewardsCfg docstring)
                frac = jnp.clip(
                    common_step.astype(jnp.float32)
                    / cfg.rewards.sigma_rew_neg_anneal_steps, 0.0, 1.0)
                sigma = (cfg.rewards.sigma_rew_neg_init
                         + frac * (sigma - cfg.rewards.sigma_rew_neg_init))
            rew = rew_pos * jnp.exp(rew_neg / sigma)
        else:
            rew = rew_pos + rew_neg

        episode_sums = env.episode_sums + jnp.concatenate(
            [scaled, rew[:, None]], axis=-1)
        cmd_metric_tail = jnp.stack([
            base_lin_vel[:, 0], base_ang_vel[:, 2],
            jnp.square(base_lin_vel[:, 0] - env.commands[:, 0]),
            jnp.square(base_ang_vel[:, 2] - env.commands[:, 2]),
            jnp.ones_like(rew)], axis=-1)
        command_sums = env.command_sums + jnp.concatenate(
            [scaled + self.shaped_bias[None, :], cmd_metric_tail], axis=-1)

        env = env.replace(
            last_contacts=foot_contact, feet_air_time=new_air_time,
            prev_foot_velocities=cinfo.foot_velocities,
            episode_sums=episode_sums, command_sums=command_sums,
            timed_out=timed_out)
        world = world.replace(env=env, gravity_offset=grav_offset)

        # ---- episode metrics captured before reset wipes the sums ----
        # split train/eval env populations (ppo_cse/__init__.py:156-180).
        # Proportional per-shard split: under shard_map each shard sees
        # B = num_envs / n_dev rows and takes its own trailing eval slice.
        B_loc = reset.shape[0]
        n_tr_loc = B_loc * self.num_train_envs // self.num_envs
        is_train = (jnp.arange(B_loc) < n_tr_loc)
        reset_tr = reset & is_train
        reset_ev = reset & ~is_train
        n_reset = jnp.sum(reset_tr)
        ep_sums_at_reset = jnp.sum(
            jnp.where(reset_tr[:, None], episode_sums, 0.0), axis=0)
        n_reset_ev = jnp.sum(reset_ev)
        ep_sums_at_reset_ev = jnp.sum(
            jnp.where(reset_ev[:, None], episode_sums, 0.0), axis=0)

        # ---- masked reset (replaces reset_idx, legged_robot.py:150-239) ----
        world = self._reset_envs(world, reset)
        env = world.env

        # ---- observations (after reset, like compute_observations at :124) ----
        obs, priv_obs = self.observe(world, grav_offset)

        # history ring (HistoryWrapper.step, history_wrapper.py:18-24; note
        # the reference does NOT zero history on per-env resets)
        obs_history = jnp.concatenate(
            [world.obs_history[:, self.num_obs:], obs], axis=-1)

        # action history shift (legged_robot.py:126-130)
        env = env.replace(
            last_last_actions=env.last_actions,
            last_actions=env.actions,
            last_last_joint_pos_target=env.last_joint_pos_target,
            last_joint_pos_target=env.joint_pos_target,
            last_joint_qd=env.phys.joint_qd)
        world = world.replace(env=env, obs_history=obs_history)

        obs_dict = {"obs": obs, "privileged_obs": priv_obs,
                    "obs_history": obs_history}
        info = {
            "time_outs": env.timed_out,
            "env_bins": env.env_bin,
            "episode_sums_at_reset": ep_sums_at_reset,
            "num_resets": n_reset,
            "eval_episode_sums_at_reset": ep_sums_at_reset_ev,
            "eval_num_resets": n_reset_ev,
            "curriculum_weights_mean": jnp.mean(world.curriculum.weights,
                                                axis=-1),
            "mean_episode_length": jnp.sum(jnp.where(
                is_train, env.episode_length.astype(jnp.float32), 0.0))
            / max(n_tr_loc, 1),
            "command_ranges": jnp.stack([
                jnp.min(env.commands[:, 0]), jnp.max(env.commands[:, 0]),
                jnp.min(env.commands[:, 2]), jnp.max(env.commands[:, 2])]),
        }
        return world, obs_dict, rew, reset, info

    # ------------------------------------------------------------------
    def _reset_envs(self, world: WorldState, mask: jnp.ndarray) -> WorldState:
        """Masked env reset; the in-scan analog of reset_idx
        (legged_robot.py:150-239)."""
        cfg = self.cfg
        env = world.env

        # resample commands (+ curriculum update) for reset envs
        world = self._resample_commands(world, mask)
        env = world.env

        keys = jax.vmap(lambda k: jax.random.fold_in(k, 11))(env.rng)
        new_phys = jax.vmap(self._reset_phys,
                            in_axes=(0, 0, self._dq_ax, self._ip_ax))(
            keys, env.env_origin, self.default_joint_q,
            self.base_init_pos)
        kdr = jax.vmap(lambda k: jax.random.fold_in(k, 13))(env.rng)
        new_dof = jax.vmap(self._sample_dof_dr)(kdr)

        def mwhere(m, a, b):
            return jnp.where(m.reshape(m.shape + (1,) * (a.ndim - 1)), a, b)

        phys = jax.tree.map(lambda a, b: mwhere(mask, a, b), new_phys, env.phys)
        zero_j = jnp.zeros_like(env.actions)
        env = env.replace(
            phys=phys,
            episode_length=jnp.where(mask, 0, env.episode_length),
            gait_index=jnp.where(mask, 0.0, env.gait_index),
            actions=mwhere(mask, zero_j, env.actions),
            last_actions=mwhere(mask, zero_j, env.last_actions),
            last_last_actions=mwhere(mask, zero_j, env.last_last_actions),
            last_joint_qd=mwhere(mask, zero_j, env.last_joint_qd),
            lag_buffer=mwhere(mask, jnp.zeros_like(env.lag_buffer),
                              env.lag_buffer),
            joint_pos_err_last=mwhere(mask, zero_j, env.joint_pos_err_last),
            joint_pos_err_last_last=mwhere(mask, zero_j,
                                           env.joint_pos_err_last_last),
            joint_vel_last=mwhere(mask, zero_j, env.joint_vel_last),
            joint_vel_last_last=mwhere(mask, zero_j, env.joint_vel_last_last),
            feet_air_time=mwhere(mask, jnp.zeros_like(env.feet_air_time),
                                 env.feet_air_time),
            last_contacts=mwhere(mask, jnp.zeros_like(env.last_contacts),
                                 env.last_contacts),
            motor_strength=mwhere(mask, new_dof["motor_strength"],
                                  env.motor_strength),
            motor_offset=mwhere(mask, new_dof["motor_offset"], env.motor_offset),
            Kp_factor=mwhere(mask, new_dof["Kp_factor"], env.Kp_factor),
            Kd_factor=mwhere(mask, new_dof["Kd_factor"], env.Kd_factor),
            episode_sums=mwhere(mask, jnp.zeros_like(env.episode_sums),
                                env.episode_sums),
        )
        # rigid-body DR re-draw on reset if enabled (legged_robot.py:166-168)
        if cfg.domain_rand.randomize_friction or cfg.domain_rand.randomize_restitution:
            if getattr(cfg.domain_rand, "randomize_rigids_after_start", False):
                kr = jax.vmap(lambda k: jax.random.fold_in(k, 19))(env.rng)
                new_rigid = jax.vmap(self._sample_rigid_dr)(kr)
                env = env.replace(
                    friction=jnp.where(mask, new_rigid["friction"], env.friction),
                    restitution=jnp.where(mask, new_rigid["restitution"],
                                          env.restitution),
                    payload=jnp.where(mask, new_rigid["payload"], env.payload),
                    com_displacement=mwhere(mask, new_rigid["com_displacement"],
                                            env.com_displacement))
        return world.replace(env=env)

    def observe(self, world: WorldState, gravity_offset=None):
        """Build (obs, privileged_obs) from the current state — the pure
        analog of compute_observations (legged_robot.py:302-491). Noise is
        keyed off each env's rng, which advances every step."""
        cfg = self.cfg
        env = world.env
        if gravity_offset is None:
            gravity_offset = world.gravity_offset
        phys = env.phys
        g_world = jnp.asarray(cfg.sim.gravity) + gravity_offset
        g_unit = g_world / jnp.linalg.norm(g_world)
        blv = quat_util.quat_rotate_inverse(phys.base_quat, phys.base_lin_vel)
        bav = quat_util.quat_rotate_inverse(phys.base_quat, phys.base_ang_vel)
        pg = quat_util.quat_rotate_inverse(
            phys.base_quat,
            jnp.broadcast_to(g_unit, phys.base_quat.shape[:-1] + (3,)))

        def build_one(s, blv1, bav1, pg1, dq):
            o = observations.build_obs(
                cfg, projected_gravity=pg1, commands=s.commands,
                joint_q=s.phys.joint_q, joint_qd=s.phys.joint_qd,
                default_joint_q=dq, actions=s.actions,
                last_actions=s.last_actions, clock_inputs=s.clock_inputs,
                gait_index=s.gait_index, base_lin_vel=blv1, base_ang_vel=bav1,
                base_quat=s.phys.base_quat, contact_states=jnp.zeros(4))
            if cfg.noise.add_noise:
                kn = jax.random.fold_in(s.rng, 23)
                o = o + (2 * jax.random.uniform(kn, o.shape) - 1) * self.noise_vec
            p = observations.build_privileged_obs(
                cfg, friction=s.friction, restitution=s.restitution,
                payload=s.payload, com_displacement=s.com_displacement,
                motor_strength=s.motor_strength, motor_offset=s.motor_offset,
                Kp_factor=s.Kp_factor, Kd_factor=s.Kd_factor,
                base_lin_vel=blv1, base_height=s.phys.base_pos[2],
                gravity_offset=gravity_offset, clock_inputs=s.clock_inputs,
                desired_contact_states=s.desired_contact_states)
            return o, p

        obs, priv_obs = jax.vmap(build_one,
                                 in_axes=(0, 0, 0, 0, self._dq_ax))(
            env, blv, bav, pg, self.default_joint_q)
        clip_obs = cfg.normalization.clip_observations
        return (jnp.clip(obs, -clip_obs, clip_obs),
                jnp.clip(priv_obs, -clip_obs, clip_obs))

    def _height_points(self, base_pos, base_quat):
        """Yaw-rotated height measurement grid (legged_robot.py:1756-1770)."""
        x = jnp.asarray(self.cfg.terrain.measured_points_x)
        y = jnp.asarray(self.cfg.terrain.measured_points_y)
        gx, gy = jnp.meshgrid(x, y, indexing="ij")
        pts = jnp.stack([gx.reshape(-1), gy.reshape(-1),
                         jnp.zeros_like(gx).reshape(-1)], -1)   # (P, 3)
        rotated = jax.vmap(
            lambda q, p: quat_util.quat_apply_yaw(
                jnp.broadcast_to(q, (pts.shape[0], 4)), pts) + p[None, :]
        )(base_quat, base_pos)
        return rotated

    def get_observations(self, world: WorldState):
        """HistoryWrapper.get_observations analog (history_wrapper.py:26-30):
        appends the current obs to the history ring and returns the dict."""
        obs, priv_obs = self.observe(world)
        obs_history = jnp.concatenate(
            [world.obs_history[:, self.num_obs:], obs], axis=-1)
        world = world.replace(obs_history=obs_history)
        return world, {"obs": obs, "privileged_obs": priv_obs,
                       "obs_history": obs_history}
