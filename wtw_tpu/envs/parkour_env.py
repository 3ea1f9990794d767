"""Parkour environment with Constraints-as-Terminations (Stack B).

Re-design of the reference's Go2Parkour VecTask (tasks/go2_parkour.py:21-1697)
as a pure-function env over explicit state:

- composable flag-driven observation blocks with strided obs history
  (prepare_*_functions :505-545, compute_observations :576-620);
- PD torques + stiction/viscous motor-friction randomization inside the
  decimation loop (pre_physics_step :1218-1265);
- the full CaT constraint battery (compute_constraints_cat :849-1029)
  producing a PROBABILISTIC `reset_buf` (float termination probabilities fed
  to the learner's GAE) and a hard `reset_env_buf` (:1024-1025);
- velocity-tracking-only reward (compute_reward :814-847);
- terrain-level promotion with move_up flags (update_terrain_level
  :1158-1186, flag at :1325-1327);
- stochastic command resampling / ang-vel flips / lava-avoidance y commands
  / zero-command episodes (:1362-1402);
- ceiling tracking for crawl cells (:1313-1316) with real overhead contact
  via the engine's hf_ceiling.

Everything is fixed-shape masked array ops; vmap over envs, lax.scan over
the decimation loop.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models.robot import RobotModel, default_joint_angles
from ..physics import EngineParams, HeightField, PhysicsState
from ..physics.engine import physics_step
from ..physics.batched import physics_step_batched
from ..physics.heightfield import height_min3
from ..terrain import (ParkourTerrainCfg, assign_parkour_origins,
                       build_parkour, ceiling_heightfield, to_heightfield)
from ..utils import quat as quat_util
from .constraints import CaTManager, CaTState, sqrt_func

GO2_DEFAULT_JOINT_ANGLES = (
    ("FL_hip_joint", 0.1), ("RL_hip_joint", 0.1), ("FR_hip_joint", -0.1),
    ("RR_hip_joint", -0.1), ("FL_thigh_joint", 0.8), ("RL_thigh_joint", 1.0),
    ("FR_thigh_joint", 0.8), ("RR_thigh_joint", 1.0), ("FL_calf_joint", -1.5),
    ("RL_calf_joint", -1.5), ("FR_calf_joint", -1.5), ("RR_calf_joint", -1.5),
)  # cfg/task/Go2Parkour.yaml defaultJointAngles


@dataclass(frozen=True)
class ParkourLimits:
    # cfg/task/Go2Parkour.yaml learn.limits (:139-152)
    torque: float = 35.0
    vel: float = 16.0
    action_rate: float = 120.0
    base_orientation: float = 0.1
    foot_contact_force: float = 120.0
    HFE: float = 1.9
    HFE_min: float = -0.2
    HAA: float = 0.3
    min_base_height: float = 0.06
    heading: float = 0.1
    KFE_min: float = -2.8       # hard-coded at go2_parkour.py:920


@dataclass(frozen=True)
class TerrainRewardScales:
    """Full reward battery for the rough-terrain task when CaT is off
    (tasks/go2_terrain.py:43-74 / compute_reward :1024-1090). Values from
    cfg/task/Go2Terrain.yaml."""
    termination: float = 0.0
    lin_vel_xy: float = 1.0
    ang_vel_z: float = 0.5
    lin_vel_z: float = -4.0
    ang_vel_xy: float = -0.05
    orient: float = -1.0
    base_height: float = 0.0
    torque: float = -0.00002
    joint_acc: float = -0.0005
    air_time: float = 1.0
    collision: float = -0.25
    stumble: float = -2.0
    action_rate: float = -0.01
    dof_pos: float = -0.1
    dof_vel_limit: float = -0.1
    hip: float = -0.1
    raibert: float = -10.0
    foot2contact: float = 0.0
    stand_still: float = 0.0


@dataclass(frozen=True)
class ParkourCfg:
    # cfg/task/Go2Parkour.yaml; with task='terrain' this becomes the
    # Go2Terrain rough-terrain task (tasks/go2_terrain.py + Go2Terrain.yaml)
    robot: str = "go2"
    task: str = "parkour"            # 'parkour' | 'terrain'
    num_envs: int = 4096
    num_actions: int = 12
    # terrain-task extras (tasks/go2_terrain.py)
    use_gait_clocks: bool = False    # fixed 3 Hz trot clock (:582-611)
    observe_clock_inputs: bool = False
    use_actuator_net: bool = False   # unitree_go2 net (:177-203)
    reward_mode: str = "cat"         # 'cat' | 'full'
    provide_true_next_obs: bool = False  # go2_terrain.py:734 (off-policy)
    terrain_rewards: "TerrainRewardScales" = dataclasses.field(
        default_factory=TerrainRewardScales)
    rough_terrain: object = None     # TerrainCfg for task='terrain'
    num_history_samples: int = 1      # numHistorySamples
    num_history_step: int = 1         # numHistoryStep (0 in yaml == 1 in effect)
    episode_length_s: float = 25.0
    # commands (randomCommandVelocityRanges)
    lin_vel_x: Tuple[float, float] = (0.0, 0.6)
    lin_vel_y: Tuple[float, float] = (-0.6, 0.6)
    ang_vel_yaw: Tuple[float, float] = (-0.78, 0.78)
    only_forwards: bool = False
    only_forwards_velocity: float = 0.6
    # control
    stiffness: float = 20.0
    damping: float = 0.5
    action_scale: float = 0.25
    decimation: int = 4
    # reuse policy-step-start terrain corner rows across the decimation
    # substeps (see ControlCfg.hf_substep_cache in config.py)
    hf_substep_cache: bool = True
    torque_clip: float = 100.0        # hard clip (pre_physics_step :1237)
    # divergence guard: PhysX clamps depenetration velocity, so the
    # reference can never see a blown-up state; our implicit spring-damper
    # solver can diverge for a single env on deep penetration at track
    # discontinuities (gap/hurdle edges). A diverged env is terminated and
    # reset like an instant fall; limits are far above any physical value
    # so the guard never fires in healthy training.
    divergence_lin_vel_limit: float = 100.0    # m/s
    divergence_joint_vel_limit: float = 1000.0  # rad/s
    # rewards (learn block)
    lin_vel_xy_scale: float = 1.0
    ang_vel_z_scale: float = 0.5
    lin_vel_delta: float = 0.25
    ang_vel_delta: float = 0.25
    survival_bonus: float = 0.5
    # constraints (learn.constraints_CaT + limits)
    cat_tau: float = 0.95
    cat_min_p: float = 0.0
    soft_p: float = 0.1
    use_soft_p_curriculum: bool = True
    soft_p_total_steps: int = 24 * 8000  # horizon_length * max_epochs
    air_time_target: float = 0.25
    limits: ParkourLimits = dataclasses.field(default_factory=ParkourLimits)
    allow_knee_contacts: bool = False
    flat_terrain_threshold: float = 0.001
    vel_deadzone: float = 0.2
    base_height_target: float = 0.245
    # observations (learn.observe flags :160-172)
    observe_base_lin_vel: bool = False
    observe_base_ang_vel: bool = True
    observe_commands: bool = True
    observe_misc: bool = True
    observe_heights: bool = True
    observe_ceilings: bool = True
    observe_phases: bool = False
    observe_imu: bool = False
    measured_points_step: float = 0.08
    measured_points_x: Tuple[int, ...] = tuple(range(-3, 10))
    measured_points_y: Tuple[int, ...] = tuple(range(-5, 6))
    phases_freq: float = 2.0
    # scales
    lin_vel_scale: float = 2.0
    ang_vel_scale: float = 0.25
    dof_pos_scale: float = 1.0
    dof_vel_scale: float = 0.05
    height_meas_scale: float = 5.0
    imu_scale: float = 0.1
    # noise
    add_noise: bool = True
    noise_level: float = 1.0
    dof_pos_noise: float = 0.01
    dof_vel_noise: float = 0.2
    lin_vel_noise: float = 0.0
    ang_vel_noise: float = 0.001
    gravity_noise: float = 0.05
    height_meas_noise: float = 0.01
    # domain randomization
    randomize_friction: bool = True
    friction_range: Tuple[float, float] = (0.5, 1.25)
    randomize_motor_friction: bool = True
    mu_v_range: Tuple[float, float] = (0.0, 0.3)
    Fs_range: Tuple[float, float] = (0.0, 2.5)
    push_robots: bool = True
    push_interval_s: float = 8.0
    # sim
    dt: float = 0.005
    contact_stiffness: float = 10_000.0
    contact_damping: float = 300.0
    armature: float = 0.01
    # terrain
    terrain: ParkourTerrainCfg = dataclasses.field(
        default_factory=ParkourTerrainCfg)
    init_pos: Tuple[float, float, float] = (0.0, 0.0, 0.34)

    @property
    def policy_dt(self) -> float:
        return self.decimation * self.dt

    @property
    def max_episode_length(self) -> int:
        return int(np.ceil(self.episode_length_s / self.policy_dt))


@struct.dataclass
class ParkourEnvState:
    phys: PhysicsState
    rng: jax.Array
    progress: jnp.ndarray            # int32 episode step
    commands: jnp.ndarray            # (3,) world-frame vx, vy, wz
    actions: jnp.ndarray
    last_actions: jnp.ndarray
    last_last_actions: jnp.ndarray   # terrain action_rate 2nd diff (:1058)
    last_joint_qd: jnp.ndarray       # joint_acc reward (:1047)
    last_base_lin_vel: jnp.ndarray   # (3,) world; imu accel obs (:864-868)
    torques: jnp.ndarray
    # gait clock (terrain task, go2_terrain.py:582-611)
    gait_index: jnp.ndarray
    clock_inputs: jnp.ndarray        # (4,)
    foot_indices: jnp.ndarray        # (4,)
    # actuator-net joint-state history (go2_terrain.py:1480-1490)
    joint_pos_err_last: jnp.ndarray
    joint_pos_err_last_last: jnp.ndarray
    joint_vel_last: jnp.ndarray
    joint_vel_last_last: jnp.ndarray
    # per-episode DR draws
    friction: jnp.ndarray
    motor_Fs: jnp.ndarray            # (nj,) stiction torque
    motor_mu_v: jnp.ndarray          # (nj,) viscous coefficient
    # contact bookkeeping (process_contacts :1187-1209)
    feet_swing_time: jnp.ndarray     # (4,)
    feet_swing_apex: jnp.ndarray
    feet_clearance: jnp.ndarray
    # terrain curriculum
    terrain_level: jnp.ndarray       # int32
    terrain_type: jnp.ndarray        # int32
    env_origin: jnp.ndarray          # (3,)
    move_up_flag: jnp.ndarray        # bool
    # episode metric accumulators: [rew_lin_vel, rew_ang_vel, cstr_0..n-1]
    episode_sums: jnp.ndarray
    timed_out: jnp.ndarray


@struct.dataclass
class ParkourWorld:
    env: ParkourEnvState             # batched (N, ...)
    cat: CaTState
    soft_p_progress: jnp.ndarray     # scalar in [0, 1]
    hist_obs: jnp.ndarray            # (N, hist_len * sample_obs)
    common_step: jnp.ndarray


# constraint battery declaration (names + column widths), in the exact
# order the reference adds them (go2_parkour.py:976-1016)
def _constraint_decls(nj: int):
    return [
        ("heading", 1), ("stumble", 4),
        ("dof_pos_lower", nj), ("dof_pos_upper", nj),
        ("torque", nj), ("joint_vel", nj), ("action_rate", nj),
        ("knee_contact", 4), ("base_contact", 1), ("foot_contact", 4),
        ("upsidedown", 1), ("lava", 1),
        ("HFE", 2), ("HFE_min", 2), ("KFE", 4), ("KFE_min", 4), ("HAA", 4),
        ("base_ori", 1), ("air_time", 4), ("no_move", 1),
        ("2footcontact", 1),
    ]


class ParkourEnv:
    """Pure-function parkour env. step(world, actions) ->
    (world', obs (N, obs_dim), rew (N,), done_prob (N,), info)."""

    def __init__(self, cfg: ParkourCfg, model: RobotModel,
                 seed: int = 0, axis_name: str | None = None,
                 physics_backend: str = "auto"):
        self.cfg = cfg
        self.model = model
        self.axis_name = axis_name
        # see LeggedEnv: 'vmap' on CPU, fused-Pallas batched engine on TPU
        if physics_backend == "auto":
            import os as _os
            physics_backend = _os.environ.get(
                "WTW_PHYSICS_BACKEND",
                "pallas" if jax.default_backend() == "tpu" else "vmap")
        self.physics_backend = physics_backend
        self.num_envs = cfg.num_envs
        self.num_actions = cfg.num_actions
        self.dt = cfg.policy_dt
        self.max_episode_length = cfg.max_episode_length

        if cfg.task == "terrain":
            # rough-terrain task: stack-A style slope/stair/obstacle grid
            # (tasks/terrain.py) — no ceilings, no lava
            from ..terrain import assign_env_origins, build_terrain
            from ..config import TerrainCfg
            tcfg = cfg.rough_terrain or TerrainCfg(
                curriculum=True, num_rows=10, num_cols=20,
                border_size=8.0, center_robots=False,
                max_init_terrain_level=0,
                terrain_proportions=(0.2, 0.2, 0.2, 0.2, 0.2, 0, 0, 0, 0))
            tm = build_terrain(tcfg, seed=seed)
            origins, levels, types = assign_env_origins(
                tm, cfg.num_envs, tcfg, seed=seed)
            self.hf_ceiling = None
            self.terrain_ceilings = jnp.full(
                (tm.num_rows, tm.num_cols), cfg.terrain.default_ceiling)
            self.track_length = tcfg.terrain_length
            self.num_terrain_levels = tm.num_rows
        else:
            tm = build_parkour(cfg.terrain, seed=seed)
            self.hf_ceiling = ceiling_heightfield(tm)
            origins, levels, types = assign_parkour_origins(
                tm, cfg.num_envs, cfg.terrain, seed=seed)
            self.terrain_ceilings = jnp.asarray(tm.ceilings)  # (lvl, type)
            self.track_length = cfg.terrain.map_length
            self.num_terrain_levels = cfg.terrain.num_levels
        self.hf = to_heightfield(tm)
        self.init_origins = jnp.asarray(origins)
        self.init_levels = jnp.asarray(levels)
        self.init_types = jnp.asarray(types)
        self.terrain_origins = jnp.asarray(tm.env_origins)   # (lvl, type, 3)

        self.engine_params = EngineParams(
            dt=jnp.float32(cfg.dt),
            contact_stiffness=jnp.float32(cfg.contact_stiffness),
            contact_damping=jnp.float32(cfg.contact_damping),
            armature=jnp.float32(cfg.armature))
        self.default_joint_q = default_joint_angles(
            model, dict(GO2_DEFAULT_JOINT_ANGLES))
        self.base_init_pos = jnp.asarray(cfg.init_pos, jnp.float32)

        # height-scan grid, robot frame (learn.measured_points_* :167-169)
        xs = np.asarray(cfg.measured_points_x) * cfg.measured_points_step
        ys = np.asarray(cfg.measured_points_y) * cfg.measured_points_step
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        self.height_points = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], -1),
            jnp.float32)
        self.num_height_points = gx.size

        # optional learned actuator model (go2_terrain.py:177-203)
        self.actuator_params = None
        if cfg.use_actuator_net:
            from ..models.actuator_net import load_actuator_net
            self.actuator_params = load_actuator_net(f"actuator_{cfg.robot}")

        self.cstr = CaTManager(_constraint_decls(model.nj),
                               tau=cfg.cat_tau, min_p=cfg.cat_min_p,
                               axis_name=axis_name)
        self.cstr_names = list(self.cstr.names)
        self.n_metrics = 2 + len(self.cstr_names)

        # observation layout
        self.sample_obs_size = self._sample_obs_dim()
        self.hist_len = max(cfg.num_history_samples, 1) * max(
            cfg.num_history_step, 1)
        self.num_obs = cfg.num_history_samples * self.sample_obs_size
        self.noise_vec = jnp.asarray(self._noise_vec(), jnp.float32)

    # ------------------------------------------------------------------
    def _sample_obs_dim(self) -> int:
        cfg = self.cfg
        n = 0
        if cfg.observe_base_lin_vel:
            n += 3
        if cfg.observe_base_ang_vel:
            n += 3
        if cfg.observe_commands:
            n += 3
        if cfg.observe_misc:
            n += 3 + 3 * self.model.nj      # projected gravity + q + qd + actions
        if cfg.observe_heights:
            n += self.num_height_points
        if cfg.observe_ceilings:
            n += 1
        if cfg.observe_phases:
            n += 8
        if cfg.observe_imu:
            n += 3
        if cfg.observe_clock_inputs:
            n += 4
        return n

    def _noise_vec(self) -> np.ndarray:
        """get_noise_scale_vec analog (go2_parkour.py:610-574 yaml noise)."""
        cfg = self.cfg
        nj = self.model.nj
        parts = []
        if cfg.observe_base_lin_vel:
            parts.append(np.full(3, cfg.lin_vel_noise * cfg.lin_vel_scale))
        if cfg.observe_base_ang_vel:
            parts.append(np.full(3, cfg.ang_vel_noise * cfg.ang_vel_scale))
        if cfg.observe_commands:
            parts.append(np.zeros(3))
        if cfg.observe_misc:
            parts.append(np.concatenate([
                np.full(3, cfg.gravity_noise),
                np.full(nj, cfg.dof_pos_noise * cfg.dof_pos_scale),
                np.full(nj, cfg.dof_vel_noise * cfg.dof_vel_scale),
                np.zeros(nj)]))
        if cfg.observe_heights:
            parts.append(np.full(self.num_height_points,
                                 cfg.height_meas_noise * cfg.height_meas_scale))
        if cfg.observe_ceilings:
            parts.append(np.zeros(1))
        if cfg.observe_phases:
            parts.append(np.zeros(8))
        if cfg.observe_imu:
            parts.append(np.zeros(3))
        if cfg.observe_clock_inputs:
            parts.append(np.zeros(4))
        return np.concatenate(parts).astype(np.float32) * cfg.noise_level

    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array) -> ParkourWorld:
        cfg = self.cfg
        N, nj = self.num_envs, self.model.nj
        keys = jax.random.split(key, N)

        def init_one(k, origin, lvl, typ):
            k1, k2, k3 = jax.random.split(k, 3)
            phys = self._reset_phys(k1, origin)
            zero_j = jnp.zeros(nj)
            return ParkourEnvState(
                phys=phys, rng=k, progress=jnp.int32(0),
                commands=self._sample_commands(k2),
                actions=zero_j, last_actions=zero_j,
                last_last_actions=zero_j, last_joint_qd=zero_j,
                last_base_lin_vel=jnp.zeros(3),
                torques=zero_j,
                gait_index=jnp.float32(0.0), clock_inputs=jnp.zeros(4),
                foot_indices=jnp.zeros(4),
                joint_pos_err_last=zero_j, joint_pos_err_last_last=zero_j,
                joint_vel_last=zero_j, joint_vel_last_last=zero_j,
                **self._sample_dr(k3),
                feet_swing_time=jnp.zeros(4), feet_swing_apex=jnp.zeros(4),
                feet_clearance=jnp.zeros(4),
                terrain_level=lvl, terrain_type=typ, env_origin=origin,
                move_up_flag=jnp.bool_(False),
                episode_sums=jnp.zeros(self.n_metrics),
                timed_out=jnp.bool_(False))

        env = jax.vmap(init_one)(keys, self.init_origins, self.init_levels,
                                 self.init_types)
        return ParkourWorld(
            env=env, cat=self.cstr.init_state(),
            soft_p_progress=jnp.float32(0.0),
            hist_obs=jnp.zeros((N, self.hist_len * self.sample_obs_size)),
            common_step=jnp.int32(0))

    def _sample_dr(self, k) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        nj = self.model.nj
        k1, k2, k3 = jax.random.split(k, 3)
        friction = jnp.where(
            cfg.randomize_friction,
            jax.random.uniform(k1, (), minval=cfg.friction_range[0],
                               maxval=cfg.friction_range[1]), 1.0)
        Fs = jnp.where(cfg.randomize_motor_friction,
                       jax.random.uniform(k2, (nj,), minval=cfg.Fs_range[0],
                                          maxval=cfg.Fs_range[1]),
                       jnp.zeros(nj))
        mu_v = jnp.where(cfg.randomize_motor_friction,
                         jax.random.uniform(k3, (nj,), minval=cfg.mu_v_range[0],
                                            maxval=cfg.mu_v_range[1]),
                         jnp.zeros(nj))
        return dict(friction=friction, motor_Fs=Fs, motor_mu_v=mu_v)

    def _reset_phys(self, k, origin) -> PhysicsState:
        """reset_idx state randomization (go2_parkour.py:1039-1057)."""
        nj = self.model.nj
        k1, k2, k3, k4 = jax.random.split(k, 4)
        joint_q = self.default_joint_q * jax.random.uniform(
            k1, (nj,), minval=0.95, maxval=1.05)
        joint_qd = jax.random.uniform(k2, (nj,), minval=-0.05, maxval=0.05)
        xy = jax.random.uniform(k3, (2,), minval=-0.05, maxval=0.05)
        yaw_half = jax.random.uniform(k4, (), minval=-0.001, maxval=0.001)
        quat = jnp.array([0.0, 0.0, 0.0, 0.0]).at[2].set(
            jnp.sin(yaw_half)).at[3].set(jnp.cos(yaw_half))
        pos = origin + self.base_init_pos + jnp.concatenate([xy, jnp.zeros(1)])
        return PhysicsState(
            base_pos=pos, base_quat=quat,
            base_lin_vel=jnp.zeros(3), base_ang_vel=jnp.zeros(3),
            joint_q=joint_q, joint_qd=joint_qd)

    def _sample_commands(self, k) -> jnp.ndarray:
        """resample_commands (go2_parkour.py:1127-1156): vx, vy uniform;
        wz = 0 at resample (flipped stochastically later); deadzone zeroing."""
        cfg = self.cfg
        k1, k2 = jax.random.split(k)
        vx = jax.random.uniform(k1, (), minval=cfg.lin_vel_x[0],
                                maxval=cfg.lin_vel_x[1])
        vy = jax.random.uniform(k2, (), minval=cfg.lin_vel_y[0],
                                maxval=cfg.lin_vel_y[1])
        if cfg.only_forwards:
            return jnp.array([cfg.only_forwards_velocity, 0.0, 0.0])
        cmd = jnp.array([vx, vy, 0.0])
        keep_lin = (jnp.linalg.norm(cmd[:2]) > cfg.vel_deadzone) & (
            cmd[0] > cfg.vel_deadzone)
        return cmd.at[:2].multiply(keep_lin.astype(jnp.float32))

    # ------------------------------------------------------------------
    def _robot_command(self, base_quat, commands):
        """World xy command rotated into the yaw frame (get_robot_command,
        go2_parkour.py:622-631). (N,4),(N,3) -> (N,3)."""
        yaw = quat_util.quat_yaw(base_quat)
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        vx = c * commands[..., 0] + s * commands[..., 1]
        vy = -s * commands[..., 0] + c * commands[..., 1]
        return jnp.stack([vx, vy, commands[..., 2]], axis=-1)

    def _measured_heights(self, base_pos, base_quat):
        """Yaw-rotated grid raycast (get_heights; go2_parkour.py:1600-1650):
        (N,) -> (N, P) terrain heights under the scan points."""
        pts = jax.vmap(lambda q, p: quat_util.quat_apply_yaw(
            jnp.broadcast_to(q, (self.num_height_points, 4)),
            self.height_points) + p[None, :])(base_quat, base_pos)
        return jax.vmap(lambda p: height_min3(self.hf, p[..., :2]))(pts)

    # ------------------------------------------------------------------
    def step(self, world: ParkourWorld, actions: jnp.ndarray):
        cfg = self.cfg
        model = self.model
        nj = model.nj
        # batch size from the data, not cfg: under shard_map each shard
        # sees num_envs / n_devices rows
        N = actions.shape[0]

        # ---- decimation loop: PD or actuator net + motor friction ----
        # torque math broadcasts over an optional leading env axis, so it is
        # shared between the vmap path and the batched-engine path
        def compute_tau(s_in, action):
            q, qd = s_in.phys.joint_q, s_in.phys.joint_qd
            target = cfg.action_scale * action + self.default_joint_q
            if cfg.use_actuator_net:
                from ..models.actuator_net import apply_actuator_net
                pos_err = q - target
                tau = apply_actuator_net(
                    self.actuator_params, pos_err, s_in.joint_pos_err_last,
                    s_in.joint_pos_err_last_last, qd, s_in.joint_vel_last,
                    s_in.joint_vel_last_last)
                hist = dict(joint_pos_err_last=pos_err,
                            joint_pos_err_last_last=s_in.joint_pos_err_last,
                            joint_vel_last=qd,
                            joint_vel_last_last=s_in.joint_vel_last)
            else:
                tau = cfg.stiffness * (target - q) - cfg.damping * qd
                hist = {}
            tau = jnp.clip(tau, -cfg.torque_clip, cfg.torque_clip)
            # stiction + viscous motor friction (:1242-1245)
            tau = tau - (s_in.motor_Fs * jnp.tanh(qd / 0.1)
                         + s_in.motor_mu_v * qd)
            return tau, hist

        if self.physics_backend != "vmap":
            k_next = jax.vmap(lambda k: jax.random.fold_in(k, 3))(
                world.env.rng)

            def substep_b(carry, _, hf_cache=None, return_hf_cache=False):
                s_in = carry
                tau, hist = compute_tau(s_in, actions)
                res = physics_step_batched(
                    model, self.hf, self.engine_params, s_in.phys, tau,
                    s_in.friction, jnp.float32(0.0),
                    hf_ceiling=self.hf_ceiling,
                    backend=self.physics_backend,
                    hf_cache=hf_cache, return_hf_cache=return_hf_cache)
                s_out = s_in.replace(phys=res[0], torques=tau, **hist)
                return (s_out, res[1], res[2]) if return_hf_cache \
                    else (s_out, res[1])

            if getattr(cfg, "hf_substep_cache", True) and not self.hf.is_flat:
                # unrolled substeps reusing the policy-step-start terrain
                # corner rows (see ControlCfg.hf_substep_cache)
                s_c = world.env.replace(actions=actions)
                s_c, cinfo, hfc = substep_b(s_c, None, return_hf_cache=True)
                for _ in range(cfg.decimation - 1):
                    s_c, cinfo = substep_b(s_c, None, hf_cache=hfc)
                env = s_c
            else:
                env, cinfos = jax.lax.scan(
                    substep_b, world.env.replace(actions=actions), None,
                    length=cfg.decimation)
                cinfo = jax.tree.map(lambda x: x[-1], cinfos)
        else:
            def env_step(s: ParkourEnvState, action):
                k_next = jax.random.fold_in(s.rng, 3)

                def substep(carry, _):
                    s_in = carry
                    tau, hist = compute_tau(s_in, action)
                    phys, cinfo = physics_step(
                        model, self.hf, self.engine_params, s_in.phys, tau,
                        s_in.friction, jnp.float32(0.0),
                        hf_ceiling=self.hf_ceiling)
                    return s_in.replace(phys=phys, torques=tau, **hist), cinfo

                s2, cinfos = jax.lax.scan(
                    substep, s.replace(actions=action), None,
                    length=cfg.decimation)
                cinfo = jax.tree.map(lambda x: x[-1], cinfos)
                return s2, cinfo, k_next

            env, cinfo, k_next = jax.vmap(env_step)(world.env, actions)
        env = env.replace(rng=k_next, progress=env.progress + 1)
        common_step = world.common_step + 1

        phys = env.phys
        # ---- divergence guard (see ParkourCfg.divergence_*): a blown-up
        # solver state would otherwise poison the CaT running maxes, the
        # obs normalizer and the learner with NaN through the reward path.
        # Detect it here, zero its reward/constraint contributions below,
        # and hard-terminate so the masked reset restores finite state. ----
        finite_state = (jnp.all(jnp.isfinite(phys.base_pos), -1)
                        & jnp.all(jnp.isfinite(phys.base_quat), -1)
                        & jnp.all(jnp.isfinite(phys.base_lin_vel), -1)
                        & jnp.all(jnp.isfinite(phys.base_ang_vel), -1)
                        & jnp.all(jnp.isfinite(phys.joint_q), -1)
                        & jnp.all(jnp.isfinite(phys.joint_qd), -1))
        in_bounds = ((jnp.max(jnp.abs(phys.base_lin_vel), -1)
                      < cfg.divergence_lin_vel_limit)
                     & (jnp.max(jnp.abs(phys.joint_qd), -1)
                        < cfg.divergence_joint_vel_limit))
        diverged = ~(finite_state & in_bounds)
        base_lin_vel = quat_util.quat_rotate_inverse(phys.base_quat,
                                                     phys.base_lin_vel)
        base_ang_vel = quat_util.quat_rotate_inverse(phys.base_quat,
                                                     phys.base_ang_vel)
        g_unit = jnp.array([0.0, 0.0, -1.0])
        projected_gravity = quat_util.quat_rotate_inverse(
            phys.base_quat,
            jnp.broadcast_to(g_unit, phys.base_quat.shape[:-1] + (3,)))

        # ---- pushes (push_robots :1211-1216) ----
        if cfg.push_robots:
            push_prob = self.dt / cfg.push_interval_s
            kp = jax.vmap(lambda k: jax.random.fold_in(k, 5))(env.rng)
            do_push = jax.vmap(lambda k: jax.random.bernoulli(
                k, push_prob))(kp)
            dv = jax.vmap(lambda k: jax.random.uniform(
                k, (6,), minval=-0.5, maxval=0.5))(
                jax.vmap(lambda k: jax.random.fold_in(k, 6))(kp))
            new_lin = phys.base_lin_vel + dv[:, :3] * do_push[:, None]
            new_ang = phys.base_ang_vel + dv[:, 3:] * do_push[:, None]
            env = env.replace(phys=phys.replace(base_lin_vel=new_lin,
                                                base_ang_vel=new_ang))
            phys = env.phys

        # ---- fixed-trot gait clock (terrain task, go2_terrain.py:582-611) ----
        if cfg.use_gait_clocks:
            from . import gait as gait_mod
            pseudo_cmd = jnp.broadcast_to(
                jnp.array([0, 0, 0, 0, 3.0, 0.5, 0.0, 0.0, 0.5,
                           0, 0, 0, 0, 0, 0], jnp.float32), (N, 15))
            g_idx, f_idx, clock, _, _, _ = jax.vmap(
                lambda gi, c: gait_mod.step_gait(gi, c, self.dt, 0.07))(
                env.gait_index, pseudo_cmd)
            env = env.replace(gait_index=g_idx, foot_indices=f_idx,
                              clock_inputs=clock)

        # ---- heights / ceilings / flat-terrain flags (:1308-1322) ----
        measured_heights = self._measured_heights(phys.base_pos, phys.base_quat)
        pos_x = jnp.mod(phys.base_pos[:, 0], self.track_length)
        crawling_on = (((pos_x > 1.55) & (pos_x < 3.45)) |
                       ((pos_x > 5.55) & (pos_x < 7.45))).astype(jnp.float32)
        cell_ceiling = self.terrain_ceilings[env.terrain_level, env.terrain_type]
        ceilings = crawling_on * cell_ceiling + (1.0 - crawling_on) * 0.4
        heights_var = jnp.var(measured_heights, axis=1)
        # relative base height over the scan (lava cells have absolute z<0)
        base_z = phys.base_pos[:, 2]

        # ---- move-up flag (:1325-1327) ----
        dist = jnp.linalg.norm(phys.base_pos[:, :2] - env.env_origin[:, :2],
                               axis=1)
        move_up_flag = env.move_up_flag | (dist > 0.8 * self.track_length)
        env = env.replace(move_up_flag=move_up_flag)

        # ---- contacts (process_contacts :1187-1209) ----
        contacts_filt = cinfo.foot_forces[..., 2] > 1.0          # (N, 4)
        feet_swing_time = env.feet_swing_time + self.dt
        contacts_touchdown = (env.feet_swing_time > 0) & contacts_filt
        foot_h = cinfo.foot_positions[..., 2] - jax.vmap(
            lambda p: height_min3(self.hf, p[..., :2]))(cinfo.foot_positions)
        feet_swing_apex = jnp.maximum(env.feet_swing_apex, foot_h)
        feet_clearance = jnp.where(contacts_touchdown, feet_swing_apex,
                                   env.feet_clearance)

        # ---- hard terminations (check_termination :489-499) ----
        base_contact = cinfo.base_contact > 1.0
        knee_contact_any = jnp.any(cinfo.calf_contact > 1.0, axis=1)
        timed_out = env.progress >= self.max_episode_length - 1

        # ---- CaT constraint battery (:849-1029) ----
        lim = cfg.limits
        zero_cmd = ((jnp.linalg.norm(env.commands[:, :2], axis=1)
                     < cfg.vel_deadzone)
                    & (jnp.abs(env.commands[:, 2]) < cfg.vel_deadzone)) | (
            env.commands[:, 0] < cfg.vel_deadzone)
        nz = (~zero_cmd).astype(jnp.float32)

        yaw = quat_util.quat_yaw(phys.base_quat)
        yaw_cmd = jnp.arctan2(env.commands[:, 1], env.commands[:, 0])
        yaw_diff = jnp.arctan2(jnp.sin(yaw - yaw_cmd), jnp.cos(yaw - yaw_cmd))
        cstr_heading = (jnp.abs(yaw_diff) - lim.heading) * nz

        q, qd = phys.joint_q, phys.joint_qd
        cstr_joint_vel = jnp.abs(qd) - lim.vel
        cstr_torque = jnp.abs(env.torques) - lim.torque
        cstr_dof_lo = model.joint_lower[None, :] - q
        cstr_dof_hi = q - model.joint_upper[None, :]
        cstr_action_rate = (jnp.abs(env.actions - env.last_actions) / self.dt
                            - lim.action_rate)
        cstr_knee = cinfo.calf_contact                            # (N, 4)
        cstr_base = cinfo.base_contact                            # (N,)
        cstr_foot = jnp.linalg.norm(cinfo.foot_forces, axis=-1) \
            - lim.foot_contact_force
        cstr_stumble = (jnp.linalg.norm(cinfo.foot_forces[..., :2], axis=-1)
                        - 4.0 * jnp.abs(cinfo.foot_forces[..., 2]))
        hfe_ix = jnp.array([1, 4])
        kfe_ix = jnp.array([2, 5, 8, 11])
        haa_ix = jnp.array([0, 3, 6, 9])
        cstr_HFE = q[:, hfe_ix] - lim.HFE
        cstr_HFE_min = lim.HFE_min - q[:, hfe_ix]
        cstr_KFE = q[:, kfe_ix]
        cstr_KFE_min = lim.KFE_min - q[:, kfe_ix]
        cstr_HAA = jnp.abs(q[:, haa_ix]
                           - self.default_joint_q[haa_ix]) - lim.HAA
        cstr_upsidedown = (projected_gravity[:, 2] > 0).astype(jnp.float32)
        cstr_lava = (base_z < -0.05).astype(jnp.float32)
        cstr_minbaseheight = (lim.min_base_height - base_z) * (
            ceilings >= 0.34).astype(jnp.float32)
        hard_base_height = cstr_minbaseheight > 0

        is_flat = (((heights_var < cfg.flat_terrain_threshold)
                    & (ceilings >= 0.34))
                   | (env.terrain_level <= 1)).astype(jnp.float32)
        flat_style = ((heights_var < cfg.flat_terrain_threshold)
                      & (ceilings >= 0.34)).astype(jnp.float32)
        cstr_base_ori = (jnp.linalg.norm(projected_gravity[:, :2], axis=1)
                         - lim.base_orientation) * is_flat
        cstr_air_time = ((cfg.air_time_target - feet_swing_time)
                         * contacts_touchdown.astype(jnp.float32)
                         * nz[:, None])
        n_contacts = jnp.sum(contacts_filt.astype(jnp.float32), axis=1)
        cstr_nomove = (jnp.abs(n_contacts - 4)
                       * zero_cmd.astype(jnp.float32) * flat_style)
        cstr_2foot = jnp.abs(n_contacts - 2) * nz * flat_style

        # soft_p curriculum (:966-974)
        soft_p_progress = jnp.clip(
            world.soft_p_progress + 1.0 / cfg.soft_p_total_steps, 0.0, 1.0)
        if cfg.use_soft_p_curriculum:
            T_start, T_end = 25.0, 1.0 / cfg.soft_p
            soft_p = 1.0 / (T_start + soft_p_progress * (T_end - T_start))
        else:
            soft_p = jnp.float32(cfg.soft_p)
        m_soft_p = 0.1 + soft_p

        constraints = {
            "heading": sqrt_func(cstr_heading), "stumble": sqrt_func(cstr_stumble),
            "dof_pos_lower": cstr_dof_lo, "dof_pos_upper": cstr_dof_hi,
            "torque": cstr_torque, "joint_vel": cstr_joint_vel,
            "action_rate": sqrt_func(cstr_action_rate),
            "knee_contact": sqrt_func(cstr_knee),
            "base_contact": sqrt_func(cstr_base),
            "foot_contact": sqrt_func(cstr_foot),
            "upsidedown": cstr_upsidedown, "lava": cstr_lava,
            "HFE": sqrt_func(cstr_HFE), "HFE_min": sqrt_func(cstr_HFE_min),
            "KFE": sqrt_func(cstr_KFE), "KFE_min": sqrt_func(cstr_KFE_min),
            "HAA": sqrt_func(cstr_HAA),
            "base_ori": sqrt_func(cstr_base_ori),
            "air_time": cstr_air_time, "no_move": sqrt_func(cstr_nomove),
            "2footcontact": cstr_2foot,
        }
        max_ps = {n: soft_p for n in self.cstr_names}
        for n in ("knee_contact", "base_contact", "foot_contact",
                  "upsidedown", "lava"):
            max_ps[n] = jnp.float32(1.0)
        max_ps["stumble"] = m_soft_p

        # a diverged env contributes NOTHING to the constraint stream: its
        # values would be NaN/inf and would permanently poison the Polyak
        # running maxes carried in cat_state
        def _zero_diverged(c):
            m = diverged.reshape((N,) + (1,) * (c.ndim - 1))
            return jnp.where(m, 0.0, c)

        constraints = {n: _zero_diverged(c) for n, c in constraints.items()}
        cat_state, cstr_prob, viol, cstr_argmax = self.cstr.step(
            world.cat, constraints, max_ps)

        # float dones for GAE + hard resets (:1021-1025)
        done_prob = jnp.where(diverged, 1.0, cstr_prob)
        term_contacts = base_contact | (knee_contact_any
                                        & (not cfg.allow_knee_contacts))
        hard_done = (timed_out | (cstr_upsidedown > 0) | (cstr_lava > 0)
                     | term_contacts | hard_base_height | diverged)

        # ---- reward ----
        robot_cmd = self._robot_command(phys.base_quat, env.commands)
        lin_err = jnp.sum(
            jnp.square(robot_cmd[:, :2] - base_lin_vel[:, :2]), axis=1)
        ang_err = jnp.square(env.commands[:, 2] - base_ang_vel[:, 2])
        rew_lin = jnp.exp(-lin_err / cfg.lin_vel_delta) * cfg.lin_vel_xy_scale
        rew_ang = jnp.exp(-ang_err / cfg.ang_vel_delta) * cfg.ang_vel_z_scale
        # diverged envs: zero reward this step (lin_err is NaN/inf there)
        rew_lin = jnp.where(diverged, 0.0, rew_lin)
        rew_ang = jnp.where(diverged, 0.0, rew_ang)
        if cfg.reward_mode == "full":
            # full battery for the rough-terrain task without CaT
            # (go2_terrain.py compute_reward :1024-1090)
            rs = cfg.terrain_rewards
            rew = self._full_rewards(
                env, cinfo, base_lin_vel, base_ang_vel, projected_gravity,
                contacts_touchdown, feet_swing_time, rew_lin, rew_ang, rs)
        else:
            rew = jnp.clip(rew_lin, min=0.0)  # CaT: tracking only (:841-845)
        # full-battery terms read raw torques/velocities, so mask again
        rew = jnp.where(diverged, 0.0, rew)

        viol_vec = jnp.stack([viol[n] for n in self.cstr_names])
        episode_sums = env.episode_sums + jnp.concatenate(
            [jnp.stack([rew_lin, rew_ang], -1),
             jnp.broadcast_to(viol_vec, (N, len(self.cstr_names)))], axis=-1)

        # zero swing accumulators on contact AFTER constraint/reward use
        feet_swing_apex = feet_swing_apex * (~contacts_filt)
        feet_swing_time = feet_swing_time * (~contacts_filt)
        env = env.replace(
            feet_swing_time=feet_swing_time, feet_swing_apex=feet_swing_apex,
            feet_clearance=feet_clearance, episode_sums=episode_sums,
            timed_out=timed_out)

        # ---- true next observation BEFORE resets, for off-policy
        # bootstrapping (compute_true_next_observations,
        # go2_terrain.py:734-756) ----
        if cfg.provide_true_next_obs:
            true_next_obs = self._build_obs(
                env, base_lin_vel, base_ang_vel, projected_gravity,
                measured_heights, ceilings, cinfo)
            # pre-reset state: mask diverged rows (consumers bootstrap from
            # these observations)
            true_next_obs = jnp.where(diverged[:, None], 0.0, true_next_obs)
        else:
            true_next_obs = None

        # ---- episode metrics at reset ----
        ep_sums_at_reset = jnp.sum(
            jnp.where(hard_done[:, None], episode_sums, 0.0), axis=0)
        ep_len_at_reset = jnp.sum(jnp.where(hard_done, env.progress, 0))
        n_reset = jnp.sum(hard_done)

        # post-step, PRE-reset XY distance from the track origin — eval
        # tooling uses this to measure crossing distance AT termination
        # (the post-reset position would be teleported back to the start)
        dist_pre_reset = jnp.linalg.norm(
            env.phys.base_pos[:, :2] - env.env_origin[:, :2], axis=1)

        # per-track-TYPE promotion telemetry: crossings (>80% of the track
        # at done — the promotion rule, go2_parkour.py:1158-1186) and dones
        # per terrain type column, so the monitor can attribute which track
        # kind blocks promotion (one-hot matmul; num_cols is ~20)
        n_types = self.terrain_origins.shape[1]
        onehot_t = jax.nn.one_hot(env.terrain_type, n_types,
                                  dtype=jnp.float32)
        hard_f = hard_done.astype(jnp.float32)
        crossings_by_type = onehot_t.T @ (
            hard_f * (dist_pre_reset > 0.8 * self.track_length))
        dones_by_type = onehot_t.T @ hard_f

        # ---- masked reset (reset_idx :1035-1124) ----
        env = self._reset_envs(env, hard_done)

        # ---- stochastic command updates (:1362-1402) ----
        env = self._update_commands(env)

        # ---- observations (post-reset state, like compute_observations
        # re-running get_heights at :578 after reset_idx) ----
        phys2 = env.phys
        blv2 = quat_util.quat_rotate_inverse(phys2.base_quat,
                                             phys2.base_lin_vel)
        bav2 = quat_util.quat_rotate_inverse(phys2.base_quat,
                                             phys2.base_ang_vel)
        pg2 = quat_util.quat_rotate_inverse(
            phys2.base_quat,
            jnp.broadcast_to(g_unit, phys2.base_quat.shape[:-1] + (3,)))
        mh2 = self._measured_heights(phys2.base_pos, phys2.base_quat)
        pos_x2 = jnp.mod(phys2.base_pos[:, 0], self.track_length)
        crawl2 = (((pos_x2 > 1.55) & (pos_x2 < 3.45)) |
                  ((pos_x2 > 5.55) & (pos_x2 < 7.45))).astype(jnp.float32)
        ceil2 = (crawl2 * self.terrain_ceilings[env.terrain_level,
                                                env.terrain_type]
                 + (1.0 - crawl2) * 0.4)
        obs_sample = self._build_obs(env, blv2, bav2, pg2, mh2, ceil2, cinfo)
        # refresh history for just-reset envs (compute_observations :601-605;
        # the reference's progress_buf==1 also covers the very first step
        # after a global reset — common_step==1 here)
        resetted = (env.progress == 0) | (common_step == 1)
        hist = jnp.where(
            resetted[:, None],
            jnp.tile(obs_sample, (1, self.hist_len)),
            world.hist_obs)
        hist = jnp.concatenate(
            [obs_sample, hist[:, :-self.sample_obs_size]], axis=-1)
        # strided sampling (:612-620)
        idx = [jnp.arange(i * max(self.cfg.num_history_step, 1)
                          * self.sample_obs_size,
                          i * max(self.cfg.num_history_step, 1)
                          * self.sample_obs_size + self.sample_obs_size)
               for i in range(self.cfg.num_history_samples)]
        obs = jnp.concatenate([hist[:, ix] for ix in idx], axis=-1)

        env = env.replace(last_last_actions=env.last_actions,
                          last_actions=env.actions,
                          last_joint_qd=env.phys.joint_qd,
                          last_base_lin_vel=env.phys.base_lin_vel)
        world = ParkourWorld(env=env, cat=cat_state,
                             soft_p_progress=soft_p_progress,
                             hist_obs=hist, common_step=common_step)
        info = {
            "true_dones": hard_done,
            "truncateds": timed_out,
            "constraint_violations": viol,
            "terrain_level_mean": jnp.mean(env.terrain_level.astype(jnp.float32)),
            "terrain_level_max": jnp.max(env.terrain_level),
            "episode_sums_at_reset": ep_sums_at_reset,
            "episode_len_at_reset": ep_len_at_reset,
            "num_resets": n_reset,
            "dist_at_done": dist_pre_reset,
            "soft_p": soft_p,
            "crossings_by_type": crossings_by_type,
            "dones_by_type": dones_by_type,
            # per-env diagnostics: why each hard reset fired, the CaT
            # termination probability, and the binding constraint column
            # (map back to a name via self.cstr.offsets)
            "done_reasons": {
                "timeout": timed_out, "base_contact": base_contact,
                "knee_contact": knee_contact_any,
                "lava": cstr_lava > 0, "upsidedown": cstr_upsidedown > 0,
                "base_height": hard_base_height, "diverged": diverged},
            "cstr_prob": cstr_prob,
            "cstr_argmax_col": cstr_argmax,
        }
        if true_next_obs is not None:
            info["true_next_obs"] = true_next_obs
        return world, obs, rew, done_prob, info

    # ------------------------------------------------------------------
    def _full_rewards(self, env, cinfo, blv, bav, pg, contacts_touchdown,
                      feet_swing_time, rew_lin, rew_ang, rs):
        """Rough-terrain reward battery (go2_terrain.py:1024-1090),
        including the raibert heuristic (:612-646). Returns (N,) clipped
        total."""
        cfg = self.cfg
        phys = env.phys
        q, qd = phys.joint_q, phys.joint_qd
        diff_qd = qd                                       # sim qd is clean
        rew = rew_lin + rew_ang
        rew += jnp.square(blv[:, 2]) * rs.lin_vel_z
        rew += jnp.sum(jnp.square(bav[:, :2]), -1) * rs.ang_vel_xy
        rew += jnp.sum(jnp.square(pg[:, :2]), -1) * rs.orient
        rew += jnp.square(phys.base_pos[:, 2]
                          - cfg.base_height_target) * rs.base_height
        rew += jnp.sum(jnp.square(env.torques), -1) * rs.torque
        rew += jnp.sum(jnp.square(diff_qd - env.last_joint_qd), -1) \
            * rs.joint_acc
        knee_contact = cinfo.calf_contact > 1.0
        rew += jnp.sum(knee_contact, -1) * rs.collision
        stumble = ((jnp.linalg.norm(cinfo.foot_forces[..., :2], axis=-1) > 5.0)
                   & (jnp.abs(cinfo.foot_forces[..., 2]) < 1.0))
        rew += jnp.sum(stumble, -1) * rs.stumble
        rew += jnp.sum(
            jnp.square(env.actions - env.last_actions)
            + jnp.square(env.actions - 2 * env.last_actions
                         + env.last_last_actions), -1) \
            * (cfg.action_scale ** 2) * rs.action_rate
        rew += jnp.sum(jnp.square(q - self.default_joint_q[None, :]), -1) \
            * rs.dof_pos
        air = jnp.sum((feet_swing_time - 0.25)
                      * contacts_touchdown.astype(jnp.float32), -1) \
            * rs.air_time
        rew += air * (jnp.linalg.norm(env.commands, axis=1)
                      > cfg.vel_deadzone)
        rew += jnp.sum(jnp.clip(jnp.abs(diff_qd) - 12.0, 0.0, 1.0), -1) \
            * rs.dof_vel_limit
        haa_ix = jnp.array([0, 3, 6, 9])
        rew += jnp.sum(jnp.abs(q[:, haa_ix]
                               - self.default_joint_q[haa_ix]), -1) * rs.hip
        if rs.raibert != 0.0:
            rew += self._raibert_error(env, cinfo) * rs.raibert
        return jnp.clip(rew, min=0.0)

    def _raibert_error(self, env, cinfo):
        """Raibert footstep-placement error (go2_terrain.py:612-646):
        squared distance of body-frame footsteps from gait-phase-advanced
        nominal stance positions."""
        phys = env.phys
        rel = cinfo.foot_positions - phys.base_pos[:, None, :]    # (N,4,3)
        inv_yaw = quat_util.quat_conjugate(
            quat_util.yaw_quat(phys.base_quat))
        feet_body = jax.vmap(
            lambda qv, r: quat_util.quat_rotate(
                jnp.broadcast_to(qv, (4, 4)), r))(inv_yaw, rel)
        ys_nom = jnp.array([0.125, -0.125, 0.125, -0.125])
        xs_nom = jnp.array([0.225, 0.225, -0.225, -0.225])
        phases = jnp.abs(1.0 - env.foot_indices * 2.0) - 0.5      # (N,4)
        freq = 3.0
        x_vel = env.commands[:, 0:1]
        y_vel = env.commands[:, 2:3] * 0.45 / 2
        ys_off = phases * y_vel * (0.5 / freq)
        ys_off = ys_off.at[:, 2:4].multiply(-1.0)
        xs_off = phases * x_vel * (0.5 / freq)
        des_x = xs_nom[None, :] + xs_off
        des_y = ys_nom[None, :] + ys_off
        err = (jnp.square(des_x - feet_body[..., 0])
               + jnp.square(des_y - feet_body[..., 1]))
        return jnp.sum(err, axis=1)

    # ------------------------------------------------------------------
    def _update_terrain_level(self, env: ParkourEnvState, mask):
        """update_terrain_level (:1158-1186)."""
        dist = jnp.linalg.norm(
            env.phys.base_pos[:, :2] - env.env_origin[:, :2], axis=1)
        move_up = dist > self.track_length * 0.8
        move_down = dist < self.track_length * 0.5
        lvl = env.terrain_level + 1 * move_up - 1 * move_down
        k = jax.vmap(lambda kk: jax.random.fold_in(kk, 29))(env.rng)
        rand_lvl = jax.vmap(lambda kk: jax.random.randint(
            kk, (), 0, self.num_terrain_levels))(k)
        lvl = jnp.where(lvl >= self.num_terrain_levels, rand_lvl,
                        jnp.clip(lvl, 0, None))
        # 1% teleport back to level 0 when not moving up (:1180)
        back = jax.vmap(lambda kk: jax.random.bernoulli(
            jax.random.fold_in(kk, 31), 0.01))(env.rng) & (~move_up)
        lvl = jnp.where(back, 0, lvl)
        lvl = jnp.where(mask, lvl, env.terrain_level)
        origins = self.terrain_origins[lvl, env.terrain_type]
        return env.replace(
            terrain_level=lvl, env_origin=origins,
            move_up_flag=jnp.where(mask, False, env.move_up_flag))

    def restore_terrain_state(self, world, terrain_level, terrain_type=None):
        """Re-seat every env at the given curriculum levels (and optionally
        types) and hard-reset them there — used by slim-checkpoint resume,
        where the learner state survives a round boundary but env arrays
        restart fresh and would otherwise lose the promoted levels."""
        env = world.env
        lvl = jnp.asarray(terrain_level)
        typ = (env.terrain_type if terrain_type is None
               else jnp.asarray(terrain_type))
        env = env.replace(terrain_level=lvl, terrain_type=typ,
                          env_origin=self.terrain_origins[lvl, typ],
                          move_up_flag=jnp.zeros_like(env.move_up_flag))
        env = self._reset_envs_at_origin(
            env, jnp.ones(lvl.shape[0], bool))
        return world.replace(env=env)

    def _reset_envs(self, env: ParkourEnvState, mask):
        env = self._update_terrain_level(env, mask)
        return self._reset_envs_at_origin(env, mask)

    def _reset_envs_at_origin(self, env: ParkourEnvState, mask):
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 11))(env.rng)
        new_phys = jax.vmap(self._reset_phys)(keys, env.env_origin)
        kdr = jax.vmap(lambda k: jax.random.fold_in(k, 13))(env.rng)
        new_dr = jax.vmap(self._sample_dr)(kdr)
        kc = jax.vmap(lambda k: jax.random.fold_in(k, 17))(env.rng)
        new_cmd = jax.vmap(self._sample_commands)(kc)

        def mwhere(m, a, b):
            return jnp.where(m.reshape(m.shape + (1,) * (a.ndim - 1)), a, b)

        phys = jax.tree.map(lambda a, b: mwhere(mask, a, b), new_phys,
                            env.phys)
        zero_j = jnp.zeros_like(env.actions)
        return env.replace(
            phys=phys,
            progress=jnp.where(mask, 0, env.progress),
            commands=mwhere(mask, new_cmd, env.commands),
            actions=mwhere(mask, zero_j, env.actions),
            last_actions=mwhere(mask, zero_j, env.last_actions),
            last_last_actions=mwhere(mask, zero_j, env.last_last_actions),
            last_joint_qd=mwhere(mask, zero_j, env.last_joint_qd),
            gait_index=jnp.where(mask, 0.0, env.gait_index),
            joint_pos_err_last=mwhere(mask, zero_j, env.joint_pos_err_last),
            joint_pos_err_last_last=mwhere(mask, zero_j,
                                           env.joint_pos_err_last_last),
            joint_vel_last=mwhere(mask, zero_j, env.joint_vel_last),
            joint_vel_last_last=mwhere(mask, zero_j, env.joint_vel_last_last),
            friction=jnp.where(mask, new_dr["friction"], env.friction),
            motor_Fs=mwhere(mask, new_dr["motor_Fs"], env.motor_Fs),
            motor_mu_v=mwhere(mask, new_dr["motor_mu_v"], env.motor_mu_v),
            feet_swing_time=mwhere(mask, jnp.zeros_like(env.feet_swing_time),
                                   env.feet_swing_time),
            feet_swing_apex=mwhere(mask, jnp.zeros_like(env.feet_swing_apex),
                                   env.feet_swing_apex),
            feet_clearance=mwhere(mask, jnp.zeros_like(env.feet_clearance),
                                  env.feet_clearance),
            episode_sums=mwhere(mask, jnp.zeros_like(env.episode_sums),
                                env.episode_sums))

    def _update_commands(self, env: ParkourEnvState):
        """Stochastic in-episode command dynamics (:1362-1402)."""
        cfg = self.cfg
        if cfg.only_forwards:
            return env
        k = jax.vmap(lambda kk: jax.random.fold_in(kk, 37))(env.rng)
        k1 = jax.vmap(lambda kk: jax.random.fold_in(kk, 1))(k)
        k2 = jax.vmap(lambda kk: jax.random.fold_in(kk, 2))(k)
        k3 = jax.vmap(lambda kk: jax.random.fold_in(kk, 3))(k)
        k4 = jax.vmap(lambda kk: jax.random.fold_in(kk, 4))(k)

        # resample with p = 1% (slow cmd) + 0.2%
        p_res = 0.01 * (jnp.linalg.norm(env.commands[:, :2], axis=1)
                        < 0.5) + 0.002
        do_res = jax.vmap(jax.random.bernoulli)(k1, p_res)
        new_cmd = jax.vmap(self._sample_commands)(k2)
        cmd = jnp.where(do_res[:, None], new_cmd, env.commands)

        # ang-vel sign flips with p = dt / episode_length_s
        p_flip = self.dt / cfg.episode_length_s
        flip = jax.vmap(lambda kk: jax.random.bernoulli(kk, p_flip))(k3)
        cmd = cmd.at[:, 2].multiply(1.0 - 2.0 * flip.astype(jnp.float32))

        # lava-avoidance y commands
        y_off = env.phys.base_pos[:, 1] - env.env_origin[:, 1]
        cmd = cmd.at[:, 1].set(jnp.where(y_off < -1.0, jnp.abs(cmd[:, 1]),
                                         cmd[:, 1]))
        cmd = cmd.at[:, 1].set(jnp.where(y_off > 1.0, -jnp.abs(cmd[:, 1]),
                                         cmd[:, 1]))

        # zero-command episodes with p = (1/3) dt / episode_length_s
        p_zero = (1.0 / 3.0) * self.dt / cfg.episode_length_s
        zero = jax.vmap(lambda kk: jax.random.bernoulli(kk, p_zero))(k4)
        cmd = jnp.where(zero[:, None], 0.0, cmd)
        return env.replace(commands=cmd)

    # ------------------------------------------------------------------
    def _build_obs(self, env, base_lin_vel, base_ang_vel, projected_gravity,
                   measured_heights, ceilings, cinfo):
        cfg = self.cfg
        phys = env.phys
        blocks = []
        if cfg.observe_base_lin_vel:
            blocks.append(base_lin_vel * cfg.lin_vel_scale)
        if cfg.observe_base_ang_vel:
            blocks.append(base_ang_vel * cfg.ang_vel_scale)
        if cfg.observe_commands:
            rc = self._robot_command(phys.base_quat, env.commands)
            scale = jnp.array([cfg.lin_vel_scale, cfg.lin_vel_scale,
                               cfg.ang_vel_scale])
            blocks.append(rc * scale[None, :])
        if cfg.observe_misc:
            blocks.append(jnp.concatenate([
                projected_gravity,
                phys.joint_q * cfg.dof_pos_scale,
                phys.joint_qd * cfg.dof_vel_scale,
                env.actions], axis=-1))
        if cfg.observe_heights:
            rel = jnp.clip(
                phys.base_pos[:, 2:3] - cfg.base_height_target
                - measured_heights, -1.0, 1.0)
            blocks.append(rel * cfg.height_meas_scale)
        if cfg.observe_ceilings:
            blocks.append(ceilings[:, None])
        if cfg.observe_phases:
            phases_off = jnp.array([0.0, jnp.pi, jnp.pi, 0.0])
            ph = (2 * jnp.pi * cfg.phases_freq
                  * env.progress[:, None].astype(jnp.float32) * self.dt
                  + phases_off[None, :])
            blocks.append(jnp.concatenate([jnp.cos(ph), jnp.sin(ph)], -1))
        if cfg.observe_imu:
            # base proper acceleration: the reference reads a base force
            # sensor (net force / mass, zero at rest, go2_terrain.py:864-868);
            # the analytic-engine analog is the finite-difference world
            # acceleration of the base, rotated into the body frame
            accel_w = (phys.base_lin_vel - env.last_base_lin_vel) / self.dt
            blocks.append(quat_util.quat_rotate_inverse(
                phys.base_quat, accel_w) * cfg.imu_scale)
        if cfg.observe_clock_inputs:
            blocks.append(env.clock_inputs)
        obs = jnp.concatenate(blocks, axis=-1)
        if cfg.add_noise:
            kn = jax.vmap(lambda k: jax.random.fold_in(k, 23))(env.rng)
            noise = jax.vmap(lambda k: 2 * jax.random.uniform(
                k, (self.sample_obs_size,)) - 1)(kn)
            obs = obs + noise * self.noise_vec[None, :]
        return obs

    def get_observations(self, world: ParkourWorld):
        """Initial observation from the current history buffer."""
        idx = [jnp.arange(i * max(self.cfg.num_history_step, 1)
                          * self.sample_obs_size,
                          i * max(self.cfg.num_history_step, 1)
                          * self.sample_obs_size + self.sample_obs_size)
               for i in range(self.cfg.num_history_samples)]
        return jnp.concatenate([world.hist_obs[:, ix] for ix in idx], axis=-1)
