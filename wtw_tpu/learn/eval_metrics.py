"""Policy-quality evaluation: metric functions + canned DR sweeps.

Re-design of go1_gym_learn/eval_metrics/{metrics,domain_randomization}.py:

- METRICS_FNS: per-step (N,) metric arrays from (world, contact info,
  commands): velocity-tracking RMSE, raw velocities, base height, max
  torque, power, cost of transport, froude number (metrics.py:9-99);
- DR sweep presets mutating a Cfg: rand_regular / rand_large /
  static_{low,medium,high} / only_base_mass
  (domain_randomization.py:4-148);
- evaluate_policy: roll a policy and return per-metric means.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..config import Cfg
from ..utils import quat as quat_util

G = 9.8


def _base_vels(world):
    phys = world.env.phys
    blv = quat_util.quat_rotate_inverse(phys.base_quat, phys.base_lin_vel)
    bav = quat_util.quat_rotate_inverse(phys.base_quat, phys.base_ang_vel)
    return blv, bav


def lin_vel_rmsd(world):
    blv, _ = _base_vels(world)
    return jnp.sqrt((blv[:, 0] - world.env.commands[:, 0]) ** 2)


def ang_vel_rmsd(world):
    _, bav = _base_vels(world)
    return jnp.sqrt((bav[:, 2] - world.env.commands[:, 2]) ** 2)


def lin_vel_x(world):
    return _base_vels(world)[0][:, 0]


def ang_vel_yaw(world):
    return _base_vels(world)[1][:, 2]


def base_height(world):
    return world.env.phys.base_pos[:, 2]


def max_torques(world):
    return jnp.max(jnp.abs(world.env.torques), axis=1)


def power_consumption(world):
    return jnp.sum(world.env.torques * world.env.phys.joint_qd, axis=1)


def make_cot(total_mass: float):
    """Cost of transport P / (m g v) (metrics.py:40-48)."""

    def CoT(world):
        P = power_consumption(world)
        blv, _ = _base_vels(world)
        v = jnp.linalg.norm(blv[:, :2], axis=1)
        m = total_mass + world.env.payload
        return P / jnp.maximum(m * G * v, 1e-6)

    return CoT


def froude_number(world, h: float = 0.30):
    v = lin_vel_x(world)
    return v ** 2 / (G * h)


METRICS_FNS: Dict[str, Callable] = {
    "lin_vel_rmsd": lin_vel_rmsd, "ang_vel_rmsd": ang_vel_rmsd,
    "lin_vel_x": lin_vel_x, "ang_vel_yaw": ang_vel_yaw,
    "base_height": base_height, "max_torques": max_torques,
    "power_consumption": power_consumption, "froude_number": froude_number,
}


# ----------------------------------------------------------------------
# DR sweep presets (domain_randomization.py:16-148) as pure Cfg -> Cfg
# ----------------------------------------------------------------------
def _dr(cfg: Cfg, **kw) -> Cfg:
    return dataclasses.replace(
        cfg, domain_rand=dataclasses.replace(cfg.domain_rand, **kw))


def base_set(cfg: Cfg) -> Cfg:
    """Eval world setup (:4-14): huge episodes, frozen commands."""
    return dataclasses.replace(
        cfg,
        commands=dataclasses.replace(cfg.commands, resampling_time=1e9,
                                     command_curriculum=False),
        env=dataclasses.replace(cfg.env, episode_length_s=500.0),
        rewards=dataclasses.replace(cfg.rewards, terminal_body_height=0.0,
                                    use_terminal_body_height=True))


def rand_regular(cfg: Cfg) -> Cfg:
    return _dr(cfg, randomize_friction=True, friction_range=(0.05, 4.5),
               randomize_restitution=True, restitution_range=(0.0, 1.0),
               randomize_base_mass=True, added_mass_range=(-1.0, 3.0),
               randomize_com_displacement=True,
               com_displacement_range=(-0.1, 0.1),
               randomize_motor_strength=True,
               motor_strength_range=(0.9, 1.1), push_robots=False)


def rand_large(cfg: Cfg) -> Cfg:
    return _dr(cfg, randomize_friction=True, friction_range=(0.04, 6.0),
               randomize_restitution=True, restitution_range=(0.0, 1.0),
               randomize_base_mass=True, added_mass_range=(-1.5, 4.0),
               randomize_com_displacement=True,
               com_displacement_range=(-0.13, 0.13),
               randomize_motor_strength=True,
               motor_strength_range=(0.88, 1.12), push_robots=False)


def static_low(cfg: Cfg) -> Cfg:
    return _dr(cfg, randomize_friction=True, friction_range=(0.05, 0.06),
               randomize_restitution=False, randomize_base_mass=False,
               randomize_com_displacement=False,
               randomize_motor_strength=False, push_robots=False)


def static_medium(cfg: Cfg) -> Cfg:
    return _dr(cfg, randomize_friction=True, friction_range=(1.0, 1.01),
               randomize_restitution=False, randomize_base_mass=False,
               randomize_com_displacement=False,
               randomize_motor_strength=False, push_robots=False)


def static_high(cfg: Cfg) -> Cfg:
    return _dr(cfg, randomize_friction=True, friction_range=(4.0, 4.01),
               randomize_restitution=False, randomize_base_mass=False,
               randomize_com_displacement=False,
               randomize_motor_strength=False, push_robots=False)


def only_base_mass(cfg: Cfg) -> Cfg:
    return _dr(cfg, randomize_friction=False, randomize_restitution=False,
               randomize_base_mass=True, added_mass_range=(-1.0, 3.0),
               randomize_com_displacement=False,
               randomize_motor_strength=False, push_robots=False)


DR_SWEEPS = {
    "rand_regular": rand_regular, "rand_large": rand_large,
    "static_low": static_low, "static_medium": static_medium,
    "static_high": static_high, "only_base_mass": only_base_mass,
}


# ----------------------------------------------------------------------
def evaluate_policy(env, policy_fn, steps: int = 250, seed: int = 0,
                    commands=None):
    """Roll `policy_fn(obs_dict) -> actions` for `steps` and return
    {metric: mean} (+ per-step traces). The analog of scripts/go1/play.py's
    eval loop (:101-157)."""
    key = jax.random.PRNGKey(seed)
    world = env.init_state(key)
    if commands is not None:
        cmds = jnp.broadcast_to(jnp.asarray(commands),
                                world.env.commands.shape)
        world = world.replace(env=world.env.replace(commands=cmds))
    world, obs = env.get_observations(world)
    metrics = {name: [] for name in METRICS_FNS}
    metrics["CoT"] = []
    cot = make_cot(float(env.model.mass.sum()))

    # commands enter the jitted step as a traced argument so that sweeping
    # command values (eval_gaits.py) reuses ONE compiled executable
    cmd_arr = (None if commands is None else
               jnp.broadcast_to(jnp.asarray(commands),
                                world.env.commands.shape))

    @jax.jit
    def step(world, obs, cmd_arr):
        actions = policy_fn(obs)
        world, obs, rew, done, info = env.step(world, actions)
        if cmd_arr is not None:
            # re-pin the evaluation command after any resample/reset so
            # the WHOLE rollout tracks the requested command (the analog of
            # play.py overwriting env.commands each step, :120-131)
            world = world.replace(env=world.env.replace(commands=cmd_arr))
        vals = {name: fn(world) for name, fn in METRICS_FNS.items()}
        vals["CoT"] = cot(world)
        return world, obs, rew, vals

    rews = []
    for _ in range(steps):
        world, obs, rew, vals = step(world, obs, cmd_arr)
        rews.append(rew)
        for name, v in vals.items():
            metrics[name].append(v)

    out = {name: float(jnp.mean(jnp.stack(v))) for name, v in metrics.items()}
    out["mean_reward"] = float(jnp.mean(jnp.stack(rews)))
    traces = {name: jnp.stack(v) for name, v in metrics.items()}
    return out, traces


def gait_stats(env, policy_fn, steps: int = 400, seed: int = 0,
               commands=None):
    """Measure the realized gait: per-foot contact duty factor, stride
    frequency (from contact onsets), and diagonal-pair phase correlation
    (trot = diagonal pairs in phase, lateral pairs anti-phase). The
    quantitative analog of the reference's play.py contact plots
    (scripts/go1/play.py:139-157)."""
    import numpy as np

    key = jax.random.PRNGKey(seed)
    world = env.init_state(key)
    if commands is not None:
        cmds = jnp.broadcast_to(jnp.asarray(commands),
                                world.env.commands.shape)
        world = world.replace(env=world.env.replace(commands=cmds))
    world, obs = env.get_observations(world)

    cmd_arr = (None if commands is None else
               jnp.broadcast_to(jnp.asarray(commands),
                                world.env.commands.shape))

    @jax.jit
    def step(world, obs, cmd_arr):
        world, obs, rew, done, info = env.step(world, policy_fn(obs))
        if cmd_arr is not None:
            world = world.replace(env=world.env.replace(commands=cmd_arr))
        return world, obs, world.env.last_contacts

    contacts = []
    for _ in range(steps):
        world, obs, c = step(world, obs, cmd_arr)
        contacts.append(np.asarray(c))
    c = np.stack(contacts).astype(np.float32)     # (T, N, 4) FR FL RR RL
    out = classify_contacts(c, env.dt)
    # kept for round-1/2 table continuity: front/hind-pair correlation
    out["lateral_corr"] = out["pair_corr"]
    return out


def classify_contacts(c, dt):
    """Gait signature of a (T, N, 4) foot-contact sequence (foot order
    FR FL RR RL): duty factor, stride frequency from contact onsets, and
    three phase-correlation axes that classify the four MoB gaits
    (scripts/go1/train.py gait command space: phases 0.5/0/0 = trot,
    0/0.5/0 = pace, 0/0/0.5 = bound, 0/0/0 = pronk):
      trot:  diag +, pair -, side -      pace:  diag -, pair -, side +
      bound: diag -, pair +, side -      pronk: diag +, pair +, side +
    dominant_gait = nearest sign template to the measured axes."""
    import numpy as np

    c = np.asarray(c, np.float32)
    duty = c.mean(axis=0).mean(axis=0)            # (4,)
    # stride frequency from contact onsets of foot 0, averaged over envs
    onsets = np.diff(c[:, :, 0], axis=0) > 0
    freq = onsets.sum(axis=0) / (c.shape[0] * dt)

    def _corr(a, b):
        a = a - a.mean(axis=0, keepdims=True)
        b = b - b.mean(axis=0, keepdims=True)
        denom = np.sqrt((a * a).sum(axis=0) * (b * b).sum(axis=0)) + 1e-8
        return ((a * b).sum(axis=0) / denom).mean()

    diag = (_corr(c[:, :, 0], c[:, :, 3]) + _corr(c[:, :, 1], c[:, :, 2])) / 2
    pair = (_corr(c[:, :, 0], c[:, :, 1]) + _corr(c[:, :, 2], c[:, :, 3])) / 2
    side = (_corr(c[:, :, 0], c[:, :, 2]) + _corr(c[:, :, 1], c[:, :, 3])) / 2
    sig = {"trot": diag - pair - side, "pace": side - diag - pair,
           "bound": pair - diag - side, "pronk": diag + pair + side}
    return {
        "duty_factor": duty.tolist(),
        "stride_freq_hz": float(freq.mean()),
        "diag_corr": float(diag),
        "pair_corr": float(pair),
        "side_corr": float(side),
        "dominant_gait": max(sig, key=lambda k: float(sig[k])),
    }


def obedience_stats(tr, skip=50):
    """Realized command-obedience estimators from per-step traces.

    tr: dict of (T, N, ...) arrays — base_z/roll/pitch/vx/vy/wz (T, N),
    foot_z (T, N, 4) world foot heights, foot_xy (T, N, 4, 2) yaw-frame
    foot positions relative to base (the raibert frame,
    corl_rewards.py:161-202), contact (T, N, 4) bool.

    Estimator conventions (validated against scripted-gait ground truth in
    tests/test_utils.py::TestObedienceEstimators):
      - stance_width  = 2 * mean over contact samples of |foot y| — equals
        the raibert target when feet sit at y = ±width/2 (feet FR FL RR RL)
      - stance_length = mean front-foot x − mean rear-foot x over contact
        samples — equals the raibert ±length/2 nominal span
      - foot_apex     = mean over swing segments of the max world foot z
        (the feet_clearance_cmd_linear target is cmd*phase + 0.02,
        corl_rewards.py:127-146, so a perfectly obedient apex = cmd + 0.02)
    """
    import numpy as np

    c = np.asarray(tr["contact"][skip:]).astype(bool)   # (T, N, 4)
    fz = np.asarray(tr["foot_z"][skip:])
    fxy = np.asarray(tr["foot_xy"][skip:])
    out = {k: float(np.mean(np.asarray(tr[k][skip:])))
           for k in ("base_z", "roll", "pitch", "vx", "vy", "wz")}
    # stance width/length: yaw-frame foot xy averaged over CONTACT samples
    cw = np.where(c, 1.0, np.nan)
    x_mean = np.nanmean(fxy[..., 0] * cw, axis=(0, 1))
    y_mean = np.nanmean(np.abs(fxy[..., 1]) * cw, axis=(0, 1))
    out["stance_width"] = float(2 * np.mean(y_mean))
    out["stance_length"] = float(np.mean(x_mean[:2]) - np.mean(x_mean[2:]))
    # footswing apex: mean over swing segments of max foot z
    apexes = []
    for n in range(fz.shape[1]):
        for f in range(4):
            z, inc = fz[:, n, f], c[:, n, f]
            seg_max, in_swing = -1.0, False
            for t in range(len(z)):
                if not inc[t]:
                    seg_max = z[t] if not in_swing else max(seg_max, z[t])
                    in_swing = True
                elif in_swing:
                    apexes.append(seg_max)
                    in_swing = False
    out["foot_apex"] = float(np.mean(apexes)) if apexes else 0.0
    return out
