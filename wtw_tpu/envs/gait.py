"""Gait clocks and desired contact states.

Faithful port of the reference's `_step_contact_targets`
(go1_gym/envs/base/legged_robot.py:826-905): per-foot phase variables driven
by the commanded gait (frequency, phase, offset, bound, duration), duration-
warped clocks, and Normal-CDF-smoothed desired contact states used by the
MoB gait-tracking rewards (corl_rewards.py:67-84).

Pure functions over a single env's command vector; batch with vmap.
Command layout (legged_robot.py:1193-1203):
  [0] vx [1] vy [2] wz [3] body height [4] gait freq [5] phase [6] offset
  [7] bound [8] duration [9] footswing height [10] pitch [11] roll
  [12] stance width [13] stance length [14] aux reward coef
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.stats import norm


def step_gait(gait_index: jnp.ndarray, commands: jnp.ndarray, dt: float,
              kappa: float, pacing_offset: bool = False):
    """Advance the gait clock one policy step.

    Returns (new_gait_index, foot_indices (4,), clock_inputs (4,),
    doubletime_clock (4,), halftime_clock (4,), desired_contact_states (4,)).
    Foot order matches the URDF/actuator convention (FR, FL, RR, RL).
    """
    frequencies = commands[4]
    phases = commands[5]
    offsets = commands[6]
    bounds = commands[7]
    durations = commands[8]

    gait_index = jnp.remainder(gait_index + dt * frequencies, 1.0)

    if pacing_offset:
        raw = jnp.stack([gait_index + phases + offsets + bounds,
                         gait_index + bounds,
                         gait_index + offsets,
                         gait_index + phases])
    else:
        raw = jnp.stack([gait_index + phases + offsets + bounds,
                         gait_index + offsets,
                         gait_index + bounds,
                         gait_index + phases])

    foot_indices = jnp.remainder(raw, 1.0)

    # duration warp: stance occupies [0, 0.5), swing [0.5, 1) regardless of
    # commanded duty factor (legged_robot.py:848-854)
    stance = foot_indices < durations
    warped = jnp.where(
        stance,
        foot_indices * (0.5 / durations),
        0.5 + (foot_indices - durations) * (0.5 / (1.0 - durations)))

    clock = jnp.sin(2 * jnp.pi * warped)
    doubletime = jnp.sin(4 * jnp.pi * warped)
    halftime = jnp.sin(jnp.pi * warped)

    # smoothed desired contact state via Normal(0, kappa) CDF
    # (legged_robot.py:873-902)
    cdf = lambda x: norm.cdf(x, loc=0.0, scale=kappa)
    fi = jnp.remainder(warped, 1.0)
    desired_contact = (cdf(fi) * (1 - cdf(fi - 0.5))
                       + cdf(fi - 1.0) * (1 - cdf(fi - 0.5 - 1.0)))

    return gait_index, foot_indices, clock, doubletime, halftime, desired_contact
