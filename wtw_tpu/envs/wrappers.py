"""Env wrappers.

ActuatorModelWrapper — TPU-native re-design of
go2_gym/envs/wrappers/actuator_model_wrapper.py:9-127: simulates real
Go2-actuator latency effects OUTSIDE the physics (the reference applies them
to the action stream before the env):

1. action delay: the reference interpolates a wall-clock (time, action)
   buffer with a natural cubic spline at t - delay. Here control is
   fixed-rate, so the delay is a FRACTIONAL NUMBER OF POLICY STEPS and the
   interpolation is a Catmull-Rom cubic over the last 4 buffered actions —
   same smooth-delay semantics, fixed shapes, no host clock;
2. stiction + viscous friction on the action signal:
   a -= Fs·tanh(qd/T) + mu_v·qd (compute_friction :105-112);
3. first-order low-pass filter: a' = α·a + (1-α)·a_prev (apply_LPF :101-103).

State is an explicit pytree carried by the caller; `step` is pure/jittable.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import struct


@dataclass(frozen=True)
class ActuatorModelArgs:
    # reference defaults (actuator_model_wrapper.py:10)
    delay_steps: float = 1.0     # `delay` (in policy steps here)
    alpha: float = 0.9           # LPF coefficient
    mu_v: float = 0.1            # viscous friction
    Fs: float = 0.3              # stiction strength
    temperature: float = 0.1     # softsign temperature
    buffer_len: int = 4          # Catmull-Rom support


@struct.dataclass
class ActuatorModelState:
    action_buffer: jnp.ndarray   # (N, buffer_len, nj) newest last
    prev_actions: jnp.ndarray    # (N, nj) previous filtered output


class ActuatorModelWrapper:
    """Wraps a LeggedEnv; same step signature with an extra wrapper-state."""

    def __init__(self, env, args: ActuatorModelArgs = ActuatorModelArgs()):
        self.env = env
        self.args = args
        # delegate attributes (num_obs, num_actions, cfg, ...)
        for attr in ("cfg", "num_envs", "num_obs", "num_privileged_obs",
                     "num_actions", "num_obs_history", "dt", "n_terms",
                     "reward_names", "axis_name"):
            if hasattr(env, attr):
                setattr(self, attr, getattr(env, attr))

    def init_wrapper_state(self) -> ActuatorModelState:
        N, nj = self.env.num_envs, self.env.num_actions
        return ActuatorModelState(
            action_buffer=jnp.zeros((N, self.args.buffer_len, nj)),
            prev_actions=jnp.zeros((N, nj)))

    def init_state(self, key):
        return (self.env.init_state(key), self.init_wrapper_state())

    def get_observations(self, state):
        world, ws = state
        world, obs = self.env.get_observations(world)
        return (world, ws), obs

    def _delayed(self, buf: jnp.ndarray) -> jnp.ndarray:
        """Catmull-Rom evaluation of the action signal at
        (newest - delay_steps). buf: (N, L, nj), L >= 4."""
        a = self.args
        L = buf.shape[1]
        # continuous index of the target sample; newest is L-1
        t = jnp.clip(L - 1 - a.delay_steps, 1.0, L - 1.001)
        i1 = jnp.floor(t).astype(jnp.int32)
        u = t - i1
        p0, p1 = buf[:, i1 - 1], buf[:, i1]
        p2, p3 = buf[:, i1 + 1], buf[:, jnp.minimum(i1 + 2, L - 1)]
        return 0.5 * ((2 * p1) + (-p0 + p2) * u
                      + (2 * p0 - 5 * p1 + 4 * p2 - p3) * u ** 2
                      + (-p0 + 3 * p1 - 3 * p2 + p3) * u ** 3)

    def step(self, state, actions: jnp.ndarray):
        """(world, wrapper_state), actions -> same 5-tuple as env.step."""
        world, ws = state
        a = self.args
        buf = jnp.concatenate([ws.action_buffer[:, 1:], actions[:, None, :]],
                              axis=1)
        delayed = self._delayed(buf)
        qd = world.env.phys.joint_qd                       # (N, nj)
        friction = a.Fs * jnp.tanh(qd / a.temperature) + a.mu_v * qd
        filtered = a.alpha * (delayed - friction) + (1 - a.alpha) * ws.prev_actions
        ws = ActuatorModelState(action_buffer=buf, prev_actions=filtered)
        world, obs, rew, done, info = self.env.step(world, filtered)
        return (world, ws), obs, rew, done, info
