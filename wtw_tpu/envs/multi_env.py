"""Multi-embodiment LeggedEnv factory.

Builds ONE LeggedEnv whose batch mixes robots (Go1/Go2/B1/mini-cheetah —
identical 13-body/12-joint topology, models/multi.py): the per-env
RobotModel rides the env axis through the vmapped engine, so a single
learner trains every embodiment in one batch. The reference cannot do this
at all — each Isaac Gym sim is built for one asset, so each robot needs its
own process and its own copied package (SURVEY.md §1; BASELINE.json
config #4 names this the multi-embodiment showcase).

Per-robot default joint angles are resolved against each robot's OWN joint
order before stacking (go1 lists FR first, go2 FL first — multi.py:54-57).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..config import Cfg
from ..models import load_robot
from ..models.multi import assign_robots, stack_models
from ..models.robot import default_joint_angles
from .legged_env import LeggedEnv


def make_multi_legged_env(cfg: Cfg, robots: Sequence[str] = ("go1", "go2"),
                          proportions: Sequence[float] | None = None,
                          seed: int = 0) -> LeggedEnv:
    """LeggedEnv over a mixed-robot batch. env.robot_assignment (num_envs,)
    says which robot each env embodies; env.robot_names the order.

    Control constants ride the env axis per robot: each embodiment gets ITS
    OWN flat-preset PD gains, spawn height, and default joint angles (B1:
    kp 100 / kd 2.5 / init z 0.8 vs Go1's 20 / 0.5 / 0.30 — one shared
    go1 config leaves the heavy robots born collapsed at zero reward,
    observed in runs/multi_r5 round 5)."""
    from ..config import PRESETS
    models = [load_robot(r) for r in robots]
    rcfgs = []
    for r in robots:
        preset = PRESETS.get(f"{r}_flat")
        rcfgs.append(preset(cfg.env.num_envs) if preset else cfg)
    dqs = [default_joint_angles(m, dict(rc.init_state.default_joint_angles))
           for m, rc in zip(models, rcfgs)]
    stacked = stack_models(models)
    per_env, assignment = assign_robots(stacked, cfg.env.num_envs,
                                        proportions, seed=seed)
    a = jnp.asarray(assignment)
    nj = len(models[0].joint_names)
    dq = jnp.stack(dqs)[a]
    pg = jnp.stack([jnp.full((nj,), rc.control.stiffness)
                    for rc in rcfgs])[a]
    dg = jnp.stack([jnp.full((nj,), rc.control.damping)
                    for rc in rcfgs])[a]
    ip = jnp.stack([jnp.asarray(rc.init_state.pos, jnp.float32)
                    for rc in rcfgs])[a]
    env = LeggedEnv(cfg, per_env, default_joint_q_override=dq,
                    physics_backend="vmap",
                    per_env_control={"p_gains": pg, "d_gains": dg,
                                     "init_pos": ip})
    env.robot_assignment = np.asarray(assignment)
    env.robot_names = tuple(robots)
    return env
