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
    says which robot each env embodies; env.robot_names the order."""
    models = [load_robot(r) for r in robots]
    angles = dict(cfg.init_state.default_joint_angles)
    dqs = [default_joint_angles(m, angles) for m in models]
    stacked = stack_models(models)
    per_env, assignment = assign_robots(stacked, cfg.env.num_envs,
                                        proportions, seed=seed)
    dq = jnp.stack(dqs)[jnp.asarray(assignment)]
    env = LeggedEnv(cfg, per_env, default_joint_q_override=dq,
                    physics_backend="vmap")
    env.robot_assignment = np.asarray(assignment)
    env.robot_names = tuple(robots)
    return env
