"""Multi-embodiment batching: heterogeneous robots in ONE physics batch.

Go1/Go2/B1/mini-cheetah share the same kinematic topology (13 bodies, 12
joints, identical tree), so a batch can mix embodiments by stacking the
RobotModel's array leaves along a leading env axis and vmapping the engine
over the model too (BASELINE.json config #4; the reference needs a separate
process per robot since each Isaac sim is built for one asset).

Collision-sphere counts differ per robot; spheres are padded to the max
count with NEGATIVE radius, which deactivates both ground contact
(depth = h + r - z < 0) and ceiling contact (depth = z + r - ceil < 0)
without any masking branches.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .robot import RobotModel

_PAD_RADIUS = -1e3


def stack_models(models: Sequence[RobotModel]) -> RobotModel:
    """Stack same-topology robots into one batched RobotModel (leading axis
    = robot). vmap the engine with `in_axes=(0, ...)` on the model."""
    base = models[0]
    for m in models[1:]:
        assert m.parent_static == base.parent_static, \
            "multi-embodiment batching requires identical topology"
        assert m.nj == base.nj and m.nb == base.nb

    max_p = max(int(m.sph_body.shape[0]) for m in models)

    def pad_spheres(m: RobotModel) -> RobotModel:
        p = int(m.sph_body.shape[0])
        if p == max_p:
            return m
        extra = max_p - p
        return m.replace(
            sph_body=jnp.concatenate(
                [m.sph_body, jnp.zeros(extra, jnp.int32)]),
            sph_pos=jnp.concatenate([m.sph_pos, jnp.zeros((extra, 3))]),
            sph_radius=jnp.concatenate(
                [m.sph_radius, jnp.full(extra, _PAD_RADIUS)]),
            sph_label=jnp.concatenate(
                [m.sph_label, jnp.zeros(extra, jnp.int32)]),
            sph_leg=jnp.concatenate(
                [m.sph_leg, jnp.full(extra, -1, jnp.int32)]))

    # static metadata must match for tree_map; robots may list legs in a
    # different order (go1 FR-first vs go2 FL-first) — each env stays
    # internally consistent, and the hip/thigh/calf slot pattern (joint
    # i%3) is identical across all of them.
    names = "+".join(m.name for m in models)
    padded = [pad_spheres(m).replace(name=base.name,
                                     joint_names=base.joint_names,
                                     body_names=base.body_names)
              for m in models]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *padded)
    # static (non-pytree) fields come from the first model (identical
    # topology asserted above)
    return stacked.replace(
        parent_static=base.parent_static, name=names,
        joint_names=base.joint_names, body_names=base.body_names,
        fixed_base=base.fixed_base)


def assign_robots(stacked: RobotModel, num_envs: int,
                  proportions: Sequence[float] | None = None,
                  seed: int = 0) -> RobotModel:
    """Expand a stacked model to per-env models: env i gets robot
    `assignment[i]`. Returns the (num_envs, ...)-leading RobotModel to pass
    through `jax.vmap(..., in_axes=(0, ...))`."""
    n_robots = int(stacked.mass.shape[0])
    if proportions is None:
        assignment = np.arange(num_envs) % n_robots
    else:
        rng = np.random.default_rng(seed)
        assignment = rng.choice(n_robots, size=num_envs,
                                p=np.asarray(proportions))
    a = jnp.asarray(assignment, jnp.int32)
    per_env = jax.tree.map(lambda x: x[a], stacked)
    return per_env.replace(
        parent_static=stacked.parent_static, name=stacked.name,
        joint_names=stacked.joint_names, body_names=stacked.body_names,
        fixed_base=stacked.fixed_base), assignment
