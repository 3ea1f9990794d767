"""Physics state pytrees.

The full simulator state is explicit arrays (unlike PhysX, whose state is
opaque — reference SURVEY.md §5.4), which makes bitwise-deterministic
checkpoint/resume possible.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PhysicsState:
    """Single-robot state; batch by vmapping the engine. Mirrors the
    root_states/dof_state tensors of the reference (legged_robot.py:1138-1143).
    """

    base_pos: jnp.ndarray    # (3,) world
    base_quat: jnp.ndarray   # (4,) xyzw, body->world
    base_lin_vel: jnp.ndarray  # (3,) world, velocity of base frame origin
    base_ang_vel: jnp.ndarray  # (3,) world
    joint_q: jnp.ndarray     # (nj,)
    joint_qd: jnp.ndarray    # (nj,)


@struct.dataclass
class ContactInfo:
    """Per-step contact diagnostics, the analog of the reference's
    net_contact_force tensor views (legged_robot.py:1156-1157) plus foot
    kinematics (legged_robot.py:112-115)."""

    foot_forces: jnp.ndarray       # (4, 3) world contact force per foot
    foot_positions: jnp.ndarray    # (4, 3) world foot sphere centers
    foot_velocities: jnp.ndarray   # (4, 3) world foot sphere velocities
    thigh_contact: jnp.ndarray     # (4,) force norm on thigh group per leg
    calf_contact: jnp.ndarray      # (4,) force norm on calf group per leg
    base_contact: jnp.ndarray      # () force norm on base group
    total_normal_force: jnp.ndarray  # ()
