"""Robot model: URDF-derived arrays consumed by the physics engine.

Replaces Isaac Gym's asset pipeline (reference: gym.load_asset +
get_asset_dof_properties at go1_gym/envs/base/legged_robot.py:1509-1520).
Models are extracted from URDFs at build time by tools/extract_urdf.py into
JSON specs under wtw_tpu/models/data/.

The model is a frozen pytree of arrays; all shapes are static so it can be
closed over by jit or passed as an argument.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

# contact group labels, fixed ordering
LABELS = ("base", "hip", "thigh", "calf", "foot")


@struct.dataclass
class RobotModel:
    """Static quadruped description. nb bodies (13), nj joints (12), P spheres."""

    # topology
    parent: jnp.ndarray        # (nb,) int32, -1 for floating base
    anc: jnp.ndarray           # (nb, 6+nj) float32 ancestor-dof mask
    # joints (order = URDF moving-joint order: FR/FL/RR/RL × hip/thigh/calf)
    joint_pos: jnp.ndarray     # (nj, 3) origin in parent body frame
    joint_quat: jnp.ndarray    # (nj, 4) xyzw fixed rotation parent->joint frame
    joint_axis: jnp.ndarray    # (nj, 3) axis in joint (child) frame
    joint_lower: jnp.ndarray   # (nj,)
    joint_upper: jnp.ndarray   # (nj,)
    effort_limit: jnp.ndarray  # (nj,)
    velocity_limit: jnp.ndarray  # (nj,)
    joint_damping: jnp.ndarray   # (nj,) from URDF <dynamics>
    joint_friction: jnp.ndarray  # (nj,)
    # inertial
    mass: jnp.ndarray          # (nb,)
    com: jnp.ndarray           # (nb, 3) in body frame
    inertia: jnp.ndarray       # (nb, 3, 3) about com, body frame
    # collision spheres
    sph_body: jnp.ndarray      # (P,) int32
    sph_pos: jnp.ndarray       # (P, 3) offset in body frame
    sph_radius: jnp.ndarray    # (P,)
    sph_label: jnp.ndarray     # (P,) int32 index into LABELS
    sph_leg: jnp.ndarray       # (P,) int32 leg index or -1
    # feet sites (FR, FL, RR, RL)
    feet_body: jnp.ndarray     # (4,) int32
    feet_pos: jnp.ndarray      # (4, 3) offset in body frame
    foot_radius: jnp.ndarray   # (4,)
    # metadata (static aux, not traced)
    fixed_base: bool = struct.field(pytree_node=False, default=False)
    parent_static: Any = struct.field(pytree_node=False, default=())
    name: str = struct.field(pytree_node=False, default="")
    joint_names: Any = struct.field(pytree_node=False, default=())
    body_names: Any = struct.field(pytree_node=False, default=())

    @property
    def nb(self) -> int:
        return self.mass.shape[0]

    @property
    def nj(self) -> int:
        return self.joint_pos.shape[0]

    @property
    def nv(self) -> int:
        return 6 + self.nj

    @property
    def total_mass(self):
        return self.mass.sum()


def _ancestor_mask(parent: np.ndarray, nj: int) -> np.ndarray:
    """anc[i, d] = 1 if dof d is an ancestor-or-self dof of body i.

    dofs 0..5 are the floating base (always ancestors); dof 6+j moves body 1+j
    (moving joint j's child is body j+1 by construction of the extractor).
    """
    nb = parent.shape[0]
    anc = np.zeros((nb, 6 + nj), dtype=np.float32)
    anc[:, :6] = 1.0
    for i in range(1, nb):
        b = i
        while b > 0:
            anc[i, 6 + (b - 1)] = 1.0
            b = parent[b]
    return anc


def load_robot(name_or_path: str) -> RobotModel:
    """Load a robot spec by name ('go1', 'go2', 'b1', 'mini_cheetah') or path."""
    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(_DATA_DIR, f"{name_or_path}.json")
    with open(path) as f:
        s = json.load(f)

    parent = np.asarray(s["parent"], np.int32)
    nj = len(s["joint_names"])
    sph = s["collision_spheres"]
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    label_idx = {l: i for i, l in enumerate(LABELS)}
    return RobotModel(
        parent=jnp.asarray(parent),
        anc=f32(_ancestor_mask(parent, nj)),
        joint_pos=f32(s["joint_pos"]),
        joint_quat=f32(s["joint_quat"]),
        joint_axis=f32(s["joint_axis"]),
        joint_lower=f32(s["joint_lower"]),
        joint_upper=f32(s["joint_upper"]),
        effort_limit=f32(s["effort_limit"]),
        velocity_limit=f32(s["velocity_limit"]),
        joint_damping=f32(s["joint_damping"]),
        joint_friction=f32(s["joint_friction"]),
        mass=f32(s["mass"]),
        com=f32(s["com"]),
        inertia=f32(s["inertia"]),
        sph_body=jnp.asarray([c["body"] for c in sph], jnp.int32),
        sph_pos=f32([c["pos"] for c in sph]),
        sph_radius=f32([c["radius"] for c in sph]),
        sph_label=jnp.asarray([label_idx[c["label"]] for c in sph], jnp.int32),
        sph_leg=jnp.asarray([c["leg"] for c in sph], jnp.int32),
        feet_body=jnp.asarray([fs["body"] for fs in s["foot_sites"]], jnp.int32),
        feet_pos=f32([fs["pos"] for fs in s["foot_sites"]]),
        foot_radius=f32([next(c["radius"] for c in sph
                              if c["label"] == "foot" and c["leg"] == i)
                         for i in range(4)]),
        parent_static=tuple(int(p) for p in parent),
        name=s["name"],
        joint_names=tuple(s["joint_names"]),
        body_names=tuple(s["body_names"]),
    )


def default_joint_angles(model: RobotModel, angles_by_name: dict) -> jnp.ndarray:
    """Map a {joint_name: angle} dict to the model's joint order
    (reference: legged_robot.py:1220-1236)."""
    out = []
    for jn in model.joint_names:
        matches = [v for k, v in angles_by_name.items() if k == jn or k in jn]
        out.append(matches[0] if matches else 0.0)
    return jnp.asarray(out, jnp.float32)


def gains_for_joints(model: RobotModel, gains_by_substr: dict) -> jnp.ndarray:
    """PD gain lookup by joint-name substring (reference: legged_robot.py:1226-1233)."""
    out = []
    for jn in model.joint_names:
        val = 0.0
        for k, v in gains_by_substr.items():
            if k in jn:
                val = v
        out.append(val)
    return jnp.asarray(out, jnp.float32)
