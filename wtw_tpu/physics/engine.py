"""Articulated rigid-body dynamics engine in generalized coordinates.

This is the TPU-native replacement for Isaac Gym / PhysX (the external
C++/CUDA dependency the reference calls into: gym.simulate at
go1_gym/envs/base/legged_robot.py:77). Design:

- Generalized coordinates: 7-dim floating base pose + nj joint angles;
  velocities are (angular, linear, joint) = 6 + nj dofs.
- All per-body spatial quantities are expressed in a **world-aligned frame
  centered at the robot's own base origin** ("C-frame"). This keeps every
  lever arm O(1 m) even when robots live 100+ m from the world origin on a
  big terrain, which matters for float32 on TPU.
- Mass matrix via the Jacobian form of CRBA (M = Σ_i J_iᵀ I_i J_i), bias
  forces via world-frame RNEA with the gravity trick, contacts as penalty
  forces on collision spheres against the heightfield, and a
  semi-implicit Euler integrator with **implicit joint damping** (the PD
  derivative term and URDF damping are folded into the mass-matrix solve),
  which is what lets us run stiff PD at dt=0.005 like PhysX-TGS does with
  its implicit solver (reference sim params: legged_robot_config.py:402-421).
- Everything is a pure function of (model, terrain, params, state, torque);
  batching over environments is `jax.vmap` at the env layer.

Exact PhysX trajectory match is out of scope (different contact solver);
parity target is statistical (gaits, CoT, learning curves) plus bitwise
self-determinism under fixed seed.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models.robot import RobotModel
from ..utils import quat as quat_util
from .heightfield import HeightField, height_and_normal_at, height_at
from .linalg import cholesky_solve
from .state import ContactInfo, PhysicsState


@struct.dataclass
class EngineParams:
    dt: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.005))
    gravity: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([0.0, 0.0, -9.81], jnp.float32))
    # contact model
    contact_stiffness: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(10_000.0))   # N/m per sphere
    contact_damping: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(300.0))      # N·s/m per sphere
    friction_vel_eps: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.05))       # m/s smoothing
    # joint model
    armature: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.01))       # kg·m² reflected rotor inertia
    # max penetration speed used to clamp the normal-damping term
    max_depenetration_velocity: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1.0))        # mirrors physx block :418


def _basis6():
    return jnp.eye(6, dtype=jnp.float32)


def _joint_levels(parent_static, nj):
    """Group joints by kinematic-tree depth: all joints in a level have
    already-computed parents, so each level is one vectorized update. A
    quadruped is depth 3 (hips/thighs/calves) -> 3 sequential steps instead
    of 12 (4x shorter dependency chain on the TPU VPU)."""
    depth = [0] * (nj + 1)
    levels = {}
    for j in range(nj):
        child = j + 1
        d = depth[parent_static[child]] + 1
        depth[child] = d
        levels.setdefault(d, []).append(j)
    return [np.asarray(levels[d], np.int32) for d in sorted(levels)]


def fk(model: RobotModel, base_pos, base_quat, joint_q):
    """Forward kinematics, level-parallel over the kinematic tree.
    Returns body_pos (nb,3) world, body_quat (nb,4), per-joint world anchor
    (nj,3) and world axis (nj,3)."""
    nb, nj = model.nb, model.nj
    pos = jnp.zeros((nb, 3)).at[0].set(base_pos)
    quat = jnp.zeros((nb, 4)).at[0].set(base_quat)
    anchors = jnp.zeros((nj, 3))
    axes = jnp.zeros((nj, 3))
    parent = np.asarray(model.parent_static)
    for jj in _joint_levels(model.parent_static, nj):
        p = parent[jj + 1]                      # static parent indices
        qp = quat[p]                            # (k, 4)
        anchor = pos[p] + quat_util.quat_rotate(qp, model.joint_pos[jj])
        q_frame = quat_util.quat_mul(qp, model.joint_quat[jj])
        q_rot = quat_util.quat_from_angle_axis(joint_q[jj],
                                               model.joint_axis[jj])
        q_body = quat_util.quat_mul(q_frame, q_rot)
        axis_w = quat_util.quat_rotate(q_frame, model.joint_axis[jj])
        pos = pos.at[jj + 1].set(anchor)
        quat = quat.at[jj + 1].set(q_body)
        anchors = anchors.at[jj].set(anchor)
        axes = axes.at[jj].set(axis_w)
    return pos, quat, anchors, axes


def _spatial_inertia(model: RobotModel, body_pos, body_quat, p_ref):
    """Per-body 6x6 spatial inertia at reference point p_ref (world-aligned).
    Motion = [ω; v@p_ref], Force = [τ@p_ref; f]."""
    R = quat_util.quat_to_matrix(body_quat)                      # (nb,3,3)
    com_w = body_pos + jnp.einsum("bij,bj->bi", R, model.com)    # (nb,3)
    c = com_w - p_ref
    m = model.mass
    Iw = jnp.einsum("bij,bjk,blk->bil", R, model.inertia, R)     # R I Rᵀ
    c2 = jnp.einsum("bi,bi->b", c, c)
    ccT = jnp.einsum("bi,bj->bij", c, c)
    I_o = Iw + m[:, None, None] * (c2[:, None, None] * jnp.eye(3) - ccT)
    chat = quat_util.skew(c)
    top = jnp.concatenate([I_o, m[:, None, None] * chat], axis=-1)
    bot = jnp.concatenate([-m[:, None, None] * chat,
                           m[:, None, None] * jnp.broadcast_to(jnp.eye(3), chat.shape)],
                          axis=-1)
    return jnp.concatenate([top, bot], axis=-2), com_w           # (nb,6,6)


def _cross_motion(v, u):
    """Spatial motion cross product v ×m u; v,u = [ω; vo]."""
    w, vo = v[..., :3], v[..., 3:]
    wu, vu = u[..., :3], u[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, wu), jnp.cross(w, vu) + jnp.cross(vo, wu)], axis=-1)


def _cross_force(v, f):
    """Spatial force cross product v ×f f; f = [τ; fl]."""
    w, vo = v[..., :3], v[..., 3:]
    tau, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, tau) + jnp.cross(vo, fl), jnp.cross(w, fl)], axis=-1)


def _dof_subspace(model: RobotModel, base_pos, anchors, axes_w):
    """S: (nv, 6) spatial motion axis per dof, referenced at base_pos."""
    S_base = _basis6()                       # [e_k;0] for angular, [0;e_k] linear
    r = anchors - base_pos                   # (nj,3)
    S_j = jnp.concatenate([axes_w, jnp.cross(r, axes_w)], axis=-1)  # (nj,6)
    return jnp.concatenate([S_base, S_j], axis=0)


def _contact_geometry(model: RobotModel, hf: HeightField,
                      body_pos, body_quat, V_body, p_ref):
    """Kinematics of every collision sphere vs the heightfield.

    Returns world position (P,3), velocity (P,3), terrain normal (P,3),
    penetration depth (P,).
    """
    R = quat_util.quat_to_matrix(body_quat)                     # (nb,3,3)
    xp = body_pos[model.sph_body] + jnp.einsum(
        "pij,pj->pi", R[model.sph_body], model.sph_pos)         # (P,3)
    Vb = V_body[model.sph_body]                                 # (P,6)
    vel = Vb[:, 3:] + jnp.cross(Vb[:, :3], xp - p_ref)          # (P,3)
    h, n = height_and_normal_at(hf, xp[:, :2])
    # penetration along the surface normal: (h - z)*n_z + r. Equals the
    # vertical depth on flat ground; on steep obstacle faces it bounds the
    # elastic force at ~k*r (PhysX-like wall push — see the matching
    # comment in batched.py dynamics_core).
    depth = (h - xp[:, 2]) * n[:, 2] + model.sph_radius         # >0 in contact
    return xp, vel, n, depth


def physics_step(model: RobotModel, hf: HeightField, params: EngineParams,
                 state: PhysicsState, joint_torque: jnp.ndarray,
                 friction: jnp.ndarray, restitution: jnp.ndarray,
                 payload_mass: jnp.ndarray = 0.0,
                 com_offset: jnp.ndarray = None,
                 external_accel: jnp.ndarray = None,
                 hf_ceiling: HeightField = None,
                 ) -> Tuple[PhysicsState, ContactInfo]:
    """One dt step of forward dynamics + semi-implicit Euler integration.

    joint_torque: (nj,) actuator torques (already clipped by the env layer,
      reference _compute_torques legged_robot.py:907-946).
    friction/restitution: per-env ground contact coefficients (domain rand).
    payload_mass / com_offset: base-mass and CoM domain randomization
      (reference _process_rigid_body_props legged_robot.py:667-673).
    external_accel: extra world-frame acceleration (gravity randomization,
      reference _randomize_gravity legged_robot.py:546-561).
    hf_ceiling: optional overhead-obstacle heightfield (underside world-z,
      +inf where open) — the TPU-native stand-in for the parkour crawl
      barriers the reference adds as trimesh boxes
      (tasks/terrainParkour.py:359-413). Spheres penetrating a ceiling from
      below get a downward contact force.
    """
    # TPU matmuls default to single-pass bf16, which corrupts the mass
    # matrix enough to NaN the Cholesky. 'tensorfloat32' (bf16_3x passes)
    # restores f32-level accuracy (solve residual ~2.6e-6, identical to
    # 'float32' on the 18x18 SPD systems here) at a small fraction of the
    # cost: the full physics step is ~5x faster than with 'float32'
    # ('highest'), which lowers every tiny einsum/Cholesky to slow 6-pass
    # f32 MXU ops.
    with jax.default_matmul_precision("tensorfloat32"):
        return _physics_step_f32(model, hf, params, state, joint_torque,
                                 friction, restitution, payload_mass,
                                 com_offset, external_accel, hf_ceiling)


def _physics_step_f32(model, hf, params, state, joint_torque, friction,
                      restitution, payload_mass=0.0, com_offset=None,
                      external_accel=None, hf_ceiling=None):
    nj = model.nj
    nv = model.nv
    p_ref = state.base_pos

    # ---- kinematics ----
    body_pos, body_quat, anchors, axes_w = fk(
        model, state.base_pos, state.base_quat, state.joint_q)
    S = _dof_subspace(model, state.base_pos, anchors, axes_w)    # (nv,6)
    # J[b] = anc[b] ⊙ S never gets materialized: J[b,k,i] = anc[b,i]·S[i,k],
    # so every J contraction factors through the STATIC ancestor mask —
    # V = S^T(anc ⊙ u), C = Σ_b anc_b ⊙ (S f_b), M = Σ_b ancouter_b ⊙
    # (S I_b S^T). This removes the (nb, 6, nv) per-env tensors that
    # dominated the profile (fusion.46 + relayout copies).
    u = jnp.concatenate([state.base_ang_vel, state.base_lin_vel, state.joint_qd])
    V = jnp.einsum("ik,bi->bk", S, model.anc * u[None, :])       # (nb,6)

    # ---- inertia (with base-mass/CoM domain randomization) ----
    mass = model.mass.at[0].add(payload_mass)
    com = model.com
    if com_offset is not None:
        com = com.at[0].add(com_offset)
    model_dr = model.replace(mass=mass, com=com)
    I_sp, com_w = _spatial_inertia(model_dr, body_pos, body_quat, p_ref)

    # ---- contact geometry ----
    c_pos, c_vel, c_n, c_depth = _contact_geometry(
        model, hf, body_pos, body_quat, V, p_ref)

    sph_body, sph_label, sph_leg = model.sph_body, model.sph_label, model.sph_leg
    if hf_ceiling is not None:
        # ceiling contacts: sphere top penetrating the overhead obstacle's
        # underside; normal points down. Same spheres, same velocities.
        ceil_h = height_at(hf_ceiling, c_pos[:, :2])
        depth_c = (c_pos[:, 2] + model.sph_radius) - ceil_h      # >0 in contact
        n_c = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), c_n.shape)
        c_pos = jnp.concatenate([c_pos, c_pos], axis=0)
        c_vel = jnp.concatenate([c_vel, c_vel], axis=0)
        c_n = jnp.concatenate([c_n, n_c], axis=0)
        c_depth = jnp.concatenate([c_depth, depth_c], axis=0)
        sph_body = jnp.concatenate([sph_body, sph_body])
        sph_label = jnp.concatenate([sph_label, sph_label])
        sph_leg = jnp.concatenate([sph_leg, sph_leg])
    active = (c_depth > 0.0).astype(jnp.float32)                 # (P,)

    # Per-point Jacobian kept as (P, nv, 3) — NO transpose: the profiler
    # showed the (P, 3, nv) layout costing two full-tensor copies per step
    # (T(4,128) relayouts); all contractions below are written against the
    # natural layout instead. Linear part of S at point p = S_lin +
    # S_ang × (p - p_ref), masked by the point's body ancestry.
    r_p = c_pos - p_ref
    Jp = (S[None, :, 3:] +
          jnp.cross(S[None, :, :3], r_p[:, None, :]))            # (P, nv, 3)
    Jp = Jp * model.anc[sph_body][:, :, None]

    # Implicit spring-damper contact (the TPU-native analog of PhysX-TGS's
    # implicit solve): the elastic force k·depth·n goes on the rhs; the
    # damping (c_n + dt·k on the normal, Coulomb-regularized viscous friction
    # on the tangent) is evaluated at the *new* velocity by folding it into
    # the solve matrix. Unconditionally stable at dt=0.005 even for the
    # light (0.2 kg) foot links where explicit penalties blow up.
    k = params.contact_stiffness
    c_n_imp = (params.contact_damping * (1.0 - restitution) + params.dt * k)
    # elastic force capped so depenetration cannot exceed
    # max_depenetration_velocity (PhysX sim block semantics; the implicit
    # damper balances the push at f/c_n_imp m/s)
    f_cap = c_n_imp * params.max_depenetration_velocity
    f_n0 = jnp.minimum(jnp.maximum(k * c_depth, 0.0), f_cap) * active  # (P,)
    v_t = c_vel - c_n * jnp.einsum("pi,pi->p", c_vel, c_n)[:, None]
    vt_norm = jnp.linalg.norm(v_t, axis=-1)
    c_t_imp = friction * f_n0 / jnp.sqrt(
        vt_norm ** 2 + params.friction_vel_eps ** 2)             # (P,)

    nnT = jnp.einsum("pi,pj->pij", c_n, c_n)
    eye3 = jnp.broadcast_to(jnp.eye(3), nnT.shape)
    Cmat = (active * c_n_imp)[:, None, None] * nnT \
        + c_t_imp[:, None, None] * (eye3 - nnT)                  # (P,3,3)

    # ---- bias forces (RNEA with gravity trick; contacts handled above) ----
    g = params.gravity
    if external_accel is not None:
        g = g + external_accel
    avp = jnp.zeros((model.nb, 6)).at[0].set(
        jnp.concatenate([jnp.zeros(3), -g]))                     # base vp-accel
    parent_np = np.asarray(model.parent_static)
    for jj in _joint_levels(model.parent_static, nj):            # level-parallel
        child = jj + 1
        contrib = _cross_motion(V[child],
                                S[6 + jj] * state.joint_qd[jj][:, None])
        avp = avp.at[child].set(avp[parent_np[child]] + contrib)

    f_bias = (jnp.einsum("bij,bj->bi", I_sp, avp)
              + _cross_force(V, jnp.einsum("bij,bj->bi", I_sp, V)))
    C = jnp.einsum("bi,bi->i", model.anc,
                   jnp.einsum("ik,bk->bi", S, f_bias))           # (nv,)

    # ---- mass matrix: M = Σ_b ancouter_b ⊙ (S I_b S^T) ----
    anc_outer = model.anc[:, :, None] * model.anc[:, None, :]    # static
    G = jnp.einsum("ik,bkl,jl->bij", S, I_sp, S)                 # (nb,nv,nv)
    M = jnp.einsum("bij,bij->ij", anc_outer, G)
    M = M + jnp.diag(jnp.concatenate(
        [jnp.zeros(6), jnp.full((nj,), params.armature)]))

    # ---- assemble and solve ----
    D = jnp.concatenate([jnp.zeros(6), model.joint_damping])
    tau = jnp.concatenate([jnp.zeros(6), joint_torque])

    # Contact normal/tangent damping folded in WITHOUT materializing the
    # per-point 3x3 Cmat or any (P, 3, nv) relayout:
    #   Jp^T C Jp = Σ_p [(act·c_n_imp − c_t) w_p w_p^T + c_t Jp_p^T Jp_p]
    # with w_p = Jp_p^T n_p.
    w = jnp.einsum("pia,pa->pi", Jp, c_n)                        # (P, nv)
    coef = active * c_n_imp - c_t_imp                            # (P,)
    A_c = (jnp.einsum("p,pi,pj->ij", coef, w, w)
           + jnp.einsum("p,pia,pja->ij", c_t_imp, Jp, Jp))
    A = M + params.dt * jnp.diag(D) + params.dt * A_c
    rhs = (M @ u + params.dt * (tau - C)
           + params.dt * jnp.einsum("pi,p->i", w, f_n0))
    if model.fixed_base:
        # asset.fix_base_link equivalent (legged_robot_config.py:228):
        # solve the joint subsystem with zero base motion.
        u_new = jnp.concatenate(
            [jnp.zeros(6), cholesky_solve(A[6:, 6:], rhs[6:])])
    else:
        u_new = cholesky_solve(A, rhs)

    # realized contact force (diagnostics): elastic + implicit damping at v'
    c_vel_new = jnp.einsum("pia,i->pa", Jp, u_new)
    vn_new = jnp.einsum("pi,pi->p", c_vel_new, c_n)
    vt_new = c_vel_new - c_n * vn_new[:, None]
    c_force = (c_n * (f_n0 - active * c_n_imp * vn_new)[:, None]
               - c_t_imp[:, None] * vt_new)
    c_fn = jnp.maximum(f_n0 - active * c_n_imp * vn_new, 0.0)

    # ---- integrate (semi-implicit Euler) ----
    w_new = u_new[:3]
    v_sp = u_new[3:6]
    qd_new = u_new[6:]
    base_pos = state.base_pos + params.dt * v_sp
    # u_new[3:6] is the *spatial* linear velocity referenced at the old base
    # origin; the state stores the velocity of the (moved) base origin point:
    # v_origin(t+dt) = v_spatial(t+dt) + ω × (p_new - p_old). Without this
    # shift, momentum of a tumbling free body drifts O(ω·v·t) regardless of dt
    # (verified by tests/test_dynamics_analytic.py::test_free_body_momentum).
    v_new = v_sp + jnp.cross(w_new, base_pos - state.base_pos)
    base_quat = quat_util.quat_integrate(state.base_quat, w_new, params.dt)
    joint_q = state.joint_q + params.dt * qd_new

    new_state = PhysicsState(
        base_pos=base_pos, base_quat=base_quat,
        base_lin_vel=v_new, base_ang_vel=w_new,
        joint_q=joint_q, joint_qd=qd_new)

    # ---- contact diagnostics (per label group) ----
    is_foot = sph_label == 4
    foot_onehot = (jnp.arange(4)[None, :] == sph_leg[:, None]) & is_foot[:, None]
    foot_forces = jnp.einsum("pl,pi->li", foot_onehot.astype(c_force.dtype), c_force)

    feet_R = quat_util.quat_to_matrix(body_quat[model.feet_body])
    foot_positions = body_pos[model.feet_body] + jnp.einsum(
        "lij,lj->li", feet_R, model.feet_pos)
    Vf = V[model.feet_body]
    foot_velocities = Vf[:, 3:] + jnp.cross(Vf[:, :3], foot_positions - p_ref)

    def group_norm(label_idx):
        mask = (sph_label == label_idx)
        leg_onehot = (jnp.arange(4)[None, :] == sph_leg[:, None]) & mask[:, None]
        f = jnp.einsum("pl,pi->li", leg_onehot.astype(c_force.dtype), c_force)
        return jnp.linalg.norm(f, axis=-1)

    # trunk only — matches terminate_after_contacts_on=["base"] (go1_config.py:43);
    # hip contacts are neither penalized nor terminal in the reference.
    base_mask = (sph_label == 0).astype(c_force.dtype)
    base_force = jnp.linalg.norm(jnp.einsum("p,pi->i", base_mask, c_force))

    info = ContactInfo(
        foot_forces=foot_forces,
        foot_positions=foot_positions,
        foot_velocities=foot_velocities,
        thigh_contact=group_norm(2),
        calf_contact=group_norm(3),
        base_contact=base_force,
        total_normal_force=jnp.sum(c_fn),
    )
    return new_state, info
