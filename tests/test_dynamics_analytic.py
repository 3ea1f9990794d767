"""Analytic validation of the dynamics core: pendulum equations of motion,
double-pendulum energy conservation, tumbling free-body momentum.

These pin down the spatial-algebra conventions (mass matrix, bias forces,
gravity) far more strictly than the stability smoke tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.models.robot import RobotModel, _ancestor_mask
from wtw_tpu.physics import EngineParams, PhysicsState, flat_heightfield, physics_step


def chain_model(n_links, link_len=0.5, mass=1.0, axis=(0.0, 1.0, 0.0),
                fixed_base=True, point_mass=False):
    """n revolute links hanging in -z, joint axes `axis`, com at link end."""
    nb = n_links + 1
    parent = np.arange(-1, n_links)
    com = np.tile(np.array([0.0, 0.0, -link_len]), (nb, 1))
    com[0] = 0
    inertia = np.tile(np.eye(3) * (1e-9 if point_mass else 0.01), (nb, 1, 1))
    m = np.full(nb, mass)
    m[0] = 1.0
    jpos = np.tile(np.array([0.0, 0.0, -link_len]), (n_links, 1))
    jpos[0] = 0.0
    jquat = np.tile(np.array([0.0, 0.0, 0.0, 1.0]), (n_links, 1))
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return RobotModel(
        parent=jnp.asarray(parent, jnp.int32),
        anc=f32(_ancestor_mask(parent, n_links)),
        joint_pos=f32(jpos), joint_quat=f32(jquat),
        joint_axis=f32(np.tile(np.asarray(axis), (n_links, 1))),
        joint_lower=f32(np.full(n_links, -1e9)),
        joint_upper=f32(np.full(n_links, 1e9)),
        effort_limit=f32(np.full(n_links, 1e9)),
        velocity_limit=f32(np.full(n_links, 1e9)),
        joint_damping=f32(np.zeros(n_links)),
        joint_friction=f32(np.zeros(n_links)),
        mass=f32(m), com=f32(com), inertia=f32(inertia),
        sph_body=jnp.zeros(1, jnp.int32), sph_pos=jnp.zeros((1, 3)),
        sph_radius=f32([0.001]), sph_label=jnp.zeros(1, jnp.int32),
        sph_leg=jnp.full((1,), -1, jnp.int32),
        feet_body=jnp.zeros(4, jnp.int32), feet_pos=jnp.zeros((4, 3)),
        foot_radius=f32(np.full(4, 0.02)),
        fixed_base=fixed_base,
        parent_static=tuple(int(p) for p in parent),
        name="chain", joint_names=tuple(f"j{i}" for i in range(n_links)),
        body_names=tuple(f"b{i}" for i in range(nb)),
    )


def make_state(q, qd, base_z=3.0):
    n = len(q)
    return PhysicsState(
        base_pos=jnp.array([0.0, 0.0, base_z]),
        base_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.zeros(3), base_ang_vel=jnp.zeros(3),
        joint_q=jnp.asarray(q, jnp.float32), joint_qd=jnp.asarray(qd, jnp.float32))


def step_fn(model, dt=1e-3):
    hf = flat_heightfield()
    params = EngineParams(dt=jnp.float32(dt), armature=jnp.float32(0.0))
    def f(s, tau):
        return physics_step(model, hf, params, s, tau,
                            jnp.float32(1.0), jnp.float32(0.0))[0]
    return jax.jit(f)


def test_pendulum_qdd():
    """Point-mass pendulum: qdd = -(g/l) sin(theta).

    Joint axis +y, link along -z: theta>0 swings the tip toward +x... the
    restoring acceleration is -(g/l)·sin(theta)."""
    l, dt = 0.5, 1e-4
    model = chain_model(1, link_len=l, point_mass=True)
    step = step_fn(model, dt)
    for theta in [0.3, -0.8, 1.2]:
        s0 = make_state([theta], [0.0])
        s1 = step(s0, jnp.zeros(1))
        qdd = float(s1.joint_qd[0]) / dt
        expected = -9.81 / l * np.sin(theta)
        np.testing.assert_allclose(qdd, expected, rtol=2e-3)


def test_pendulum_with_rod_inertia():
    """Rod-inertia pendulum: qdd = -m g l sinθ / (m l² + I)."""
    l, m, I, dt = 0.5, 2.0, 0.04, 1e-4
    model = chain_model(1, link_len=l, mass=m, point_mass=False)
    model = model.replace(inertia=jnp.tile(jnp.eye(3) * I, (2, 1, 1)))
    step = step_fn(model, dt)
    theta = 0.7
    s1 = step(make_state([theta], [0.0]), jnp.zeros(1))
    qdd = float(s1.joint_qd[0]) / dt
    expected = -m * 9.81 * l * np.sin(theta) / (m * l * l + I)
    np.testing.assert_allclose(qdd, expected, rtol=2e-3)


def test_pendulum_torque_response():
    """At theta=0, applied torque tau gives qdd = tau / (m l² + I)."""
    l, m, I, dt = 0.5, 2.0, 0.04, 1e-4
    model = chain_model(1, link_len=l, mass=m)
    model = model.replace(inertia=jnp.tile(jnp.eye(3) * I, (2, 1, 1)))
    step = step_fn(model, dt)
    s1 = step(make_state([0.0], [0.0]), jnp.array([3.0]))
    qdd = float(s1.joint_qd[0]) / dt
    np.testing.assert_allclose(qdd, 3.0 / (m * l * l + I), rtol=2e-3)


def _chain_energy(model, s, g=9.81):
    from wtw_tpu.physics.engine import fk, _spatial_inertia, _dof_subspace
    pos, quat, anchors, axes = fk(model, s.base_pos, s.base_quat, s.joint_q)
    S = _dof_subspace(model, s.base_pos, anchors, axes)
    J = model.anc[:, None, :] * S.T[None, :, :]
    u = jnp.concatenate([s.base_ang_vel, s.base_lin_vel, s.joint_qd])
    I_sp, com_w = _spatial_inertia(model, pos, quat, s.base_pos)
    M = jnp.einsum("bki,bkl,blj->ij", J, I_sp, J)
    ke = 0.5 * u @ M @ u
    pe = g * jnp.sum(model.mass * com_w[:, 2])
    return float(ke + pe)


def test_double_pendulum_energy():
    """Undamped double pendulum conserves energy (validates Coriolis/bias)."""
    model = chain_model(2, link_len=0.4, mass=1.5)
    dt = 2e-4
    step = step_fn(model, dt)
    s = make_state([1.2, 0.5], [0.0, 0.0])
    e0 = _chain_energy(model, s)
    for _ in range(500):
        s = step(s, jnp.zeros(2))
    e1 = _chain_energy(model, s)
    assert abs(e1 - e0) / (abs(e0) + 1e-6) < 5e-3, (e0, e1)


def test_free_body_momentum():
    """A tumbling free body (no contact, no gravity) conserves linear and
    angular momentum; validates the floating-base bias forces."""
    model = chain_model(1, fixed_base=False)
    hf = flat_heightfield()
    params = EngineParams(dt=jnp.float32(1e-3), armature=jnp.float32(0.0),
                          gravity=jnp.zeros(3))
    s = PhysicsState(
        base_pos=jnp.array([0.0, 0.0, 5.0]),
        base_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.array([0.3, -0.2, 0.1]),
        base_ang_vel=jnp.array([2.0, 3.0, -1.0]),
        joint_q=jnp.array([0.4]), joint_qd=jnp.array([-1.0]))

    def momentum(s):
        from wtw_tpu.physics.engine import fk, _spatial_inertia, _dof_subspace
        pos, quat, anchors, axes = fk(model, s.base_pos, s.base_quat, s.joint_q)
        S = _dof_subspace(model, s.base_pos, anchors, axes)
        J = model.anc[:, None, :] * S.T[None, :, :]
        u = jnp.concatenate([s.base_ang_vel, s.base_lin_vel, s.joint_qd])
        V = jnp.einsum("bij,j->bi", J, u)
        I_sp, com_w = _spatial_inertia(model, pos, quat, s.base_pos)
        h = jnp.einsum("bij,bj->bi", I_sp, V).sum(0)  # [L_about_base; P]
        # shift angular momentum to a fixed world point (origin)
        L_origin = h[:3] + jnp.cross(s.base_pos, h[3:])
        return np.asarray(jnp.concatenate([L_origin, h[3:]]))

    step = jax.jit(lambda s: physics_step(model, hf, params, s, jnp.zeros(1),
                                          jnp.float32(1.0), jnp.float32(0.0))[0])
    h0 = momentum(s)
    for _ in range(300):
        s = step(s)
    h1 = momentum(s)
    np.testing.assert_allclose(h1, h0, rtol=2e-2, atol=2e-3)
