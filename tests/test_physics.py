"""Physics engine unit tests: FK geometry, energy sanity, contact stability.

The reference has no automated tests (SURVEY.md §4); these cover what its
smoke scripts (scripts/go1/test.py) verify implicitly, plus invariants a
from-scratch engine must satisfy.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.models import load_robot
from wtw_tpu.models.robot import default_joint_angles
from wtw_tpu.physics import (EngineParams, PhysicsState, flat_heightfield,
                             physics_step)
from wtw_tpu.physics.engine import fk

GO1_DEFAULT_ANGLES = {
    "FL_hip_joint": 0.1, "RL_hip_joint": 0.1, "FR_hip_joint": -0.1,
    "RR_hip_joint": -0.1, "FL_thigh_joint": 0.8, "RL_thigh_joint": 1.0,
    "FR_thigh_joint": 0.8, "RR_thigh_joint": 1.0, "FL_calf_joint": -1.5,
    "RL_calf_joint": -1.5, "FR_calf_joint": -1.5, "RR_calf_joint": -1.5,
}


@pytest.fixture(scope="module")
def go1():
    return load_robot("go1")


def make_state(go1, height=0.34):
    q = default_joint_angles(go1, GO1_DEFAULT_ANGLES)
    return PhysicsState(
        base_pos=jnp.array([0.0, 0.0, height]),
        base_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.zeros(3),
        base_ang_vel=jnp.zeros(3),
        joint_q=q,
        joint_qd=jnp.zeros(12),
    )


def test_fk_zero_pose(go1):
    """At zero joint angles the legs point straight down; feet sit at
    hip xy and z = -0.426 (two 0.213 links) below the base."""
    pos, quat, _, _ = fk(go1, jnp.zeros(3), jnp.array([0.0, 0, 0, 1.0]),
                         jnp.zeros(12))
    feet = pos[go1.feet_body] + jax.vmap(
        lambda q, p: p, in_axes=(0, 0))(quat[go1.feet_body], go1.feet_pos)
    # body order: base, FR_hip(1), FR_thigh(2), FR_calf(3), FL..., RR..., RL...
    np.testing.assert_allclose(pos[1], [0.1881, -0.04675, 0.0], atol=1e-6)
    np.testing.assert_allclose(pos[2], [0.1881, -0.12675, 0.0], atol=1e-6)
    np.testing.assert_allclose(pos[3], [0.1881, -0.12675, -0.213], atol=1e-6)


def test_fk_default_pose_feet_below(go1):
    st = make_state(go1)
    pos, quat, _, _ = fk(go1, st.base_pos, st.base_quat, st.joint_q)
    from wtw_tpu.utils.quat import quat_rotate
    feet = pos[go1.feet_body] + quat_rotate(quat[go1.feet_body], go1.feet_pos)
    # standing pose: feet near the ground, roughly symmetric
    assert np.all(np.asarray(feet[:, 2]) < 0.08)
    assert np.all(np.asarray(feet[:, 2]) > -0.05)
    np.testing.assert_allclose(feet[0, 1], -feet[1, 1], atol=1e-5)


def test_free_fall(go1):
    """With no contact (high drop) and no torque, the base accelerates at g."""
    hf = flat_heightfield()
    params = EngineParams()
    st = make_state(go1, height=5.0)
    step = jax.jit(lambda s: physics_step(go1, hf, params, s, jnp.zeros(12),
                                          jnp.float32(1.0), jnp.float32(0.0)))
    v0 = st.base_lin_vel[2]
    for _ in range(10):
        st, _ = step(st)
    # after 10 steps of dt: vz ≈ -g*t
    t = 10 * 0.005
    np.testing.assert_allclose(float(st.base_lin_vel[2]), -9.81 * t, rtol=0.02)


def test_standing_pd_stable(go1):
    """PD control to the default pose keeps the robot standing for 1 s of
    sim time (the analog of the reference smoke test scripts/go1/test.py
    stepping with zero actions)."""
    hf = flat_heightfield()
    params = EngineParams()
    # start with the lowest foot resting at its contact equilibrium depth
    st0 = make_state(go1, height=0.0)
    pos, quat, _, _ = fk(go1, st0.base_pos, st0.base_quat, st0.joint_q)
    from wtw_tpu.utils.quat import quat_rotate
    feet_z = pos[go1.feet_body, 2] + quat_rotate(quat[go1.feet_body], go1.feet_pos)[:, 2]
    delta_eq = float(go1.total_mass) * 9.81 / 4 / float(params.contact_stiffness)
    h0 = float(go1.foot_radius[0] - delta_eq - feet_z.min())
    st = make_state(go1, height=h0)
    q_des = st.joint_q
    kp, kd = 20.0, 0.5

    def substep(st, _):
        tau = kp * (q_des - st.joint_q) - kd * st.joint_qd
        tau = jnp.clip(tau, -go1.effort_limit, go1.effort_limit)
        st, info = physics_step(go1, hf, params, st, tau,
                                jnp.float32(1.0), jnp.float32(0.0))
        return st, info

    run = jax.jit(lambda s: jax.lax.scan(substep, s, None, length=200))
    st_f, infos = run(st)
    h = float(st_f.base_pos[2])
    assert 0.2 < h < 0.45, f"robot fell or exploded: height={h}"
    assert float(jnp.abs(st_f.base_lin_vel).max()) < 0.5
    # all four feet should carry load at the end
    f_end = np.asarray(infos.foot_forces[-1])
    assert np.all(np.linalg.norm(f_end, axis=-1) > 1.0)
    # total vertical ground force ≈ weight
    total_fz = float(infos.foot_forces[-1][:, 2].sum())
    weight = float(go1.total_mass) * 9.81
    assert abs(total_fz - weight) / weight < 0.2


def test_determinism(go1):
    """Bitwise determinism: same inputs -> same trajectory (BASELINE config #1)."""
    hf = flat_heightfield()
    params = EngineParams()
    st = make_state(go1, height=0.32)

    def rollout(st):
        def substep(s, _):
            tau = 20.0 * (make_state(go1).joint_q - s.joint_q) - 0.5 * s.joint_qd
            s, _ = physics_step(go1, hf, params, s, tau,
                                jnp.float32(1.0), jnp.float32(0.0))
            return s, s.base_pos
        return jax.lax.scan(substep, st, None, length=50)[1]

    r1 = jax.jit(rollout)(st)
    r2 = jax.jit(rollout)(st)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
