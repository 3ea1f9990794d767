"""Contact semantics at obstacle faces (round-5 adjudication, BASELINE.md).

1. Penetration is measured along the surface normal: a sphere pressed
   laterally into a tall step's near-vertical bilinear face gets a force
   bounded by ~k*r + the depenetration cap — never k*(face height).
2. max_depenetration_velocity caps the elastic term at c_n_imp * v_max
   (PhysX sim-block semantics, Go2Parkour.yaml:240).
3. Flat-ground behavior is unchanged by either fix (n_z == 1 and the cap
   only binds at centimetre-deep penetration).
"""
import jax
import jax.numpy as jnp
import numpy as np

from wtw_tpu.models import load_robot
from wtw_tpu.physics import EngineParams, PhysicsState
from wtw_tpu.physics.heightfield import make_heightfield
from wtw_tpu.physics.engine import physics_step


def _step_terrain(hf, base_pos, qd=(0.0, 0.0, 0.0)):
    model = load_robot("go2")
    params = EngineParams()
    state = PhysicsState(
        base_pos=jnp.asarray(base_pos, jnp.float32),
        base_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.asarray(qd, jnp.float32),
        base_ang_vel=jnp.zeros(3),
        joint_q=jnp.array([0.0, 0.8, -1.6] * 4),
        joint_qd=jnp.zeros(12),
    )
    tau = jnp.zeros(12)
    new, info = jax.jit(lambda s: physics_step(
        model, hf, params, s, tau, jnp.float32(1.0), jnp.float32(0.0)))(state)
    return new, info


def _step_field(z_fn, n=80, scale=0.05, **kw):
    g = np.zeros((n, n), np.float32)
    xs = np.arange(n) * scale
    for i, x in enumerate(xs):
        g[i, :] = z_fn(x)
    hf = make_heightfield(g, scale, origin=(-2.0, -2.0))
    return _step_terrain(hf, **kw)


def test_face_force_bounded():
    """Robot standing with its front feet pressed into a 0.5 m step face:
    total contact force stays within the k*r + cap bound, not k*0.5."""
    step_x = 0.1   # face right in front of the base origin
    _, info = _step_field(
        lambda x: 0.0 if x < step_x else 0.5,
        base_pos=(0.0, 0.0, 0.30), qd=(0.8, 0.0, 0.0))
    params = EngineParams()
    f_cap = float(params.contact_damping + params.dt
                  * params.contact_stiffness) * float(
                      params.max_depenetration_velocity)
    # every per-leg contact group bounded by the cap (pre-fix this is
    # thousands of N: vertical depth ~0.5 m x 10 kN/m)
    assert float(jnp.max(info.calf_contact)) < f_cap * 1.5
    assert float(jnp.max(jnp.linalg.norm(info.foot_forces, axis=-1))) \
        < f_cap * 1.5


def test_no_vertical_catapult_at_face():
    """WALKING into a tall face (progressive approach through the ramp
    cell, PD holding the default pose) must wall-push the robot back, not
    launch it: |vz| stays bounded and the base never pops above standing
    height + 10 cm. Pre-fix, the first face contact applied k*(vertical
    overlap) along a half-vertical normal and flung the robot."""
    import functools
    n, scale = 80, 0.05
    g = np.zeros((n, n), np.float32)
    xs = np.arange(n) * scale - 2.0
    g[xs >= 0.35, :] = 0.5
    hf = make_heightfield(g, scale, origin=(-2.0, -2.0))
    model = load_robot("go2")
    params = EngineParams()
    q_def = jnp.array([0.0, 0.8, -1.6] * 4)
    state = PhysicsState(
        base_pos=jnp.array([0.0, 0.0, 0.31]),
        base_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.array([0.8, 0.0, 0.0]),
        base_ang_vel=jnp.zeros(3),
        joint_q=q_def, joint_qd=jnp.zeros(12))

    @jax.jit
    def roll(state):
        def body(s, _):
            tau = 20.0 * (q_def - s.joint_q) - 0.5 * s.joint_qd
            s, info = physics_step(model, hf, params, s, tau,
                                   jnp.float32(1.0), jnp.float32(0.0))
            return s, (s.base_pos[2], s.base_lin_vel[2])
        return jax.lax.scan(body, state, None, length=200)

    _, (zs, vzs) = roll(state)
    assert float(jnp.max(zs)) < 0.45, "base popped over the wall"
    assert float(jnp.max(vzs)) < 1.0, "vertical launch at the face"


def test_flat_ground_unchanged():
    """On flat ground the perpendicular depth equals the vertical depth and
    the cap does not bind: standing forces match weight within tolerance."""
    new, info = _step_field(lambda x: 0.0, base_pos=(0.0, 0.0, 0.31))
    total = float(info.total_normal_force)
    model = load_robot("go2")
    weight = float(np.sum(np.asarray(model.mass))) * 9.81
    # settling step: elastic + damping transient, same order as weight
    assert 0.1 * weight < total < 10.0 * weight
    # and the cap is far from binding at mm-scale penetration
    params = EngineParams()
    f_cap = float(params.contact_damping + params.dt
                  * params.contact_stiffness)
    assert total < 4 * f_cap
