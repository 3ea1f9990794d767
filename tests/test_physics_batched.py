"""Parity: the batched env-minor engine must match vmap(physics_step).

The batched path (wtw_tpu/physics/batched.py) is a re-layout + CRBA
re-derivation of the same dynamics; different summation order means float32
agreement, not bitwise. Tolerances are set accordingly (the quantities are
O(1) rad/s, m/s, N)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.models import load_robot
from wtw_tpu.physics import EngineParams, PhysicsState, flat_heightfield
from wtw_tpu.physics.batched import physics_step_batched
from wtw_tpu.physics.engine import physics_step
from wtw_tpu.physics.heightfield import make_heightfield


def _random_states(key, model, B, z=0.35):
    ks = jax.random.split(key, 6)
    return PhysicsState(
        base_pos=jnp.concatenate(
            [jax.random.uniform(ks[0], (B, 2), minval=-1.0, maxval=1.0),
             jnp.full((B, 1), z) + jax.random.uniform(ks[1], (B, 1),
                                                      minval=-0.05,
                                                      maxval=0.1)], axis=-1),
        base_quat=jax.vmap(
            lambda k: _rand_quat(k))(jax.random.split(ks[2], B)),
        base_lin_vel=0.5 * jax.random.normal(ks[3], (B, 3)),
        base_ang_vel=0.5 * jax.random.normal(ks[4], (B, 3)),
        joint_q=jnp.tile(jnp.array([0.0, 0.8, -1.6] * 4), (B, 1))
        + 0.1 * jax.random.normal(ks[5], (B, 12)),
        joint_qd=jnp.zeros((B, 12)),
    )


def _rand_quat(k):
    v = jax.random.normal(k, (4,)) * 0.1 + jnp.array([0.0, 0.0, 0.0, 1.0])
    return v / jnp.linalg.norm(v)


def _step_both(model, hf, params, state, B, backend, hf_ceiling=None,
               **kw):
    tau = 3.0 * jax.random.normal(jax.random.PRNGKey(7), (B, 12))
    fric = jnp.linspace(0.3, 2.0, B)
    rest = jnp.linspace(0.0, 0.4, B)

    ref_fn = jax.vmap(
        lambda s, t, f, r, p, c: physics_step(
            model, hf, params, s, t, f, r, payload_mass=p, com_offset=c,
            external_accel=kw.get("external_accel"),
            hf_ceiling=hf_ceiling),
        in_axes=(0, 0, 0, 0, 0, 0))
    payload = jnp.linspace(-0.5, 2.0, B)
    com_off = jnp.tile(jnp.array([[0.01, -0.005, 0.002]]), (B, 1))
    s_ref, i_ref = jax.jit(ref_fn)(state, tau, fric, rest, payload, com_off)
    s_bat, i_bat = jax.jit(
        lambda s: physics_step_batched(
            model, hf, params, s, tau, fric, rest, payload_mass=payload,
            com_offset=com_off, external_accel=kw.get("external_accel"),
            hf_ceiling=hf_ceiling, backend=backend))(state)
    return (s_ref, i_ref), (s_bat, i_bat)


def _assert_close(ref, bat, atol):
    for name in ("base_pos", "base_quat", "base_lin_vel", "base_ang_vel",
                 "joint_q", "joint_qd"):
        np.testing.assert_allclose(
            getattr(bat[0], name), getattr(ref[0], name), atol=atol,
            err_msg=name)
    for name in ("foot_positions", "foot_velocities", "foot_forces",
                 "thigh_contact", "calf_contact", "base_contact",
                 "total_normal_force"):
        np.testing.assert_allclose(
            getattr(bat[1], name), getattr(ref[1], name),
            atol=atol * 200.0, err_msg=name)  # forces are O(100 N)


@pytest.mark.parametrize("terrain", ["flat", "rough"])
def test_batched_xla_matches_vmap(terrain):
    model = load_robot("go1")
    params = EngineParams()
    if terrain == "flat":
        hf = flat_heightfield(20.0, 0.5)
    else:
        key = jax.random.PRNGKey(3)
        hts = 0.06 * jax.random.normal(key, (80, 80))
        hf = make_heightfield(hts, 0.25, [-10.0, -10.0])
    B = 16
    state = _random_states(jax.random.PRNGKey(0), model, B)
    ref, bat = _step_both(model, hf, params, state, B, "xla",
                          external_accel=jnp.array([0.1, -0.2, 0.3]))
    _assert_close(ref, bat, 2e-4)


def test_batched_xla_ceiling():
    model = load_robot("go1")
    params = EngineParams()
    hf = flat_heightfield(20.0, 0.5)
    ceil = make_heightfield(0.25 * jnp.ones((40, 40)), 0.5, [-10.0, -10.0])
    B = 8
    state = _random_states(jax.random.PRNGKey(1), model, B, z=0.3)
    ref, bat = _step_both(model, hf, params, state, B, "xla",
                          hf_ceiling=ceil)
    _assert_close(ref, bat, 2e-4)


def test_batched_multistep_stability():
    """Roll the batched engine 100 substeps from standing: must stay finite
    and settle near standing height (same qualitative check as the vmap
    engine's settling tests)."""
    model = load_robot("go1")
    params = EngineParams()
    hf = flat_heightfield(20.0, 0.5)
    B = 4
    state = PhysicsState(
        base_pos=jnp.tile(jnp.array([[0.0, 0.0, 0.32]]), (B, 1)),
        base_quat=jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (B, 1)),
        base_lin_vel=jnp.zeros((B, 3)), base_ang_vel=jnp.zeros((B, 3)),
        joint_q=jnp.tile(jnp.array([0.0, 0.8, -1.6] * 4), (B, 1)),
        joint_qd=jnp.zeros((B, 12)))
    q0 = state.joint_q
    kp, kd = 20.0, 0.5

    def body(s, _):
        tau = kp * (q0 - s.joint_q) - kd * s.joint_qd
        s2, _ = physics_step_batched(
            model, hf, params, s, tau, jnp.ones(B), jnp.zeros(B),
            backend="xla")
        return s2, None

    s_end, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=100))(
        state)
    assert bool(jnp.all(jnp.isfinite(s_end.base_pos)))
    assert bool(jnp.all(s_end.base_pos[:, 2] > 0.15))
    assert bool(jnp.all(s_end.base_pos[:, 2] < 0.45))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas path runs compiled only on TPU")
def test_batched_pallas_matches_xla():
    """The Pallas kernel must agree with the plain XLA path — same codegen,
    different executor. (On CPU this is covered by scripts/check_pallas.py
    run on TPU; interpret mode is too slow for the 11k-op kernel.)"""
    model = load_robot("go1")
    params = EngineParams()
    hf = flat_heightfield(20.0, 0.5)
    B = 256
    state = _random_states(jax.random.PRNGKey(2), model, B)
    tau = jnp.zeros((B, 12))
    fric = jnp.ones(B)
    rest = jnp.zeros(B)
    s_x, i_x = physics_step_batched(model, hf, params, state, tau, fric,
                                    rest, backend="xla")
    s_p, i_p = physics_step_batched(model, hf, params, state, tau, fric,
                                    rest, backend="pallas")
    np.testing.assert_allclose(s_p.base_lin_vel, s_x.base_lin_vel, atol=1e-4)
    np.testing.assert_allclose(s_p.joint_qd, s_x.joint_qd, atol=1e-3)
    np.testing.assert_allclose(i_p.foot_forces, i_x.foot_forces, atol=1e-1)


def test_pallas_fk_matches_xla_interpret():
    """Kernel A (FK + sphere positions) vs the XLA fk_core/sphere_pos_core
    chain it replaces — small enough to run in interpret mode on CPU."""
    from wtw_tpu.physics.batched import (_Static, _fk_b_rows, _pallas_fk,
                                         fk_core, sphere_pos_core)
    model = load_robot("go1")
    st = _Static(model, EngineParams())
    B = 16
    state = _random_states(jax.random.PRNGKey(5), model, B)
    cols = lambda a: [a[:, i] for i in range(a.shape[1])]
    bp, bq, jq = (cols(state.base_pos), cols(state.base_quat),
                  cols(state.joint_q))

    fkb, fkp, xp_g = _pallas_fk(st, bp, bq, jq, B)
    body_pos, body_quat, anchors, axes = fk_core(st, bp, bq, jq)
    xp_ref, _ = sphere_pos_core(st, body_pos, body_quat)

    rows_ref = _fk_b_rows(st, body_pos, body_quat, anchors, axes)
    rows_got = fkb.reshape(fkb.shape[0], -1)[:, :B]
    for i, r in enumerate(rows_ref):
        np.testing.assert_allclose(np.asarray(rows_got[i]),
                                   np.asarray(jnp.broadcast_to(r, (B,))),
                                   atol=1e-5, err_msg=f"fk_b row {i}")
    for k in range(3):
        np.testing.assert_allclose(np.asarray(xp_g[k]),
                                   np.asarray(xp_ref[k]), atol=1e-5,
                                   err_msg=f"xp[{k}]")
