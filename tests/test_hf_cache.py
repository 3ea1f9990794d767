"""Terrain-gather optimizations (TPU perf, not in the reference):

- flat-terrain constant folding: a constant heightfield turns the per-
  substep corner gather into compile-time constants (HeightField.is_flat);
- per-policy-step corner cache: physics_step_batched(hf_cache=...) reuses
  the rows gathered at the policy-step start across decimation substeps
  (ControlCfg.hf_substep_cache / ParkourCfg.hf_substep_cache).

The flat path must be numerically identical to the gather path; the cache
must be exact while spheres stay in their cells and trajectory-close over
multi-step rollouts on rough terrain.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.models import load_robot
from wtw_tpu.physics import EngineParams, PhysicsState
from wtw_tpu.physics.batched import hf_gather_cache, physics_step_batched
from wtw_tpu.physics.heightfield import flat_heightfield, make_heightfield


@pytest.fixture(scope="module")
def go1():
    return load_robot("go1")


def _states(key, B, z=0.34):
    ks = jax.random.split(key, 4)
    return PhysicsState(
        base_pos=jnp.concatenate(
            [jax.random.uniform(ks[0], (B, 2), minval=-1.0, maxval=1.0),
             jnp.full((B, 1), z)], axis=-1),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (B, 1)),
        base_lin_vel=0.3 * jax.random.normal(ks[1], (B, 3)),
        base_ang_vel=0.3 * jax.random.normal(ks[2], (B, 3)),
        joint_q=jnp.tile(jnp.array([0.0, 0.8, -1.6] * 4), (B, 1))
        + 0.05 * jax.random.normal(ks[3], (B, 12)),
        joint_qd=jnp.zeros((B, 12)),
    )


def _rough_hf(scale=0.1, amp=0.04):
    n = 80
    xs = np.arange(n) * scale
    h = amp * (np.sin(xs[:, None] * 2.1) + np.cos(xs[None, :] * 1.7))
    return make_heightfield(h.astype(np.float32), scale,
                            [-n * scale / 2, -n * scale / 2])


def _tau(B):
    return 2.0 * jax.random.normal(jax.random.PRNGKey(3), (B, 12))


def test_flat_value_detection():
    hf = flat_heightfield()
    assert hf.is_flat and hf.flat_value == 0.0
    hf2 = make_heightfield(np.full((16, 16), 0.25, np.float32), 0.5, [0, 0])
    assert hf2.is_flat and hf2.flat_value == 0.25
    assert not _rough_hf().is_flat


def test_flat_fastpath_matches_gather(go1):
    """is_flat=True (constant-folded) vs is_flat=False (real gather) on the
    same constant grid must agree to float32 tolerance."""
    B = 8
    hf = make_heightfield(np.full((32, 32), 0.1, np.float32), 0.5,
                          [-8.0, -8.0])
    assert hf.is_flat
    hf_slow = hf.replace(is_flat=False)
    params = EngineParams()
    st = _states(jax.random.PRNGKey(0), B, z=0.44)
    tau = _tau(B)
    fric = jnp.full((B,), 1.0)
    rest = jnp.zeros((B,))
    s_fast, i_fast = physics_step_batched(go1, hf, params, st, tau, fric,
                                          rest, backend="xla")
    s_slow, i_slow = physics_step_batched(go1, hf_slow, params, st, tau,
                                          fric, rest, backend="xla")
    for name in ("base_pos", "base_quat", "base_lin_vel", "base_ang_vel",
                 "joint_q", "joint_qd"):
        np.testing.assert_allclose(getattr(s_fast, name),
                                   getattr(s_slow, name), atol=1e-5,
                                   err_msg=name)
    np.testing.assert_allclose(i_fast.foot_forces, i_slow.foot_forces,
                               atol=1e-3)


def test_cache_same_positions_exact(go1):
    """A cache gathered at the same positions reproduces the uncached step
    exactly (same cells -> identical corner rows and du/dv)."""
    B = 8
    hf = _rough_hf()
    params = EngineParams()
    st = _states(jax.random.PRNGKey(1), B, z=0.40)
    tau = _tau(B)
    fric = jnp.full((B,), 1.0)
    rest = jnp.zeros((B,))
    s_ref, i_ref, cache = physics_step_batched(
        go1, hf, params, st, tau, fric, rest, backend="xla",
        return_hf_cache=True)
    assert "g" in cache
    s_c, i_c = physics_step_batched(go1, hf, params, st, tau, fric, rest,
                                    backend="xla", hf_cache=cache)
    for name in ("base_pos", "base_lin_vel", "joint_qd"):
        np.testing.assert_allclose(getattr(s_c, name), getattr(s_ref, name),
                                   atol=1e-6, err_msg=name)


def test_substep_cache_trajectory_close(go1):
    """3 policy steps x 4 substeps on rough terrain: caching the corner
    rows at each policy-step start stays trajectory-close to the exact
    per-substep gather."""
    B = 8
    hf = _rough_hf()
    params = EngineParams()
    st0 = _states(jax.random.PRNGKey(2), B, z=0.40)
    fric = jnp.full((B,), 1.0)
    rest = jnp.zeros((B,))
    q_ref = jnp.tile(jnp.array([0.0, 0.8, -1.6] * 4), (B, 1))

    def pd(s):
        return 22.0 * (q_ref - s.joint_q) - 0.6 * s.joint_qd

    def run(cached: bool):
        s = st0
        for _ in range(3):
            cache = None
            for k in range(4):
                if cached and k == 0:
                    s, _, cache = physics_step_batched(
                        go1, hf, params, s, pd(s), fric, rest,
                        backend="xla", return_hf_cache=True)
                else:
                    s, _ = physics_step_batched(
                        go1, hf, params, s, pd(s), fric, rest,
                        backend="xla", hf_cache=cache if cached else None)
        return s

    s_exact = run(False)
    s_cached = run(True)
    assert np.all(np.isfinite(np.asarray(s_cached.base_pos)))
    # drift bound: spheres move ~mm per substep; cells are 0.1 m
    np.testing.assert_allclose(s_cached.base_pos, s_exact.base_pos,
                               atol=5e-3)
    np.testing.assert_allclose(s_cached.joint_q, s_exact.joint_q, atol=2e-2)


def test_ceiling_cache(go1):
    """Ceiling corner rows are cached too (parkour crawl tracks)."""
    B = 4
    hf = _rough_hf()
    n = 80
    ceil = make_heightfield(np.full((n, n), 0.8, np.float32), 0.1,
                            [-4.0, -4.0])
    # constant ceiling is flat -> no "c" cache needed
    st = _states(jax.random.PRNGKey(4), B, z=0.40)
    cache = hf_gather_cache(hf, [st.base_pos[:, 0][None],
                                 st.base_pos[:, 1][None]], hf_ceiling=ceil)
    assert "g" in cache and "c" not in cache
    # rough ceiling -> cached
    xs = np.arange(n) * 0.1
    ceil_r = make_heightfield(
        (0.8 + 0.05 * np.sin(xs[:, None]) * np.cos(xs[None, :])).astype(
            np.float32), 0.1, [-4.0, -4.0])
    params = EngineParams()
    tau = _tau(B)
    fric = jnp.full((B,), 1.0)
    rest = jnp.zeros((B,))
    s_ref, i_ref, cache = physics_step_batched(
        go1, hf, params, st, tau, fric, rest, backend="xla",
        hf_ceiling=ceil_r, return_hf_cache=True)
    assert "c" in cache
    s_c, _ = physics_step_batched(go1, hf, params, st, tau, fric, rest,
                                  backend="xla", hf_ceiling=ceil_r,
                                  hf_cache=cache)
    np.testing.assert_allclose(s_c.base_pos, s_ref.base_pos, atol=1e-6)
