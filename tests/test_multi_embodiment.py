"""Multi-embodiment batching tests (BASELINE.json config #4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.models import load_robot
from wtw_tpu.models.multi import assign_robots, stack_models
from wtw_tpu.physics import EngineParams, PhysicsState, flat_heightfield
from wtw_tpu.physics.engine import physics_step


def _init_state(n, z):
    q0 = jnp.array([0.1, 0.8, -1.5, -0.1, 0.8, -1.5,
                    0.1, 1.0, -1.5, -0.1, 1.0, -1.5])
    return PhysicsState(
        base_pos=jnp.zeros((n, 3)).at[:, 2].set(z),
        base_quat=jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (n, 1)),
        base_lin_vel=jnp.zeros((n, 3)), base_ang_vel=jnp.zeros((n, 3)),
        joint_q=jnp.tile(q0, (n, 1)), joint_qd=jnp.zeros((n, 12)))


def test_stack_models_pads_spheres():
    models = [load_robot(r) for r in ("go1", "go2", "b1")]
    stacked = stack_models(models)
    P = stacked.sph_radius.shape[1]
    assert P == max(int(m.sph_body.shape[0]) for m in models)
    assert stacked.mass.shape == (3, 13)
    # padded spheres carry negative radius (inactive on ground AND ceiling)
    assert float(stacked.sph_radius.min()) < 0


def test_mixed_batch_steps_all_robots():
    """Go1 + Go2 + B1 step together in one vmapped physics call; the heavy
    B1 settles lower-velocity but all stay finite."""
    models = [load_robot(r) for r in ("go1", "go2", "b1")]
    stacked = stack_models(models)
    N = 6
    per_env, assignment = assign_robots(stacked, N)
    hf = flat_heightfield()
    params = EngineParams()
    state = _init_state(N, 0.5)

    step = jax.jit(jax.vmap(
        lambda m, s: physics_step(m, hf, params, s, jnp.zeros(12),
                                  jnp.float32(1.0), jnp.float32(0.0))[0],
        in_axes=(0, 0)))
    s = state
    for _ in range(60):
        s = step(per_env, s)
    assert bool(jnp.isfinite(s.base_pos).all())
    # all robots fell from 0.5 m toward the ground
    assert float(s.base_pos[:, 2].max()) < 0.45
    # robots alternate go1/go2/b1 with distinct masses, same topology
    assert list(assignment[:3]) == [0, 1, 2]
    m_per = np.asarray(per_env.mass.sum(axis=1))
    assert m_per[2] > 2 * m_per[0]    # B1 heavier than Go1


def test_mixed_batch_matches_single_robot():
    """Env 0 (go1) in a mixed batch must produce EXACTLY the same physics
    as a pure-go1 batch (padding must not perturb dynamics)."""
    go1 = load_robot("go1")
    stacked = stack_models([go1, load_robot("b1")])
    per_env, _ = assign_robots(stacked, 2)
    hf = flat_heightfield()
    params = EngineParams()
    state = _init_state(2, 0.35)

    step_mixed = jax.jit(jax.vmap(
        lambda m, s: physics_step(m, hf, params, s, jnp.zeros(12),
                                  jnp.float32(1.0), jnp.float32(0.0))[0],
        in_axes=(0, 0)))
    step_pure = jax.jit(jax.vmap(
        lambda s: physics_step(go1, hf, params, s, jnp.zeros(12),
                               jnp.float32(1.0), jnp.float32(0.0))[0]))
    s_mixed, s_pure = state, state
    for _ in range(20):
        s_mixed = step_mixed(per_env, s_mixed)
        s_pure = step_pure(s_pure)
    np.testing.assert_allclose(np.asarray(s_mixed.base_pos[0]),
                               np.asarray(s_pure.base_pos[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_mixed.joint_q[0]),
                               np.asarray(s_pure.joint_q[0]), atol=1e-5)


def test_multi_env_trains_mixed_batch():
    """A Go1+Go2 mixed batch steps and TRAINS through the full LeggedEnv +
    PPO_CSE stack (one policy, per-env models through the vmapped engine).
    Smoke-level: finite losses, both embodiments present, per-robot reward
    masks well-formed. The round-4 TPU run (scripts/train_multi.py) is the
    scale demo; this pins the mechanism on CPU."""
    from wtw_tpu.config import go1_flat_config
    from wtw_tpu.envs.multi_env import make_multi_legged_env
    from wtw_tpu.learn import PPOArgs
    from wtw_tpu.learn.ppo_cse import init_train_state, make_train_fns
    from wtw_tpu.models.actor_critic import ACArgs

    cfg = go1_flat_config(num_envs=8)
    env = make_multi_legged_env(cfg, ("go1", "go2"), seed=0)
    assert set(env.robot_assignment.tolist()) == {0, 1}
    # per-robot default joint angles differ by leg ORDER (go1 FR-first,
    # go2 FL-first): hip signs of env 0 (go1) and env 1 (go2) must flip
    dq = np.asarray(env.default_joint_q)
    assert dq.shape == (8, 12)
    assert dq[0, 0] == -dq[1, 0] != 0.0

    # per-robot control constants ride the env axis: go2 envs share go1's
    # 20/0.5 gains; a B1 batch (separate factory call below) gets 100/2.5
    # and the 0.8 m spawn height (round-5 fix: one shared go1 config left
    # B1 born collapsed at zero reward for an entire TPU run)
    assert env.p_gains.shape == (8, 12)
    assert float(env.base_init_pos[:, 2].max()) <= 0.35

    ppo = PPOArgs(num_steps_per_env=4, num_learning_epochs=1,
                  num_mini_batches=2)
    ts = init_train_state(jax.random.PRNGKey(1), env, ppo, ACArgs())
    world = env.init_state(jax.random.PRNGKey(0))
    world, obs = env.get_observations(world)
    fn = jax.jit(make_train_fns(env, ppo, ACArgs()))
    for _ in range(2):
        ts, world, obs, stats = fn(ts, world, obs)
    assert bool(jnp.isfinite(stats["loss"]))
    assert bool(jnp.isfinite(stats["mean_step_reward"]))
    # physics stayed sane for both embodiments
    z = np.asarray(world.env.phys.base_pos[:, 2])
    assert np.all(np.isfinite(z)) and np.all(z > 0.05)


def test_multi_env_b1_gets_own_constants():
    """B1 in a mixed batch spawns at ITS config's height with ITS gains."""
    from wtw_tpu.config import go1_flat_config
    from wtw_tpu.envs.multi_env import make_multi_legged_env

    cfg = go1_flat_config(num_envs=6)
    env = make_multi_legged_env(cfg, ("go1", "b1"), seed=0)
    a = env.robot_assignment
    pg = np.asarray(env.p_gains)
    ip = np.asarray(env.base_init_pos)
    assert np.allclose(pg[a == 0], 20.0) and np.allclose(pg[a == 1], 100.0)
    assert np.allclose(ip[a == 0, 2], 0.30, atol=0.06)
    assert np.allclose(ip[a == 1, 2], 0.8)
    # and the spawn actually lands B1 high: init_state must place b1 bases
    # near 0.8 m
    world = env.init_state(jax.random.PRNGKey(0))
    z = np.asarray(world.env.phys.base_pos[:, 2])
    assert z[a == 1].min() > 0.7 and z[a == 0].max() < 0.45
