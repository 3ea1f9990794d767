"""Stack B tests: CaT constraint manager, ceiling contact, parkour env,
CaT float-done GAE, CaT PPO smoke train."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.envs.constraints import CaTManager
from wtw_tpu.envs.parkour_env import ParkourCfg, ParkourEnv
from wtw_tpu.models import load_robot
from wtw_tpu.terrain import ParkourTerrainCfg


@pytest.fixture(scope="module")
def parkour_env():
    cfg = ParkourCfg(num_envs=8, terrain=ParkourTerrainCfg(
        num_levels=3, num_terrains=5, border_size=4.0))
    return ParkourEnv(cfg, load_robot("go2"), seed=0)


# ----------------------------------------------------------------------
# CaT manager (utils/constraint_manager.py semantics)
# ----------------------------------------------------------------------
def test_cat_probs_scale_with_violation():
    m = CaTManager([("a", 1)], tau=0.0)   # tau=0: running max = batch max
    s = m.init_state()
    c = jnp.array([0.0, 0.5, 1.0, 2.0])
    s, probs, viol, _ = m.step(s, {"a": c}, {"a": 0.5})
    # no violation -> 0; max violation -> max_p; proportional in between
    assert probs[0] == 0.0
    assert probs[3] == pytest.approx(0.5)
    assert probs[1] == pytest.approx(0.5 * (0.5 / 2.0))
    assert float(viol["a"]) == pytest.approx(0.75)


def test_cat_running_max_polyak():
    m = CaTManager([("a", 1)], tau=0.95)
    s = m.init_state()
    s, _, _, _ = m.step(s, {"a": jnp.array([10.0])}, {"a": 1.0})
    # rm = 0.95 * 1e-6 + 0.05 * 10
    assert float(s.running_max[0]) == pytest.approx(0.5, rel=1e-3)
    s, probs, _, _ = m.step(s, {"a": jnp.array([0.25])}, {"a": 1.0})
    # violation 0.25 vs rm≈0.487 -> prob ≈ 0.51 (clamped ratio)
    assert 0.4 < float(probs[0]) < 0.6


def test_cat_max_over_constraints():
    m = CaTManager([("a", 1), ("b", 2)], tau=0.0)
    s = m.init_state()
    c_a = jnp.array([1.0, 0.0])
    c_b = jnp.array([[0.0, 0.2], [0.0, 0.0]])
    s, probs, _, _ = m.step(s, {"a": c_a, "b": c_b}, {"a": 0.3, "b": 1.0})
    assert probs[0] == pytest.approx(1.0)   # b col 1: 0.2/0.2 * 1.0
    assert probs[1] == 0.0


# ----------------------------------------------------------------------
# Ceiling contact in the engine
# ----------------------------------------------------------------------
def test_ceiling_pushes_down():
    """A robot spawned intersecting a low ceiling must get pushed down
    (negative z velocity), not explode."""
    from wtw_tpu.physics import EngineParams, PhysicsState, flat_heightfield
    from wtw_tpu.physics.engine import physics_step
    from wtw_tpu.physics.heightfield import HeightField

    model = load_robot("go2")
    hf = flat_heightfield()
    ceil = HeightField(
        heights=jnp.full_like(hf.heights, 0.25),   # ceiling at 25 cm
        horizontal_scale=hf.horizontal_scale, origin=hf.origin)
    params = EngineParams()
    default_q = jnp.array([0.1, 0.8, -1.5, -0.1, 0.8, -1.5,
                           0.1, 1.0, -1.5, -0.1, 1.0, -1.5])
    state = PhysicsState(
        base_pos=jnp.array([0.0, 0.0, 0.35]),      # base above the ceiling
        base_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.zeros(3), base_ang_vel=jnp.zeros(3),
        joint_q=default_q, joint_qd=jnp.zeros(12))
    step = jax.jit(lambda s: physics_step(
        model, hf, params, s, jnp.zeros(12), jnp.float32(1.0),
        jnp.float32(0.0), hf_ceiling=ceil))
    zs = []
    for _ in range(40):
        state, info = step(state)
        zs.append(float(state.base_pos[2]))
    assert all(np.isfinite(zs))
    assert zs[-1] < 0.3    # pushed below its start, toward the gap
    # base contact force registered (ceiling hits count as base contact)
    assert float(info.base_contact) >= 0.0


# ----------------------------------------------------------------------
# Parkour env
# ----------------------------------------------------------------------
def test_parkour_obs_layout(parkour_env):
    # ang_vel(3) + commands(3) + misc(39) + heights(143) + ceilings(1) = 189
    # (dim_obs_misc go2_parkour.py:647; measured_points 13x11 :167-169)
    assert parkour_env.sample_obs_size == 189
    assert parkour_env.num_height_points == 143


def test_parkour_step_finite(parkour_env):
    env = parkour_env
    world = env.init_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(4):
        world, obs, rew, done_prob, info = step(
            world, jnp.zeros((env.num_envs, 12)))
    assert bool(jnp.isfinite(obs).all())
    assert bool(jnp.isfinite(rew).all())
    assert bool((done_prob >= 0).all()) and bool((done_prob <= 1).all())
    assert rew.min() >= 0.0          # reward clipped at 0 (:845)


def test_parkour_hard_reset_on_upside_down(parkour_env):
    """Flipping a robot upside down must trigger a hard done and a reset."""
    env = parkour_env
    world = env.init_state(jax.random.PRNGKey(0))
    # flip env 0 upside down (roll = pi)
    quat = world.env.phys.base_quat.at[0].set(
        jnp.array([1.0, 0.0, 0.0, 0.0]))
    world = world.replace(env=world.env.replace(
        phys=world.env.phys.replace(base_quat=quat),
        progress=world.env.progress + 5))
    world2, obs, rew, done_prob, info = jax.jit(env.step)(
        world, jnp.zeros((env.num_envs, 12)))
    assert bool(info["true_dones"][0])
    assert int(world2.env.progress[0]) == 0    # reset
    assert float(done_prob[0]) == pytest.approx(1.0)  # upsidedown max_p=1


def test_cat_gae_float_dones():
    """Float-done GAE semantics (algos/PPO.py:244-263): a done probability p
    scales the bootstrap by (1-p) AND zeroes p of the reward."""
    from wtw_tpu.learn.cat_ppo import cat_gae

    T, N = 3, 2
    rewards = jnp.ones((T, N))
    values = jnp.zeros((T, N))
    dones = jnp.zeros((T, N)).at[1, 0].set(0.5)
    true_dones = jnp.zeros((T, N))
    nv = jnp.zeros(N)
    advs, rets = cat_gae(rewards, dones, true_dones, values, nv,
                         jnp.zeros(N), jnp.zeros(N), 0.99, 0.95)
    # env 0 reward at t=1 halved; env 1 untouched
    assert float(rets[1, 0]) < float(rets[1, 1])
    # t=0 bootstrap through t=1 scaled by (1 - 0.5)
    assert float(advs[0, 0]) < float(advs[0, 1])


@pytest.mark.slow
def test_cat_ppo_smoke_train(parkour_env):
    from wtw_tpu.learn.cat_ppo import (CatPPOArgs, init_train_state,
                                       make_train_fn, rms_norm, rms_update)

    env = parkour_env
    args = CatPPOArgs(num_steps=4, num_minibatches=2, update_epochs=2,
                      num_iterations=10)
    world = env.init_state(jax.random.PRNGKey(0))
    ts = init_train_state(jax.random.PRNGKey(1), env, args)
    obs = env.get_observations(world)
    ts = ts.replace(obs_rms=rms_update(ts.obs_rms, obs))
    obs_n = rms_norm(ts.obs_rms, obs)
    train = jax.jit(make_train_fn(env, args))
    for _ in range(3):
        ts, world, obs_n, stats = train(ts, world, obs_n)
    assert bool(jnp.isfinite(stats["loss"]))
    assert bool(jnp.isfinite(stats["mean_step_reward"]))
    assert float(stats["lr"]) < args.learning_rate   # annealing active


# ----------------------------------------------------------------------
# Go2Terrain task (tasks/go2_terrain.py analog)
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def terrain_env():
    from wtw_tpu.config import TerrainCfg
    cfg = ParkourCfg(
        num_envs=4, task="terrain", use_gait_clocks=True,
        observe_clock_inputs=True, use_actuator_net=True,
        reward_mode="full",
        rough_terrain=TerrainCfg(
            curriculum=True, num_rows=3, num_cols=3, border_size=4.0,
            center_robots=False, max_init_terrain_level=0,
            terrain_proportions=(0.2, 0.2, 0.2, 0.2, 0.2, 0, 0, 0, 0)))
    return ParkourEnv(cfg, load_robot("go2"), seed=0)


def test_terrain_task_obs_has_clock_inputs(terrain_env):
    # 189 parkour layout + 4 clock inputs
    assert terrain_env.sample_obs_size == 193
    assert terrain_env.actuator_params is not None


def test_terrain_task_steps_with_full_rewards(terrain_env):
    env = terrain_env
    world = env.init_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(3):
        world, obs, rew, done, info = step(world, jnp.zeros((4, 12)))
    assert bool(jnp.isfinite(obs).all()) and bool(jnp.isfinite(rew).all())
    assert float(rew.min()) >= 0.0          # full battery is clipped at 0
    # trot clock: diagonal pairs in phase, alternating sign
    clock = np.asarray(world.env.clock_inputs[0])
    assert clock[0] == pytest.approx(clock[3], abs=1e-5)
    assert clock[1] == pytest.approx(clock[2], abs=1e-5)
    assert np.sign(clock[0]) != np.sign(clock[1])


def test_raibert_error_zero_at_nominal(terrain_env):
    """Raibert error is small when feet sit at nominal stance positions
    under zero commands and phase 0.25 (phases term = 0)."""
    env = terrain_env
    world = env.init_state(jax.random.PRNGKey(0))
    e = world.env
    N = 4
    # nominal body-frame footsteps: x ±0.225, y ±0.125
    feet = jnp.tile(jnp.array([[0.225, 0.125, 0.0], [0.225, -0.125, 0.0],
                               [-0.225, 0.125, 0.0], [-0.225, -0.125, 0.0]]),
                    (N, 1, 1))
    base = e.phys.base_pos
    cinfo = type("C", (), {})()
    cinfo.foot_positions = feet + base[:, None, :]
    e = e.replace(commands=jnp.zeros((N, 3)),
                  foot_indices=jnp.full((N, 4), 0.25))
    err = env._raibert_error(e, cinfo)
    assert float(jnp.abs(err).max()) < 1e-5


def test_parkour_determinism(parkour_env):
    """Fixed seed -> bitwise-identical trajectories (BASELINE config #1
    extended to Stack B)."""
    env = parkour_env
    step = jax.jit(env.step)

    def run():
        world = env.init_state(jax.random.PRNGKey(42))
        for i in range(5):
            world, obs, rew, done, info = step(
                world, jnp.full((env.num_envs, 12), 0.05 * i))
        return obs, rew, world.env.phys.base_pos

    o1, r1, p1 = run()
    o2, r2, p2 = run()
    assert (np.asarray(o1) == np.asarray(o2)).all()
    assert (np.asarray(r1) == np.asarray(r2)).all()
    assert (np.asarray(p1) == np.asarray(p2)).all()


@pytest.mark.slow
def test_slim_checkpoint_restores_terrain_levels(tmp_path):
    """Stack-B slim checkpoints carry per-env terrain levels + CaT state;
    restore_terrain_state re-seats envs at their promoted levels."""
    import pickle

    cfg = ParkourCfg(num_envs=6, episode_length_s=2.0,
                     terrain=ParkourTerrainCfg(num_levels=4, num_terrains=2,
                                               easy_mode=True,
                                               border_size=4.0))
    env = ParkourEnv(cfg, load_robot("go2"), seed=0)
    world = env.init_state(jax.random.PRNGKey(0))
    lvl = jnp.array([0, 1, 2, 3, 1, 2], jnp.int32)
    typ = jnp.array([0, 1, 0, 1, 0, 1], jnp.int32)
    world2 = env.restore_terrain_state(world, lvl, typ)
    np.testing.assert_array_equal(np.asarray(world2.env.terrain_level), lvl)
    np.testing.assert_array_equal(np.asarray(world2.env.terrain_type), typ)
    # robots actually sit at their level's origin
    np.testing.assert_allclose(
        np.asarray(world2.env.env_origin),
        np.asarray(env.terrain_origins[lvl, typ]))
    dist = np.linalg.norm(
        np.asarray(world2.env.phys.base_pos[:, :2]
                   - world2.env.env_origin[:, :2]), axis=1)
    assert (dist < 1.5).all()
    # and the env still steps
    world3, obs, rew, done, info = env.step(
        world2, jnp.zeros((6, env.num_actions)))
    assert np.isfinite(np.asarray(obs)).all()
