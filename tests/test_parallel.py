"""Multi-device tests on the virtual 8-CPU mesh: sharded train step runs,
learner stays replicated, and the result matches the single-device run
modulo per-shard reward-sign semantics (which we psum, so it should match
EXACTLY when the batch layout matches).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.config import go1_flat_config
from wtw_tpu.envs import LeggedEnv
from wtw_tpu.learn import PPOArgs
from wtw_tpu.learn.ppo_cse import init_train_state, make_train_fns
from wtw_tpu.models import load_robot
from wtw_tpu.models.actor_critic import ACArgs
from wtw_tpu.parallel import make_mesh, make_distributed_train_fn, shard_world
from wtw_tpu.parallel.mesh import replicate


@pytest.mark.slow
def test_distributed_train_step_runs():
    n_dev = len(jax.devices())
    assert n_dev == 8, f"expected 8 virtual devices, got {n_dev}"
    cfg = go1_flat_config(num_envs=16)   # 2 envs per device
    env = LeggedEnv(cfg, load_robot("go1"))
    args = PPOArgs(num_steps_per_env=4, num_mini_batches=2,
                   num_learning_epochs=1)

    world = env.init_state(jax.random.PRNGKey(0))
    world, obs_dict = env.get_observations(world)
    ts = init_train_state(jax.random.PRNGKey(1), env, args)

    mesh = make_mesh()
    world_s, obs_s = shard_world(mesh, world, obs_dict)
    ts_s = replicate(mesh, ts)

    train = make_distributed_train_fn(env, args, ACArgs(), mesh, ts, world,
                                      obs_dict)
    ts2, world2, obs2, stats = train(ts_s, world_s, obs_s)
    assert bool(jnp.isfinite(stats["loss"]))
    assert bool(jnp.isfinite(stats["adaptation_loss"]))
    # replicated learner: params identical across devices (single logical
    # array with replicated sharding); curriculum weights finite
    std = np.asarray(ts2.params["std"])
    assert np.all(np.isfinite(std))
    w = np.asarray(world2.curriculum.weights)
    assert np.all((w >= 0) & (w <= 1))
    # envs advanced
    assert int(jnp.max(world2.env.episode_length)) >= 4


def test_distributed_cat_ppo_runs():
    """Stack B multi-chip: the shard_map'd cat_ppo iteration over a
    4-device mesh runs and keeps the replicated learner finite."""
    import numpy as np
    from jax.sharding import Mesh
    from wtw_tpu.envs.parkour_env import ParkourCfg, ParkourEnv
    from wtw_tpu.learn.cat_ppo import (CatPPOArgs, init_train_state,
                                       rms_norm, rms_update)
    from wtw_tpu.models import load_robot
    from wtw_tpu.parallel.mesh import (AXIS, make_distributed_cat_train_fn,
                                       replicate, shard_parkour_world)
    from wtw_tpu.terrain import ParkourTerrainCfg

    devices = np.array(jax.devices("cpu")[:4])
    mesh = Mesh(devices, (AXIS,))
    cfg = ParkourCfg(num_envs=8, terrain=ParkourTerrainCfg(
        num_levels=2, num_terrains=2, border_size=4.0))
    env = ParkourEnv(cfg, load_robot("go2"), seed=0, axis_name=AXIS)
    env_init = ParkourEnv(cfg, load_robot("go2"), seed=0)
    args = CatPPOArgs(num_steps=2, num_minibatches=2, update_epochs=1,
                      num_iterations=4)

    world = env_init.init_state(jax.random.PRNGKey(0))
    ts = init_train_state(jax.random.PRNGKey(1), env_init, args)
    obs = env_init.get_observations(world)
    ts = ts.replace(obs_rms=rms_update(ts.obs_rms, obs))
    obs_n = rms_norm(ts.obs_rms, obs)

    world, obs_n = shard_parkour_world(mesh, world, obs_n)
    # per-env carries sharded, everything else replicated
    ts = replicate(mesh, ts)
    train = make_distributed_cat_train_fn(env, args, mesh, ts, world, obs_n)
    ts, world, obs_n, stats = train(ts, world, obs_n)
    assert bool(jnp.isfinite(stats["loss"]))
    assert bool(jnp.isfinite(stats["episode_sums"]).all())


@pytest.mark.slow
def test_sharded_matches_unsharded_cat_ppo():
    """The CaT-stack multi-chip correctness claim (the stack running the
    multi-hour parkour jobs): with CatPPOArgs.sharding_invariant, a 4-device
    env-sharded run computes the SAME training trajectory as the
    single-device run — params, CaT Polyak running maxes, obs/value RMS
    moments, and per-env terrain levels all match after 3 iterations.
    Reference semantics being distributed: utils/cat_common.py:11-115 +
    utils/constraint_manager.py:52-77."""
    from jax.sharding import Mesh
    from wtw_tpu.envs.parkour_env import ParkourCfg, ParkourEnv
    from wtw_tpu.learn.cat_ppo import (CatPPOArgs, init_train_state as
                                       cat_init, make_train_fn as
                                       cat_make_train, rms_norm, rms_update)
    from wtw_tpu.parallel.mesh import (AXIS, make_distributed_cat_train_fn,
                                       shard_parkour_world)
    from wtw_tpu.terrain import ParkourTerrainCfg

    cfg = ParkourCfg(num_envs=8, terrain=ParkourTerrainCfg(
        num_levels=2, num_terrains=2, border_size=4.0))
    model = load_robot("go2")
    args = CatPPOArgs(num_steps=4, num_minibatches=2, update_epochs=1,
                      num_iterations=8, sharding_invariant=True)

    # single-device reference trajectory
    env1 = ParkourEnv(cfg, model, seed=0)
    world = env1.init_state(jax.random.PRNGKey(0))
    ts = cat_init(jax.random.PRNGKey(1), env1, args)
    obs = env1.get_observations(world)
    ts = ts.replace(obs_rms=rms_update(ts.obs_rms, obs))
    obs_n = rms_norm(ts.obs_rms, obs)
    train1 = jax.jit(cat_make_train(env1, args))
    ts1, w1, o1 = ts, world, obs_n
    for _ in range(3):
        ts1, w1, o1, stats1 = train1(ts1, w1, o1)

    # 4-device sharded run from the SAME initial state
    devices = np.array(jax.devices("cpu")[:4])
    mesh = Mesh(devices, (AXIS,))
    env4 = ParkourEnv(cfg, model, seed=0, axis_name=AXIS)
    world_s, obs_s = shard_parkour_world(mesh, world, obs_n)
    ts_s = replicate(mesh, ts)
    train4 = make_distributed_cat_train_fn(env4, args, mesh, ts, world,
                                           obs_n)
    ts4, w4, o4 = ts_s, world_s, obs_s
    for _ in range(3):
        ts4, w4, o4, stats4 = train4(ts4, w4, o4)

    for a, b in zip(jax.tree.leaves(jax.device_get(ts1.params)),
                    jax.tree.leaves(jax.device_get(ts4.params))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-3)
    # CaT Polyak running maxes: the pmax'd batch max itself is exact, but
    # the violations feeding it inherit float32 reassociation noise from
    # the physics (XLA vectorizes an 8-env and a 2-env batch differently
    # on CPU) — same tolerance class as the param/base_pos checks
    np.testing.assert_allclose(
        np.asarray(jax.device_get(w4.cat.running_max)),
        np.asarray(jax.device_get(w1.cat.running_max)), rtol=1e-3)
    # RMS normalizer moments
    for field in ("mean", "var", "count"):
        np.testing.assert_allclose(
            np.asarray(getattr(jax.device_get(ts4.obs_rms), field)),
            np.asarray(getattr(jax.device_get(ts1.obs_rms), field)),
            rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(getattr(jax.device_get(ts4.value_rms), field)),
            np.asarray(getattr(jax.device_get(ts1.value_rms), field)),
            rtol=1e-3, atol=1e-4)
    # per-env terrain curriculum state and physics trajectories
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(w4.env.terrain_level)),
        np.asarray(jax.device_get(w1.env.terrain_level)))
    np.testing.assert_allclose(
        np.asarray(jax.device_get(w4.env.phys.base_pos)),
        np.asarray(jax.device_get(w1.env.phys.base_pos)), atol=1e-3)
    np.testing.assert_allclose(float(stats4["loss"]), float(stats1["loss"]),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_sharded_matches_unsharded_ppo_cse():
    """The actual multi-chip correctness claim: with sharding-invariant
    sampling/minibatching (PPOArgs.sharding_invariant), a 4-device
    env-sharded run computes the SAME training trajectory as the
    single-device run — params agree after 3 full iterations up to float32
    reassociation (per-shard partial-sum gradients vs one global matmul)."""
    cfg = go1_flat_config(num_envs=16)
    # epochs=1: each extra epoch amplifies float32 reassociation noise
    # through the contact dynamics (measured: 2.5e-5 param drift after 3
    # iterations at 1 epoch; ~1e-3 at 2 epochs)
    args = PPOArgs(num_steps_per_env=4, num_mini_batches=4,
                   num_learning_epochs=1, sharding_invariant=True)
    model = load_robot("go1")

    # single-device reference
    env1 = LeggedEnv(cfg, model)
    world = env1.init_state(jax.random.PRNGKey(0))
    world, obs_dict = env1.get_observations(world)
    ts = init_train_state(jax.random.PRNGKey(1), env1, args)
    train1 = jax.jit(make_train_fns(env1, args))
    ts1, w1, o1, stats1 = ts, world, obs_dict, None
    for _ in range(3):
        ts1, w1, o1, stats1 = train1(ts1, w1, o1)

    # 4-device sharded run from the SAME initial state
    mesh = make_mesh(4)
    env4 = LeggedEnv(cfg, model, axis_name="env")
    world_s, obs_s = shard_world(mesh, world, obs_dict)
    ts_s = replicate(mesh, ts)
    train4 = make_distributed_train_fn(env4, args, ACArgs(), mesh, ts,
                                       world, obs_dict)
    ts4, w4, o4, stats4 = ts_s, world_s, obs_s, None
    for _ in range(3):
        ts4, w4, o4, stats4 = train4(ts4, w4, o4)

    p1 = jax.device_get(ts1.params)
    p4 = jax.device_get(ts4.params)
    flat1 = jax.tree.leaves(p1)
    flat4 = jax.tree.leaves(p4)
    for a, b in zip(flat1, flat4):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-3)
    # env state trajectories match too (physics is per-env pure)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(w4.env.phys.base_pos)),
        np.asarray(jax.device_get(w1.env.phys.base_pos)), atol=1e-3)
    np.testing.assert_allclose(float(stats4["loss"]), float(stats1["loss"]),
                               rtol=1e-3, atol=1e-4)
