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
