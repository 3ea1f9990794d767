"""PBT + video-rendering tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtw_tpu.config import go1_flat_config
from wtw_tpu.envs import make_legged_env
from wtw_tpu.learn import pbt as P
from wtw_tpu.learn.ppo_cse import PPOArgs


@pytest.fixture(scope="module")
def tiny_env():
    return make_legged_env(go1_flat_config(num_envs=4), seed=0)


def test_exploit_explore_copies_top_params():
    from wtw_tpu.learn.ppo_cse import init_train_state
    env = make_legged_env(go1_flat_config(num_envs=4), seed=0)
    args = PPOArgs(num_steps_per_env=2, num_mini_batches=2,
                   num_learning_epochs=1)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    ts = jax.vmap(lambda k: init_train_state(k, env, args))(keys)
    fitness = jnp.array([0.0, 1.0, 2.0, 3.0])   # member 0 is worst
    pbt = P.PBTArgs(population=4, exploit_frac=0.25)
    ts2 = P.exploit_explore(jax.random.PRNGKey(1), ts, fitness, pbt)
    # member 0 now carries member 3's actor weights
    w_new = ts2.params["actor"][0]["w"][0]
    w_top = ts.params["actor"][0]["w"][3]
    np.testing.assert_allclose(np.asarray(w_new), np.asarray(w_top))
    # member 0's lr was perturbed off member 3's
    assert float(ts2.lr[0]) != float(ts.lr[3])
    # survivors untouched
    np.testing.assert_allclose(np.asarray(ts2.params["actor"][0]["w"][2]),
                               np.asarray(ts.params["actor"][0]["w"][2]))


@pytest.mark.slow
def test_pbt_population_trains(tiny_env):
    args = PPOArgs(num_steps_per_env=2, num_mini_batches=2,
                   num_learning_epochs=1)
    pbt = P.PBTArgs(population=2, exploit_interval=2)
    ts, fitness = P.train_pbt(tiny_env, args, pbt, iterations=3,
                              log_fn=lambda s: None)
    assert bool(jnp.isfinite(fitness).all())
    assert ts.lr.shape == (2,)


def test_video_render(tiny_env, tmp_path):
    from wtw_tpu.utils.video import record_rollout, render_trajectory
    policy = lambda obs: jnp.zeros((4, 12))
    traj = record_rollout(tiny_env, policy, steps=6,
                          commands=np.array([0.5, 0, 0]))
    assert traj.base_pos.shape == (6, 3)
    path = render_trajectory(traj, tiny_env.model, hf=tiny_env.hf,
                             path=str(tmp_path / "v.mp4"), stride=3)
    assert os.path.exists(path) and os.path.getsize(path) > 1000
