"""Strided observation history: the numHistorySamples/numHistoryStep
semantics of the reference's compute_observations
(tasks/go2_terrain.py:780-795): history is prepend-newest, the obs vector
selects samples at stride numHistoryStep, and resets refresh the whole ring
with the current sample."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wtw_tpu.envs.parkour_env import ParkourCfg, ParkourEnv
from wtw_tpu.models import load_robot
from wtw_tpu.terrain import ParkourTerrainCfg


def _make_env(samples, step):
    cfg = ParkourCfg(
        num_envs=4, task="terrain", reward_mode="full",
        num_history_samples=samples, num_history_step=step,
        add_noise=False, push_robots=False,
        observe_heights=False, observe_ceilings=False, observe_imu=True,
        rough_terrain=None,
        terrain=ParkourTerrainCfg(num_levels=2, num_terrains=2))
    return ParkourEnv(cfg, load_robot("go2"), seed=0)


def test_strided_history_selection():
    env = _make_env(samples=3, step=2)
    S = env.sample_obs_size
    assert env.num_obs == 3 * S
    world = env.init_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    acts = jnp.zeros((4, env.num_actions))
    obs_hist = []
    for t in range(6):
        world, obs, rew, done, info = step(world, acts)
        obs_hist.append(np.asarray(obs))
    # obs at t = [sample_t, sample_{t-2}, sample_{t-4}] (stride 2): the
    # second slot of step t equals the first slot of step t-2, third of t
    # equals first of t-4 — provided no env reset in between
    for t in (4, 5):
        np.testing.assert_allclose(obs_hist[t][:, S:2 * S],
                                   obs_hist[t - 2][:, :S], atol=1e-6)
        np.testing.assert_allclose(obs_hist[t][:, 2 * S:3 * S],
                                   obs_hist[t - 4][:, :S], atol=1e-6)
    # imu block present and finite
    assert np.all(np.isfinite(obs_hist[-1]))


def test_history_reset_refresh():
    """After an env reset, every history slot equals the current sample
    (go2_terrain.py:785-789)."""
    env = _make_env(samples=2, step=3)
    S = env.sample_obs_size
    world = env.init_state(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    acts = jnp.zeros((4, env.num_actions))
    # first step after init: progress==0 envs refresh the whole ring
    world, obs, _, _, _ = step(world, acts)
    np.testing.assert_allclose(np.asarray(obs)[:, S:2 * S],
                               np.asarray(obs)[:, :S], atol=1e-6)
